"""Streaming preference maintenance: the per-batch count fold equals
the batch reduce over the full log, Bradley-Terry served from folded
stats equals the raw-log operator, and a ledger replay changes nothing.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def _comparisons(spark, n=400):
    # deterministic synthetic log over 4 systems
    rows = []
    for d in range(n):
        for i in range(4):
            for j in range(i + 1, 4):
                # system with more 1-bits in (d*7+sys) wins — arbitrary
                # deterministic rule giving a non-uniform matrix
                wi = bin((d * 7 + i) % 64).count("1")
                wj = bin((d * 7 + j) % 64).count("1")
                rows.append((i, j, i if wi >= wj else j, d))
    return spark.createDataFrame(
        rows, "sys_a bigint, sys_b bigint, winner bigint, d bigint"
    )


def test_preference_stream_fold_equals_batch_and_replays(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.operators import preference
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import BatchLedger
    from ecs_ecommerce_data_pipeline_spark.streaming.preference_stream import (
        load_preference_stats,
        preference_stream,
    )

    comp = _comparisons(spark)
    drop = str(tmp_path / "drop")
    for k in range(3):
        comp.filter(F.col("d") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(drop)

    state = str(tmp_path / "state")
    lpath = str(tmp_path / "ledger.json")

    def run(ckpt):
        stream = (
            spark.readStream.schema(comp.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drop)
        )
        q = preference_stream(
            stream, state, str(tmp_path / ckpt), BatchLedger(lpath)
        )
        q.awaitTermination(240)

    run("ckpt")

    expect = {
        (r["sys_a"], r["sys_b"]): (r["n_comparisons"], r["wins_a"],
                                   r["winrate_a"])
        for r in preference.pairwise_winrates(comp).collect()
    }
    got = {
        (r["sys_a"], r["sys_b"]): (r["n_comparisons"], r["wins_a"],
                                   r["winrate_a"])
        for r in load_preference_stats(spark, state).collect()
    }
    assert got == expect

    # Bradley-Terry from the folded store == from the raw log
    bt_raw = {
        (r["system"], r["strength"], r["rnk"])
        for r in preference.bradley_terry(comp).collect()
    }
    bt_stream = {
        (r["system"], r["strength"], r["rnk"])
        for r in preference.bradley_terry_from_stats(
            load_preference_stats(spark, state)
        ).collect()
    }
    assert bt_stream == bt_raw

    # ledger replay of the middle batch: store unchanged
    state_j = json.load(open(lpath))
    state_j["pref-microbatch-1"] = "running"
    json.dump(state_j, open(lpath, "w"))
    run("ckpt2")
    again = {
        (r["sys_a"], r["sys_b"]): (r["n_comparisons"], r["wins_a"],
                                   r["winrate_a"])
        for r in load_preference_stats(spark, state).collect()
    }
    assert again == expect


def test_preference_compaction_folds_and_stays_replay_safe(spark, tmp_path):
    """Compaction collapses the per-batch count files into one folded
    generation with identical folded stats; a batch in the ledger's
    crash window ('running') is RETAINED un-folded so its replay cannot
    double-count."""
    from ecs_ecommerce_data_pipeline_spark.operators import preference
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import BatchLedger
    from ecs_ecommerce_data_pipeline_spark.streaming.preference_stream import (
        compact_preference_stats,
        load_preference_stats,
        preference_stream,
    )

    comp = _comparisons(spark)
    drop = str(tmp_path / "drop")
    for k in range(3):
        comp.filter(F.col("d") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(drop)
    state = str(tmp_path / "state")
    lpath = str(tmp_path / "ledger.json")

    def run(ckpt):
        stream = (
            spark.readStream.schema(comp.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drop)
        )
        q = preference_stream(
            stream, state, str(tmp_path / ckpt), BatchLedger(lpath)
        )
        q.awaitTermination(240)

    run("ckpt")
    expect = {
        (r["sys_a"], r["sys_b"]): (r["n_comparisons"], r["wins_a"])
        for r in load_preference_stats(spark, state).collect()
    }

    # mark the middle batch as crashed BEFORE compaction
    state_j = json.load(open(lpath))
    state_j["pref-microbatch-1"] = "running"
    json.dump(state_j, open(lpath, "w"))

    stats = compact_preference_stats(
        spark, state, BatchLedger(lpath)
    )
    assert stats["files_after"] < stats["files_before"]
    # fold unchanged by compaction
    after = {
        (r["sys_a"], r["sys_b"]): (r["n_comparisons"], r["wins_a"])
        for r in load_preference_stats(spark, state).collect()
    }
    assert after == expect

    # the replay re-writes its own partition onto the compacted store —
    # counts must NOT double
    run("ckpt2")
    replayed = {
        (r["sys_a"], r["sys_b"]): (r["n_comparisons"], r["wins_a"])
        for r in load_preference_stats(spark, state).collect()
    }
    assert replayed == expect

    # a second compaction with everything done folds to one generation
    stats2 = compact_preference_stats(spark, state, BatchLedger(lpath))
    assert stats2["files_after"] <= stats2["files_before"]
    assert {
        (r["sys_a"], r["sys_b"]): (r["n_comparisons"], r["wins_a"])
        for r in load_preference_stats(spark, state).collect()
    } == expect


def test_preference_compaction_swap_is_crash_recoverable(spark, tmp_path):
    """Round-10: compact_preference_stats moved from rmtree-then-rename
    (a genuine no-store crash window, despite the docstring's
    sibling-swap claim) to the shared _sibling_swap + _recover_store
    discipline.  Simulate the crash window mid-swap and verify loads
    and a second compaction heal it with the fold intact."""
    import os
    import shutil

    from ecs_ecommerce_data_pipeline_spark.plans.incremental import BatchLedger
    from ecs_ecommerce_data_pipeline_spark.streaming.preference_stream import (
        compact_preference_stats,
        load_preference_stats,
        preference_stream,
    )

    comp = _comparisons(spark, n=60)
    drop = str(tmp_path / "drop")
    for k in range(2):
        comp.filter(F.col("d") % 2 == k).coalesce(1).write.mode(
            "append"
        ).parquet(drop)
    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(comp.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    q = preference_stream(
        stream, state, str(tmp_path / "ckpt"),
        BatchLedger(str(tmp_path / "ledger.json")),
    )
    q.awaitTermination(240)
    want = {
        (r["sys_a"], r["sys_b"]): (r["n_comparisons"], r["wins_a"])
        for r in load_preference_stats(spark, state).collect()
    }

    compact_preference_stats(spark, state)
    # simulate a crash inside the NEXT compaction's swap window
    spath = f"{state}/pair_stats"
    shutil.copytree(spath, spath + "__compacting")
    os.rename(spath, spath + "__old")
    assert not os.path.isdir(spath)

    # (a) loads recover and serve the same fold
    got = {
        (r["sys_a"], r["sys_b"]): (r["n_comparisons"], r["wins_a"])
        for r in load_preference_stats(spark, state).collect()
    }
    assert got == want
    assert os.path.isdir(spath)
    # (b) a fresh compaction over the healed store folds identically
    compact_preference_stats(spark, state)
    got2 = {
        (r["sys_a"], r["sys_b"]): (r["n_comparisons"], r["wins_a"])
        for r in load_preference_stats(spark, state).collect()
    }
    assert got2 == want
