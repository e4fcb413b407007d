"""Round-10 KPI-sink concurrency tests (verdict task 5).

``BatchLedger`` protects the KPI sink against DOUBLE-TRIGGER of the
same batch (the reference's DynamoDB conditional-update,
``Lambda/lambda_function.py:174``), but not against two simultaneous
DRIVERS merging different batches: the second writer's target read
missed the first's freshly-committed rows, so its promote silently
dropped them — and both writers shared one staging directory.
``merge_upsert`` now claims the next version in the table's
``_commits`` write-audit with an atomic O_CREAT|O_EXCL create keyed to
the version it READ: a competing commit in the window makes the claim
fail and the stale merge is REJECTED before touching any partition
(retry re-reads).  Pinned here:

* the deterministic two-writer race: the interleaved writer rejects,
  nothing is lost, no partial mix of the two writers' outputs is ever
  observable, and the retry lands both updates;
* staging isolation (per-version+writer staging names);
* a crashed promote (audit row stuck at ``promoting``) never blocks
  the next writer;
* the audit reads back as a table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _kpis(spark, rows):
    return spark.createDataFrame(
        rows, "date_key string, k bigint, revenue bigint"
    )


def _snapshot(spark, path):
    # partition-dir type inference widens 'YYYY-MM-DD' strings to DATE;
    # stringify so assertions read the logical value
    return {
        (str(r["date_key"]), r["k"]): r["revenue"]
        for r in spark.read.parquet(path).collect()
    }


def test_two_writer_race_rejects_stale_merge(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import (
        ConcurrentWriteError,
        merge_upsert,
        read_commit_audit,
    )

    path = str(tmp_path / "kpis")
    merge_upsert(
        spark, path,
        _kpis(spark, [("2024-01-01", 1, 10), ("2024-01-02", 2, 20)]),
        ["date_key", "k"], partition_col="date_key", writer="init",
    )

    # writer B commits INSIDE writer A's read→promote window
    def writer_b():
        merge_upsert(
            spark, path,
            _kpis(spark, [("2024-01-02", 2, 999), ("2024-01-03", 3, 30)]),
            ["date_key", "k"], partition_col="date_key", writer="B",
        )

    a_updates = _kpis(spark, [("2024-01-01", 1, 111)])
    with pytest.raises(ConcurrentWriteError):
        merge_upsert(
            spark, path, a_updates, ["date_key", "k"],
            partition_col="date_key", writer="A", _pre_claim_hook=writer_b,
        )

    # B's merge is FULLY visible, A's stale merge touched NOTHING —
    # no partial mix of the two writers' outputs
    assert _snapshot(spark, path) == {
        ("2024-01-01", 1): 10,
        ("2024-01-02", 2): 999,
        ("2024-01-03", 3): 30,
    }

    # the retry re-reads (now sees B's rows) and lands A's update too
    merge_upsert(
        spark, path, a_updates, ["date_key", "k"],
        partition_col="date_key", writer="A",
    )
    assert _snapshot(spark, path) == {
        ("2024-01-01", 1): 111,
        ("2024-01-02", 2): 999,
        ("2024-01-03", 3): 30,
    }

    audit = {
        r["version"]: (r["state"], r["writer"])
        for r in read_commit_audit(spark, path).collect()
    }
    assert audit == {
        1: ("committed", "init"),
        2: ("committed", "B"),
        3: ("committed", "A"),
    }


def test_staging_is_isolated_per_writer(spark, tmp_path):
    """The race above with the OLD fixed staging name would have had B
    deleting A's staged rows; per-(version, writer) staging names make
    collisions structurally impossible — pinned by checking the staging
    dirs the two writers would use differ."""
    from ecs_ecommerce_data_pipeline_spark.plans import incremental as inc

    path = str(tmp_path / "kpis")
    inc.merge_upsert(
        spark, path, _kpis(spark, [("2024-01-01", 1, 10)]),
        ["date_key", "k"], partition_col="date_key", writer="init",
    )
    seen = []
    orig_claim = inc._claim_commit

    def spy_claim(target, version, writer, meta):
        import glob

        seen.extend(glob.glob(path + "__merge_staging_*"))
        return orig_claim(target, version, writer, meta)

    inc._claim_commit = spy_claim
    try:
        inc.merge_upsert(
            spark, path, _kpis(spark, [("2024-01-01", 1, 11)]),
            ["date_key", "k"], partition_col="date_key", writer="w1",
        )
        inc.merge_upsert(
            spark, path, _kpis(spark, [("2024-01-01", 1, 12)]),
            ["date_key", "k"], partition_col="date_key", writer="w2",
        )
    finally:
        inc._claim_commit = orig_claim
    assert any("v2_w1" in s for s in seen)
    assert any("v3_w2" in s for s in seen)
    assert _snapshot(spark, path) == {("2024-01-01", 1): 12}


def test_crashed_promote_does_not_block_next_writer(spark, tmp_path):
    """An audit row stuck at ``promoting`` whose writer is DEAD (died
    between claim and finalize) is the crash fingerprint — and the NEXT
    writer claims the version above it instead of deadlocking; its
    merge recomputes from the on-disk partition state, repairing any
    partial promote.  (A promoting claim with a LIVE writer conflicts
    instead — see test_round11_advice.)"""
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import (
        _claim_commit,
        merge_upsert,
        read_commit_audit,
    )

    path = str(tmp_path / "kpis")
    merge_upsert(
        spark, path, _kpis(spark, [("2024-01-01", 1, 10)]),
        ["date_key", "k"], partition_col="date_key", writer="init",
    )
    # simulate the crash: v2 claimed by a process that no longer exists
    # (pid 0 reads as dead), promote never ran
    _claim_commit(path, 2, "crashed", {"partitions": ["2024-01-01"], "pid": 0})

    merge_upsert(
        spark, path, _kpis(spark, [("2024-01-01", 1, 42)]),
        ["date_key", "k"], partition_col="date_key", writer="next",
    )
    assert _snapshot(spark, path) == {("2024-01-01", 1): 42}
    audit = {
        r["version"]: r["state"]
        for r in read_commit_audit(spark, path).collect()
    }
    assert audit == {1: "committed", 2: "promoting", 3: "committed"}


def test_unpartitioned_swap_carries_audit(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import (
        merge_upsert,
        read_commit_audit,
    )

    path = str(tmp_path / "kpis")
    merge_upsert(
        spark, path, _kpis(spark, [("2024-01-01", 1, 10)]),
        ["date_key", "k"], writer="init",
    )
    merge_upsert(
        spark, path, _kpis(spark, [("2024-01-01", 1, 11)]),
        ["date_key", "k"], writer="w1",
    )
    assert _snapshot(spark, path) == {("2024-01-01", 1): 11}
    audit = {
        r["version"]: (r["state"], r["writer"])
        for r in read_commit_audit(spark, path).collect()
    }
    assert audit == {1: ("committed", "init"), 2: ("committed", "w1")}


# --- round 11: the streaming KPI face writes through the audit ---------------
#
# daily_kpi_commit_stream composes the engine's two halves (round-10
# verdict task 4): per-day running state in the keyed state store
# (stateful.daily_kpi_running) and the audited exactly-once sink
# (merge_upsert -> sibling __commits write-audit).  Pinned: fold-equals-
# batch on the COMPOSED path, and the two-writer race at the streaming
# sink (competing commit inside a trigger's claim window -> reject,
# bounded retry, both writers' rows land).

SF = "/root/testdata/sf0.001"


def _kpi_tables(spark):
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import (
        ecommerce_views,
    )

    t = ecommerce_views(spark, SF)
    return t["orders"], t["order_items"]


def _kpi_rows_df(spark):
    from ecs_ecommerce_data_pipeline_spark.streaming.stateful import (
        daily_kpi_rows,
    )

    orders, items = _kpi_tables(spark)
    return daily_kpi_rows(orders, items)


def _run_commit_stream(spark, tmp_path, rows_df, name, hook=None, n_files=3):
    from ecs_ecommerce_data_pipeline_spark.streaming.kpi_stream import (
        daily_kpi_commit_stream,
    )

    src = str(tmp_path / f"{name}_src")
    rows_df.repartition(n_files).write.parquet(src)
    stream = (
        spark.readStream.schema(rows_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / f"{name}_out")
    q = daily_kpi_commit_stream(
        stream, out, str(tmp_path / f"{name}_ckpt"),
        writer=name, _pre_claim_hook=hook,
    )
    q.awaitTermination(300)
    return out


def test_commit_stream_fold_equals_batch(spark, tmp_path):
    from decimal import Decimal

    from ecs_ecommerce_data_pipeline_spark.operators import kpis
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import (
        read_commit_audit,
    )

    rows_df = _kpi_rows_df(spark)
    out = _run_commit_stream(spark, tmp_path, rows_df, "cstream")

    got = {}
    for r in spark.read.parquet(out).collect():
        rate = (
            r["returned_orders"] / r["total_orders"]
            if r["total_orders"] else 0.0
        )
        got[str(r["date_key"])] = (
            r["total_orders"],
            r["total_revenue_cents"],
            r["total_items_sold"],
            rate,
            r["unique_customers"],
        )
    orders, items = _kpi_tables(spark)
    want = {}
    for r in kpis.daily_kpis(orders, items).collect():
        cents = int(
            (Decimal(str(r["total_revenue"])) * 100).to_integral_value()
        )
        want[str(r["date_key"])] = (
            r["total_orders"],
            cents,
            r["total_items_sold"],
            float(r["return_rate"]),
            r["unique_customers"],
        )
    # the batch grain is ORDER days; the running face also lands
    # item-only days — zero orders there, bitwise equal on the shared
    # grain (the test_round10_tws_kpis contract, now through the sink)
    assert set(want) <= set(got)
    for extra in set(got) - set(want):
        assert got[extra][0] == 0, extra
    for d, w in want.items():
        g = got[d]
        assert g[:3] == w[:3] and g[4] == w[4], d
        assert abs(g[3] - w[3]) < 1e-12, d

    audit = read_commit_audit(spark, out).collect()
    assert audit, "streaming sink must write through the commit audit"
    assert all(r["state"] == "committed" for r in audit)
    # one committed version per non-empty trigger, versions contiguous
    assert sorted(r["version"] for r in audit) == list(
        range(1, len(audit) + 1)
    )


def test_commit_stream_two_writer_race(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import (
        merge_upsert,
        read_commit_audit,
    )

    rows_df = _kpi_rows_df(spark)
    competing = spark.createDataFrame(
        [("1990-01-01", 7, 12345, 9, 1, 3)],
        "date_key string, total_orders bigint, total_revenue_cents bigint, "
        "total_items_sold bigint, returned_orders bigint, "
        "unique_customers bigint",
    )
    out_holder = {}
    fired = {"n": 0}

    def hook():
        # one competing commit, inside the FIRST trigger's claim window
        if fired["n"] == 0 and "path" in out_holder:
            fired["n"] += 1
            merge_upsert(
                spark, out_holder["path"], competing, ["date_key"],
                partition_col="date_key", writer="competitor",
            )

    # _run_commit_stream creates out path name deterministically
    out_holder["path"] = str(tmp_path / "rstream_out")
    out = _run_commit_stream(spark, tmp_path, rows_df, "rstream", hook=hook)
    assert out == out_holder["path"]
    assert fired["n"] == 1

    table = spark.read.parquet(out)
    # the competing writer's row survived the race...
    comp = table.filter(F.col("date_key").cast("string") == "1990-01-01")
    assert comp.count() == 1 and comp.first()["total_revenue_cents"] == 12345
    # ...and the stream's own days all landed (retry after reject)
    assert table.count() > 1
    audit = read_commit_audit(spark, out).collect()
    writers = {r["writer"] for r in audit}
    assert "competitor" in writers
    assert any(w.startswith("rstream-t") for w in writers)
    assert all(r["state"] == "committed" for r in audit)
