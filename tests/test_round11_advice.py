"""Round-11 regressions for the round-10 advisor findings.

Commit-protocol gaps in ``plans.incremental.merge_upsert``:

* a PROMOTING predecessor with a LIVE writer means the table is
  mid-swap — a merge reading now sees a torn snapshot and must reject
  up front (the version claim alone let it claim the next version and
  promote without the in-flight writer's rows);
* the write-audit moved to a sibling ``__commits`` dir that never moves,
  so a concurrent version read stays correct through the unpartitioned
  whole-table swap (the old inside-table dir was moved aside mid-swap
  and a concurrent ``_commit_version`` read 0);
* a creation-crash leftover (claim exists, zero data files) re-enters
  the creation path instead of bricking every retry with
  AnalysisException.

Vector-store swap recovery in ``streaming.vector_index_stream``:

* ``_sibling_swap`` records its INTENT before any rename, so recovery
  promotes the tmp whose swap actually crashed — never a STALE tmp an
  earlier op abandoned before starting its swap (which silently
  reverted the store);
* a successful swap sweeps leftover stale tmp siblings.

Cross-engine anchor alphabet in ``operators.dedup.exact_substring_anchored``:

* non-ASCII codepoints hash into the anchor predicate identically on
  both engines (the Spark side was hardcoded to ASCII 1–127 while the
  oracle anchored on every codepoint).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F  # noqa: F401


def _kpis(spark, rows):
    return spark.createDataFrame(
        rows, "date_key string, k bigint, revenue bigint"
    )


def _snapshot(spark, path):
    return {
        (str(r["date_key"]), r["k"]): r["revenue"]
        for r in spark.read.parquet(path).collect()
    }


# --- merge_upsert: promoting-predecessor gate --------------------------------


def test_live_promoting_predecessor_rejects(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import (
        ConcurrentWriteError,
        _claim_commit,
        merge_upsert,
    )

    path = str(tmp_path / "kpis")
    merge_upsert(
        spark, path, _kpis(spark, [("2024-01-01", 1, 10)]),
        ["date_key", "k"], partition_col="date_key", writer="init",
    )
    # an in-flight promote: v2 claimed by THIS (live) process
    _claim_commit(path, 2, "inflight", {"partitions": ["2024-01-01"]})

    with pytest.raises(ConcurrentWriteError, match="mid-promote"):
        merge_upsert(
            spark, path, _kpis(spark, [("2024-01-01", 1, 42)]),
            ["date_key", "k"], partition_col="date_key", writer="B",
        )
    # nothing was touched by the rejected merge
    assert _snapshot(spark, path) == {("2024-01-01", 1): 10}


def test_abort_crashed_commit(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import (
        _claim_commit,
        abort_crashed_commit,
        merge_upsert,
        read_commit_audit,
    )

    path = str(tmp_path / "kpis")
    merge_upsert(
        spark, path, _kpis(spark, [("2024-01-01", 1, 10)]),
        ["date_key", "k"], partition_col="date_key", writer="init",
    )
    # live promoting claim: refuses
    _claim_commit(path, 2, "inflight", {"partitions": []})
    assert abort_crashed_commit(path) is None
    # dead promoting claim: aborts
    _claim_commit(path, 3, "crashed", {"partitions": [], "pid": 0})
    assert abort_crashed_commit(path) == 3
    audit = {
        r["version"]: r["state"]
        for r in read_commit_audit(spark, path).collect()
    }
    assert audit[3] == "aborted"


# --- merge_upsert: audit survives the whole-table swap -----------------------


def test_audit_is_sibling_and_readable_through_swap(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.plans import incremental as inc

    path = str(tmp_path / "kpis")
    inc.merge_upsert(
        spark, path, _kpis(spark, [("2024-01-01", 1, 10)]),
        ["date_key", "k"], writer="init",
    )
    assert os.path.isdir(path + "__commits")

    # probe the version DURING the unpartitioned swap: finalize happens
    # after the table dir is replaced, so intercept there
    seen = []
    orig = inc._finalize_commit

    def spying_finalize(claim_path):
        seen.append(inc._commit_version(path))
        orig(claim_path)

    inc._finalize_commit = spying_finalize
    try:
        inc.merge_upsert(
            spark, path, _kpis(spark, [("2024-01-01", 1, 11)]),
            ["date_key", "k"], writer="w1",
        )
    finally:
        inc._finalize_commit = orig
    # mid-swap version read must see v2 claimed (NOT 0 — the round-10
    # bug let a concurrent writer claim v1 into a dir being replaced)
    assert seen == [2]
    assert _snapshot(spark, path) == {("2024-01-01", 1): 11}


def test_legacy_inside_audit_migrates_on_swap(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.plans import incremental as inc

    path = str(tmp_path / "kpis")
    _kpis(spark, [("2024-01-01", 1, 10)]).write.parquet(path)
    # a round-10 layout table: audit INSIDE the table dir
    legacy = os.path.join(path, "_commits")
    os.makedirs(legacy)
    with open(os.path.join(legacy, "v1.json"), "w") as fh:
        json.dump({"state": "committed", "writer": "old"}, fh)

    assert inc._commit_version(path) == 1
    inc.merge_upsert(
        spark, path, _kpis(spark, [("2024-01-01", 1, 11)]),
        ["date_key", "k"], writer="w1",
    )
    audit = {
        r["version"]: (r["state"], r["writer"])
        for r in inc.read_commit_audit(spark, path).collect()
    }
    assert audit == {1: ("committed", "old"), 2: ("committed", "w1")}
    # migrated to the sibling dir; legacy gone with the old table dir
    assert os.path.isfile(os.path.join(path + "__commits", "v1.json"))
    assert not os.path.isdir(legacy)


# --- merge_upsert: creation-crash leftover is repairable ---------------------


def test_creation_crash_leftover_recovers(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.plans import incremental as inc

    path = str(tmp_path / "kpis")
    # simulate: writer claimed v1 then died before the first write —
    # sibling audit exists, table dir exists but holds zero data files
    inc._claim_commit(path, 1, "crashed", {"partitions": [], "pid": 0})
    os.makedirs(path)

    inc.merge_upsert(
        spark, path, _kpis(spark, [("2024-01-01", 1, 10)]),
        ["date_key", "k"], partition_col="date_key", writer="retry",
    )
    assert _snapshot(spark, path) == {("2024-01-01", 1): 10}
    audit = {
        r["version"]: r["state"]
        for r in inc.read_commit_audit(spark, path).collect()
    }
    assert audit == {1: "promoting", 2: "committed"}


# --- vector store: intent-directed recovery + stale-tmp sweep ----------------


def _mk_store(spark, path, tag):
    spark.createDataFrame([(tag,)], "gen string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_recover_prefers_intended_tmp_over_stale(spark, tmp_path):
    """The advisor scenario: a rebalance crashed BEFORE its swap (stale
    complete ``__rebalancing`` on disk), then a retrain's swap of
    ``__promoting`` crashes mid-window.  Recovery must promote the
    intended ``__promoting`` generation, not the stale one."""
    from ecs_ecommerce_data_pipeline_spark.streaming import (
        vector_index_stream as vis,
    )

    spath = str(tmp_path / "centroids")
    _mk_store(spark, spath, "current")
    _mk_store(spark, spath + "__rebalancing", "stale")  # abandoned op
    _mk_store(spark, spath + "__promoting", "retrained")
    # crash _sibling_swap mid-window: intent written, old aside, tmp
    # not yet promoted
    with open(spath + "__intent", "w") as f:
        f.write(os.path.basename(spath + "__promoting"))
    os.rename(spath, spath + "__old")

    vis._recover_store(spath)
    assert vis._read_store(spark, spath).first()["gen"] == "retrained"
    assert not os.path.isdir(spath + "__old")
    assert not os.path.isfile(spath + "__intent")


def test_recover_without_intent_picks_newest_tmp(spark, tmp_path):
    """Legacy crash state (no intent file): the NEWEST complete tmp is
    the one whose swap crashed — mtime replaces the old fixed suffix
    order that promoted whichever suffix sorted first."""
    import time

    from ecs_ecommerce_data_pipeline_spark.streaming import (
        vector_index_stream as vis,
    )

    spath = str(tmp_path / "centroids")
    _mk_store(spark, spath, "current")
    _mk_store(spark, spath + "__rebalancing", "stale")
    time.sleep(0.05)
    _mk_store(spark, spath + "__promoting", "retrained")
    # ensure strictly newer mtime on the intended generation's marker
    now = time.time()
    os.utime(os.path.join(spath + "__rebalancing", "_SUCCESS"), (now - 60, now - 60))
    os.utime(os.path.join(spath + "__promoting", "_SUCCESS"), (now, now))
    os.rename(spath, spath + "__old")

    vis._recover_store(spath)
    assert vis._read_store(spark, spath).first()["gen"] == "retrained"


def test_successful_swap_sweeps_stale_tmps(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.streaming import (
        vector_index_stream as vis,
    )

    spath = str(tmp_path / "centroids")
    _mk_store(spark, spath, "current")
    _mk_store(spark, spath + "__rebalancing", "stale")  # abandoned op
    _mk_store(spark, spath + "__compacting", "new")

    vis._sibling_swap(spath, spath + "__compacting")
    assert vis._read_store(spark, spath).first()["gen"] == "new"
    assert not os.path.isdir(spath + "__rebalancing")
    assert not os.path.isdir(spath + "__compacting")
    assert not os.path.isfile(spath + "__intent")


def test_anchor_alphabet_is_ascii_on_both_engines(spark):
    """Non-ASCII codepoints with code % anchor_mod == 0 (e.g. U+00D0,
    208 % 4 == 0) are NOT anchors — by contract on both engines.  The
    copies still match through their ASCII anchors even when the shared
    substring carries non-ASCII characters."""
    import duckdb

    from ecs_ecommerce_data_pipeline_spark.operators.dedup import (
        exact_substring_anchored,
    )

    # shared 60-char substring embedding U+00D0 (208) and U+0100 (256):
    # both are % 4 == 0 codepoints that an unbounded ascii()%mod oracle
    # would anchor but the ASCII-class Spark split never does
    shared = "the quick ÐbrownĀ fox jumps over the lazy dog again and more"
    rows = [
        (1, "prefix one " + shared + " tail a"),
        (2, "other lead-in " + shared + " tail b"),
        (3, "unrelated document with no overlap at all here"),
    ]
    doc = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in exact_substring_anchored(
            doc, k=8, anchor_mod=4, max_df=20, max_gap=100, min_anchors=2
        ).collect()
    }
    assert got == {(1, 2)}

    # the oracle form (with the ASCII bound) agrees on the same data
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{t}')" for i, t in rows
        )
        + ") t(doc_id, text)"
    )
    k = 8
    oracle_anchors = con.execute(
        f"""
        SELECT d, count(*) FROM (
            SELECT doc_id AS d,
                   unnest(range(0, length(text) - {k} + 1)) AS pos, text
            FROM documents WHERE length(text) >= {k}
        )
        WHERE ascii(substring(text, pos + 1, 1)) % 4 = 0
          AND ascii(substring(text, pos + 1, 1)) BETWEEN 1 AND 127
        GROUP BY d ORDER BY d
        """
    ).fetchall()
    spark_anchors = dict(oracle_anchors)
    # python reference: anchor = ASCII class only
    for i, t in rows:
        ref = sum(
            1
            for p in range(0, len(t) - k + 1)
            if 1 <= ord(t[p]) <= 127 and ord(t[p]) % 4 == 0
        )
        assert spark_anchors[i] == ref


def test_incomplete_intended_tmp_rolls_back(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.streaming import (
        vector_index_stream as vis,
    )

    spath = str(tmp_path / "centroids")
    _mk_store(spark, spath, "current")
    # intended tmp exists but is INCOMPLETE (no _SUCCESS) — while a
    # complete stale tmp also sits on disk.  Must roll BACK, not
    # promote the stale generation.
    _mk_store(spark, spath + "__rebalancing", "stale")
    os.makedirs(spath + "__promoting")
    with open(os.path.join(spath + "__promoting", "part-0.parquet"), "wb"):
        pass
    with open(spath + "__intent", "w") as f:
        f.write(os.path.basename(spath + "__promoting"))
    os.rename(spath, spath + "__old")

    vis._recover_store(spath)
    assert vis._read_store(spark, spath).first()["gen"] == "current"
    shutil.rmtree(spath + "__rebalancing", ignore_errors=True)


# --- band policies: ladder picks --------------------------------------------


def test_minhash_band_policy_ladder():
    from ecs_ecommerce_data_pipeline_spark.operators.dedup import (
        minhash_band_policy,
    )

    # (8/r)·n·2^(-4r) <= 8 boundaries: r=2 to n=512, r=4 to n=262144·... 
    assert minhash_band_policy(1) == 2
    assert minhash_band_policy(500) == 2
    assert minhash_band_policy(512) == 2
    assert minhash_band_policy(513) == 4
    assert minhash_band_policy(5000) == 4
    # r=4 holds while 2·n/2^16 <= 8 → n <= 262144
    assert minhash_band_policy(262144) == 4
    assert minhash_band_policy(262145) == 8
    assert minhash_band_policy(10**9) == 8
    # r must divide num_hashes
    assert minhash_band_policy(10**9, num_hashes=12) in (2, 4)


def test_dhash_band_policy_ladder():
    from ecs_ecommerce_data_pipeline_spark.operators.multimodal import (
        dhash_band_policy,
    )

    assert dhash_band_policy(256) == 8     # 8·256/256 = 8 <= 8
    assert dhash_band_policy(257) == 16
    assert dhash_band_policy(5000) == 16
    assert dhash_band_policy(131072) == 16  # 4·131072/65536 = 8
    assert dhash_band_policy(131073) == 32
    assert dhash_band_policy(10**9) == 32


def test_cached_count_matches_spark_count(spark):
    """Footer-metadata count must equal the full Spark count and be
    recomputed (no memo) on every call."""
    from ecs_ecommerce_data_pipeline_spark.sources import testdata as td

    n1 = td.cached_count(spark, "/root/testdata/sf0.001", "documents")
    assert n1 == 500
    assert n1 == td.load_table(spark, "/root/testdata/sf0.001", "documents").count()
    # no process-level memo of results keyed on the data dir
    assert not hasattr(td, "_COUNT_CACHE")
    assert td.cached_count(spark, "/root/testdata/sf0.001", "lineitem") == td.load_table(
        spark, "/root/testdata/sf0.001", "lineitem"
    ).count()
