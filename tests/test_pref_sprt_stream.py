"""Round-8 sequential preference monitor: the streaming SPRT fold over
per-batch counts equals the event-level SPRT evaluated at batch
boundaries, and a ledger replay changes no decision.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import functions as F

_Q1 = math.floor(math.log(0.6 / 0.5) * (1 << 20))
_Q0 = math.floor(math.log(0.4 / 0.5) * (1 << 20))
_QA = math.floor(math.log(0.95 / 0.05) * (1 << 20))
_QB = math.floor(math.log(0.05 / 0.95) * (1 << 20))


def _comparisons(spark, n=400):
    rows = []
    for d in range(n):
        for i in range(4):
            for j in range(i + 1, 4):
                wi = bin((d * 7 + i) % 64).count("1")
                wj = bin((d * 7 + j) % 64).count("1")
                rows.append((i, j, i if wi >= wj else j, d))
    return spark.createDataFrame(
        rows, "sys_a bigint, sys_b bigint, winner bigint, d bigint"
    )


def _expected_batch_sprt(batches):
    """Pure-python reference: per pair, fold wins·q1 + losses·q0 over
    batches in order, first boundary crossing wins."""
    out = {}
    state: dict = {}
    for bid, rows in enumerate(batches):
        per: dict = {}
        for (a, b, winner) in rows:
            n, w = per.get((a, b), (0, 0))
            per[(a, b)] = (n + 1, w + (1 if winner == a else 0))
        for pair, (n, w) in per.items():
            cum, crossed = state.get(pair, (0, None))
            cum += w * _Q1 + (n - w) * _Q0
            if crossed is None and (cum >= _QA or cum <= _QB):
                crossed = (bid, cum)
            state[pair] = (cum, crossed)
    for pair, (cum, crossed) in state.items():
        if crossed is None:
            out[pair] = ("continue", -1, 0)
        else:
            bid, cq = crossed
            out[pair] = (
                "accept_h1" if cq >= _QA else "accept_h0", bid, cq,
            )
    return out


def test_stream_sprt_equals_batch_boundary_reference(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import BatchLedger
    from ecs_ecommerce_data_pipeline_spark.streaming.preference_stream import (
        preference_stream,
        sprt_monitor_from_stats,
    )

    comp = _comparisons(spark)
    drop = str(tmp_path / "drop")
    batches = []
    for k in range(3):
        part = comp.filter(F.col("d") % 3 == k)
        part.coalesce(1).write.mode("append").parquet(drop)
        batches.append(
            [(r["sys_a"], r["sys_b"], r["winner"]) for r in part.collect()]
        )

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

    got = {
        (r["sys_a"], r["sys_b"]): (
            r["decision"], r["crossing_batch"], r["crossing_cum_q"],
        )
        for r in sprt_monitor_from_stats(
            spark, state, q1=_Q1, q0=_Q0, qa=_QA, qb=_QB
        ).collect()
    }
    assert got == _expected_batch_sprt(batches)

    # replay batch 1: idempotent dynamic overwrite ⇒ identical monitor
    st = json.load(open(lpath))
    st["pref-microbatch-1"] = "running"
    json.dump(st, open(lpath, "w"))
    run("ckpt2")
    got2 = {
        (r["sys_a"], r["sys_b"]): (
            r["decision"], r["crossing_batch"], r["crossing_cum_q"],
        )
        for r in sprt_monitor_from_stats(
            spark, state, q1=_Q1, q0=_Q0, qa=_QA, qb=_QB
        ).collect()
    }
    assert got2 == got
