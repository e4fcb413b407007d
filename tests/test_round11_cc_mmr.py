"""Round-11 optimization pins: (1) the single-task union-find fast path
of ``connected_components`` must be identical to the distributed
star-contraction + min-label propagation (component labels are a unique
connectivity fact), with the dispatch env-gated so BOTH paths stay
exercised; (2) the grouped-Arrow MMR kernel must reproduce the greedy
MMR reference (picks, order, scores).
"""

from __future__ import annotations

from ecs_ecommerce_data_pipeline_spark.operators.dedup import connected_components


def _cc(spark, pairs, schema):
    edges = spark.createDataFrame(pairs, schema)
    return {
        (r["node"], r["component"]) for r in connected_components(edges).collect()
    }


def _rand_edges(n_nodes=120, n_edges=200, seed=7):
    # deterministic LCG so the graph is stable across runs
    x = seed
    out = []
    for _ in range(n_edges):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = x % n_nodes
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x % n_nodes
        out.append((a, b))
    return out


def test_fast_path_matches_distributed(spark, monkeypatch):
    pairs = _rand_edges()
    fast = _cc(spark, pairs, "doc_a bigint, doc_b bigint")
    monkeypatch.setenv("SPARK_GRAFT_CC_SINGLE_TASK_EDGES", "0")
    slow = _cc(spark, pairs, "doc_a bigint, doc_b bigint")
    assert fast == slow
    # sanity: min-label contract holds
    comp_of = dict(fast)
    assert all(c <= n for n, c in fast)
    assert all(comp_of[c] == c for _, c in fast)


def test_fast_path_string_ids(spark, monkeypatch):
    pairs = [("d1", "d2"), ("d2", "d3"), ("x9", "x8"), ("m5", "m5")]
    fast = _cc(spark, pairs, "doc_a string, doc_b string")
    monkeypatch.setenv("SPARK_GRAFT_CC_SINGLE_TASK_EDGES", "0")
    slow = _cc(spark, pairs, "doc_a string, doc_b string")
    assert fast == slow
    assert ("d3", "d1") in fast and ("x9", "x8") in fast


def test_distributed_chain_still_reaches_fixpoint(spark, monkeypatch):
    # path graph of diameter 9 forces several propagation rounds on the
    # distributed path (the small-graph tests now take the fast path)
    monkeypatch.setenv("SPARK_GRAFT_CC_SINGLE_TASK_EDGES", "0")
    got = _cc(spark, [(i, i + 1) for i in range(1, 10)], "doc_a bigint, doc_b bigint")
    assert got == {(i, 1) for i in range(1, 11)}


def test_empty_edges(spark):
    assert _cc(spark, [], "doc_a bigint, doc_b bigint") == set()


def test_mmr_kernel_matches_greedy_reference(spark):
    import math

    from ecs_ecommerce_data_pipeline_spark.operators.similarity import (
        mmr_diversified_topk,
    )

    vecs = {
        0: [1.0, 0.0, 0.0],
        1: [0.9, 0.1, 0.0],  # near-copy of 0: MMR must demote it
        2: [0.0, 1.0, 0.0],
        3: [0.0, 0.9, 0.2],
        4: [0.5, 0.5, 0.5],
        5: [0.1, 0.0, 1.0],
        100: [1.0, 0.05, 0.0],  # query A
        101: [0.0, 1.0, 0.1],  # query B
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id bigint, embedding array<double>"
    )
    k, shortlist, lam = 4, 6, 0.5
    got = [
        (r.query_id, r.mmr_rank, r.corpus_id, r.mmr_score)
        for r in mmr_diversified_topk(
            emb, [100, 101], k=k, shortlist=shortlist, lam=lam
        )
        .orderBy("query_id", "mmr_rank")
        .collect()
    ]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    expect = []
    for q in (100, 101):
        cand = sorted(
            ((cos(vecs[q], vecs[c]), c) for c in vecs if c not in (100, 101)),
            key=lambda t: (-t[0], t[1]),
        )[:shortlist]
        rel = {c: r for r, c in cand}
        ms = {c: 0.0 for c in rel}
        picked = []
        for rank in range(1, k + 1):
            avail = [c for c in rel if c not in picked]
            best = max(avail, key=lambda c: (lam * rel[c] - (1 - lam) * ms[c], -c))
            picked.append(best)
            expect.append((q, rank, best, lam * rel[best] - (1 - lam) * ms[best]))
            for c in avail:
                if c != best:
                    ms[c] = max(ms[c], cos(vecs[c], vecs[best]))

    assert [(q, r, c) for q, r, c, _ in got] == [(q, r, c) for q, r, c, _ in expect]
    for (_, _, _, s_got), (_, _, _, s_exp) in zip(got, expect):
        assert abs(s_got - s_exp) < 1e-12
