"""Distribution-drift and mixture-reweighting queries.

The ref/cur split is the engine's deterministic md5 parity of doc_id
(same idiom as ``operators.sampling.hash_bucket`` — reproducible in any
engine, stable under repartitioning), standing in for "last month's
corpus vs this ingest batch".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.drift import ks_two_sample, mix_weights, psi_bins
from ..operators.sampling import hash_bucket
from ..sources.testdata import load_table

_SMP_SQL = (
    "CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0 "
    "THEN 'ref' ELSE 'cur' END"
)


def _with_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.withColumn(
        "smp",
        F.when(hash_bucket("doc_id", 2) == 0, F.lit("ref")).otherwise(F.lit("cur")),
    )


_KS_SQL = f"""
WITH s AS (
    SELECT n_chars AS v, {_SMP_SQL} AS smp FROM documents
    WHERE n_chars IS NOT NULL
),
counts AS (
    SELECT v,
           CAST(sum(CASE WHEN smp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
           CAST(sum(CASE WHEN smp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS c_b
    FROM s GROUP BY v
),
tot AS (
    SELECT CAST(sum(c_a) AS BIGINT) AS n_a, CAST(sum(c_b) AS BIGINT) AS n_b
    FROM counts
),
cdf AS (
    SELECT v,
           CAST(sum(c_a) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
           CAST(sum(c_b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b
    FROM counts
)
SELECT t.n_a, t.n_b,
       -- same empty-sample rule as the engine (operators/drift.py): a
       -- one-sided comparison has no KS statistic — NULL stat AND NULL
       -- location, never a /0 artifact
       CASE WHEN t.n_a > 0 AND t.n_b > 0 THEN
           ABS(CAST(c.cum_a AS DOUBLE) / CAST(t.n_a AS DOUBLE)
             - CAST(c.cum_b AS DOUBLE) / CAST(t.n_b AS DOUBLE))
       END AS ks_stat,
       CASE WHEN t.n_a > 0 AND t.n_b > 0 THEN CAST(c.v AS DOUBLE)
       END AS ks_at_value
FROM cdf c, tot t
ORDER BY ks_stat DESC NULLS LAST, c.v ASC
LIMIT 1
"""


@register("drift_ks_doc_lengths", _KS_SQL)
def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic on document lengths between the md5-parity
    ref/cur corpus halves. Exact-integer CDFs — hash-stable."""
    return ks_two_sample(_with_sample(spark, sf_dir), "n_chars", "smp", "ref", "cur")


_PSI_SQL = f"""
WITH s AS (
    SELECT CAST(n_chars AS DOUBLE) AS v, {_SMP_SQL} AS smp FROM documents
    WHERE n_chars IS NOT NULL
),
edges AS (
    SELECT quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e
    FROM s WHERE smp = 'ref'
),
binned AS (
    SELECT CAST(len(list_filter(e.e, x -> s.v > x)) AS BIGINT) AS bin, s.smp
    FROM s, edges e
),
agg AS (
    SELECT bin,
           CAST(sum(CASE WHEN smp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
           CAST(sum(CASE WHEN smp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
    FROM binned GROUP BY bin
),
tot AS (
    SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref, CAST(sum(c_cur) AS BIGINT) AS n_cur
    FROM agg
),
terms AS (
    SELECT a.bin, a.c_ref, a.c_cur,
           CAST(a.c_ref + 1 AS DOUBLE) / (CAST(t.n_ref AS DOUBLE) + 10.0) AS p_ref,
           CAST(a.c_cur + 1 AS DOUBLE) / (CAST(t.n_cur AS DOUBLE) + 10.0) AS p_cur
    FROM agg a, tot t
)
SELECT bin, c_ref, c_cur, p_ref, p_cur,
       CAST(FLOOR((p_cur - p_ref) * ln(p_cur / p_ref) * 1099511627776.0) AS BIGINT) AS psi_term_q,
       CAST(sum(CAST(FLOOR((p_cur - p_ref) * ln(p_cur / p_ref) * 1099511627776.0) AS BIGINT))
            OVER () AS BIGINT) AS psi_total_q
FROM terms
"""


@register("drift_psi_doc_lengths", _PSI_SQL)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI per decile bin (edges from the ref half's exact quantiles),
    Laplace-smoothed, fixed-point-quantized terms."""
    return psi_bins(_with_sample(spark, sf_dir), "n_chars", "smp", "ref", "cur")


_MIX_SQL = """
WITH c AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
),
t AS (
    SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_domains
    FROM c
)
SELECT c.source, c.n_docs,
       CAST(c.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share,
       1.0 / CAST(t.n_domains AS DOUBLE) AS target_share,
       (1.0 / CAST(t.n_domains AS DOUBLE))
           / (CAST(c.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE)) AS weight
FROM c, t
"""


@register("domain_mix_weights", _MIX_SQL)
def q_domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling multipliers that re-mix the corpus toward a
    uniform domain distribution (DoReMi-style static reweighting)."""
    docs = load_table(spark, sf_dir, "documents")
    return mix_weights(docs, "source")


# α = 0.5 exactly, so share^α is sqrt(share) — sqrt is CORRECTLY
# ROUNDED in IEEE 754 (unlike pow, where libm implementations differ in
# the last ulp); the normalizer then sums FLOOR(sqrt·2^20) BIGINTs so
# aggregation order cannot move it either (the repo's standard
# quantized-transcendental idiom — 2^20 keeps the ulp-flip hazard
# negligible per the 2^S·1e-16 analysis in the verify notes).
_TEMP_SCALE = float(2**20)

_MIX_TEMP_SQL = f"""
WITH c AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM c),
p AS (
    SELECT c.source, c.n_docs,
           CAST(c.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share,
           CAST(FLOOR(SQRT(CAST(c.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE))
                      * {_TEMP_SCALE!r}) AS BIGINT) AS pow_q
    FROM c, t
),
z AS (SELECT CAST(SUM(pow_q) AS BIGINT) AS z FROM p)
SELECT p.source, p.n_docs, p.share,
       CAST(p.pow_q AS DOUBLE) / CAST(z.z AS DOUBLE) AS target_share,
       (CAST(p.pow_q AS DOUBLE) / CAST(z.z AS DOUBLE)) / p.share AS weight
FROM p, z
"""


@register("domain_mix_temperature", _MIX_TEMP_SQL)
def q_domain_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain sampling (multilingual-LM style):
    target share ∝ share^α with α = 0.5 — up-weights rare sources
    without flattening to uniform (α=1 keeps the natural mix, α=0 is
    uniform). The per-source multiplier feeds the weighted samplers.
    Two tiny aggregations; the normalizer rides a 1-row broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    total = counts.agg(F.sum("n_docs").cast("bigint").alias("n_total"))
    share = F.col("n_docs").cast("double") / F.col("n_total").cast("double")
    p = counts.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        share.alias("share"),
        F.floor(F.sqrt(share) * F.lit(_TEMP_SCALE)).cast("bigint").alias("pow_q"),
    )
    z = p.agg(F.sum("pow_q").cast("bigint").alias("z"))
    tgt = F.col("pow_q").cast("double") / F.col("z").cast("double")
    return p.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "share",
        tgt.alias("target_share"),
        (tgt / F.col("share")).alias("weight"),
    )


# ---------------------------------------------------------------------------
# Round 9: the closed drift loop, batch-verified (alarm -> re-seed ->
# re-train).  The STREAM face (vector_index_stream(retrain_psi_threshold),
# retrain_quantizer) is pinned fold-equals-batch by
# tests/test_round9_retrain.py; these two queries hash-verify the SAME
# math cross-engine on a deterministic drift-adversarial fixture — the
# established two-legged verification for streaming operators.
# ---------------------------------------------------------------------------

_DR9_DIMS = 8
_DR9_NC = 8
_DR9_BATCHES = 4
_DR9_THRESH = 0.25

_DR9_U_DK = (
    "(('0x' || substr(md5({s}), 1, 15))::BIGINT"
    " / 1152921504606846976.0 * 2.0 - 1.0)"
)
_DR9_U_SP = (
    "(CAST(CONV(SUBSTRING(MD5({s}), 1, 15), 16, 10) AS DOUBLE)"
    " / 1152921504606846976.0D * 2.0D - 1.0D)"
)

# fixture: triggers 0..2 uniform, trigger 3 a tight cluster at a fixed
# md5 direction — the mid-stream distribution shift
_DR9_E_DK = f"""e AS (
    SELECT vec_id, vec_id % {_DR9_BATCHES} AS batch,
           list_transform(range(0, {_DR9_DIMS}), d ->
               CASE WHEN vec_id % {_DR9_BATCHES} < {_DR9_BATCHES - 1}
                    THEN {_DR9_U_DK.format(s="'du:' || vec_id || ':' || d")}
                    ELSE {_DR9_U_DK.format(s="'dc9:' || d")}
                         + 0.05 * {_DR9_U_DK.format(s="'ds:' || vec_id || ':' || d")}
               END) AS v
    FROM embeddings
)"""

_DR9_FZ_DK = f"""fz AS (
    SELECT vec_id AS cluster_id, v AS centroid
    FROM e WHERE batch = 0 ORDER BY vec_id LIMIT {_DR9_NC}
)"""

_DR9_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)

_DR9_ASG_DK = f"""afz AS (
    SELECT vec_id, cluster_id FROM (
        SELECT e.vec_id, c.cluster_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {_DR9_COS.format(a="e.v", b="c.centroid")} DESC,
                            c.cluster_id) AS rk
        FROM e CROSS JOIN fz c
    ) WHERE rk = 1
),
asgb AS (
    SELECT a.cluster_id AS cell, e.batch FROM afz a JOIN e USING (vec_id)
)"""


def _dr9_psi_block(t: int) -> str:
    """Per-trigger PSI CTEs: reference = triggers < t, current = t,
    Laplace +1 / (+n_cells) smoothing, FLOOR(term·2^40) quantization —
    the quantizer_drift_psi math."""
    return f"""ref{t} AS (
    SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM asgb
    WHERE batch < {t} GROUP BY 1
),
cur{t} AS (
    SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM asgb
    WHERE batch = {t} GROUP BY 1
),
cells{t} AS (
    SELECT cell FROM ref{t} UNION SELECT cell FROM cur{t}
),
tot{t} AS (
    SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM ref{t}) AS n_ref,
           (SELECT CAST(SUM(n) AS BIGINT) FROM cur{t}) AS n_cur
),
psi{t} AS (
    SELECT CAST(SUM(CAST(FLOOR((p_cur - p_ref) * ln(p_cur / p_ref)
               * 1099511627776.0) AS BIGINT)) AS BIGINT) AS psi_q
    FROM (
        SELECT CAST(COALESCE(r.n, 0) + 1 AS DOUBLE)
                   / (CAST(t.n_ref AS DOUBLE) + {float(_DR9_NC)}) AS p_ref,
               CAST(COALESCE(u.n, 0) + 1 AS DOUBLE)
                   / (CAST(t.n_cur AS DOUBLE) + {float(_DR9_NC)}) AS p_cur
        FROM cells{t} c
        LEFT JOIN ref{t} r USING (cell)
        LEFT JOIN cur{t} u USING (cell)
        CROSS JOIN tot{t} t
    )
)"""


_DR9_THRESH_Q = int(_DR9_THRESH * (2**40))

_DR9_TRACE_SQL = (
    f"WITH {_DR9_E_DK},\n{_DR9_FZ_DK},\n{_DR9_ASG_DK},\n"
    + ",\n".join(_dr9_psi_block(t) for t in range(1, _DR9_BATCHES))
    + "\n"
    + "\nUNION ALL ".join(
        f"""SELECT {t} AS trigger,
       (SELECT n_ref FROM tot{t}) AS n_ref,
       (SELECT n_cur FROM tot{t}) AS n_cur,
       (SELECT psi_q FROM psi{t}) AS psi_total_q,
       (SELECT psi_q FROM psi{t}) > {_DR9_THRESH_Q} AS alarm"""
        for t in range(1, _DR9_BATCHES)
    )
)


def _drift_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, batch, v): the drift-adversarial stream fixture in batch
    form — md5-analytic, bit-reproduced by the oracle CTE."""
    u_du = _DR9_U_SP.format(
        s="CONCAT('du:', CAST(vec_id AS STRING), ':', CAST(d AS STRING))"
    )
    u_c = _DR9_U_SP.format(s="CONCAT('dc9:', CAST(d AS STRING))")
    u_ds = _DR9_U_SP.format(
        s="CONCAT('ds:', CAST(vec_id AS STRING), ':', CAST(d AS STRING))"
    )
    vec_sql = (
        f"transform(sequence(0, {_DR9_DIMS - 1}), d -> "
        f"CASE WHEN vec_id % {_DR9_BATCHES} < {_DR9_BATCHES - 1} "
        f"THEN {u_du} ELSE {u_c} + 0.05D * {u_ds} END)"
    )
    return (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            (F.col("vec_id") % _DR9_BATCHES).cast("bigint").alias("batch"),
        )
        .withColumn("v", F.expr(vec_sql))
    )


def _dr9_frozen_and_assigned(spark: SparkSession, sf_dir: str):
    """Frozen smallest-id quantizer over trigger 0 + every row assigned
    against it (the stream's freeze-then-assign behavior in batch
    form), as (fixture, centroids, assigned-with-batch)."""
    from ..operators.similarity import ivf_index_add_batch, norm

    fx = _drift_fixture(spark, sf_dir).localCheckpoint()
    frozen = (
        fx.filter(F.col("batch") == 0)
        .orderBy("vec_id")
        .limit(_DR9_NC)
        .select(
            F.col("vec_id").alias("cell"),
            F.col("v").alias("cvec"),
            norm(F.col("v")).alias("cnrm"),
        )
        .localCheckpoint()
    )
    asg = ivf_index_add_batch(frozen, fx, id_col="vec_id", vec_col="v").join(
        fx.select(F.col("vec_id").alias("vid"), "batch"), "vid"
    )
    return fx, frozen, asg.localCheckpoint()


@register("stream_retrain_psi_trace", _DR9_TRACE_SQL)
def q_stream_retrain_psi_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift loop's ALARM leg, hash-verified: per stream trigger,
    the Laplace-smoothed quantized PSI between the store's occupancy
    (all earlier triggers, latest-wins) and the arriving batch's, under
    the frozen smallest-id quantizer — exactly what
    ``vector_index_stream(retrain_psi_threshold=…)`` computes before
    deciding to retrain (``_drift_check_and_retrain``), on a fixture
    whose last trigger is a genuine distribution shift.  Measured
    (sf0.01): uniform triggers sit orders of magnitude under the 0.25
    threshold, the shifted trigger crosses it — the alarm fires exactly
    once, at the right place.  The retrain leg this alarm triggers is
    verified by ``stream_retrain_occupancy_profile`` and the
    fold-equals-batch stream test."""
    from ..operators.drift import PSI_SCALE

    _fx, _frozen, asg = _dr9_frozen_and_assigned(spark, sf_dir)
    # Round 11 (guide §1.2 step 1): the trigger loop used to run FOUR
    # passes over ``asg`` per trigger (ref/cur occupancy aggregates plus
    # two count() collects) and a driver-synchronized psi collect each —
    # ~4(B−1) corpus passes and a dozen jobs for B=4.  Every per-trigger
    # quantity derives from the ONE bounded (batch, cell) count matrix,
    # so the whole trace is now a single plan over a single aggregation
    # pass: ref/cur counts per (trigger, cell) via a broadcast non-equi
    # join of the ≤ B·n_cells matrix against the trigger range, then the
    # IDENTICAL smoothed-psi expression (`quantizer_drift_psi`'s Laplace
    # +1 / +n_cells, FLOOR(term·2^40)) per occupied cell — same integer
    # inputs, same Catalyst float ops, bit-identical terms — summed per
    # trigger.  Zero collects; the alarm comparison runs in-plan.
    occ = asg.groupBy("batch", "cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    trig = spark.range(1, _DR9_BATCHES).select(
        F.col("id").cast("bigint").alias("trigger")
    )
    # occupied-cells variant: a (trigger, cell) row exists iff the cell
    # holds any count at batch <= trigger — exactly ref ∪ cur occupancy
    per = (
        trig.join(F.broadcast(occ), F.col("batch") <= F.col("trigger"))
        .groupBy("trigger", "cell")
        .agg(
            F.sum(
                F.when(F.col("batch") < F.col("trigger"), F.col("n")).otherwise(0)
            ).cast("bigint").alias("c_ref"),
            F.sum(
                F.when(F.col("batch") == F.col("trigger"), F.col("n")).otherwise(0)
            ).cast("bigint").alias("c_cur"),
        )
        # feeds both the per-trigger totals and the term expression —
        # cut once so the (tiny) matrix is not rebuilt per consumer
        .localCheckpoint(eager=False)
    )
    tot = per.groupBy("trigger").agg(
        F.sum("c_ref").cast("bigint").alias("n_ref"),
        F.sum("c_cur").cast("bigint").alias("n_cur"),
    )
    p_ref = (F.col("c_ref") + 1).cast("double") / (
        F.col("n_ref").cast("double") + F.lit(float(_DR9_NC))
    )
    p_cur = (F.col("c_cur") + 1).cast("double") / (
        F.col("n_cur").cast("double") + F.lit(float(_DR9_NC))
    )
    psis = (
        per.join(tot, "trigger")
        .withColumn("p_ref", p_ref)
        .withColumn("p_cur", p_cur)
        .withColumn(
            "psi_term_q",
            F.floor(
                (F.col("p_cur") - F.col("p_ref"))
                * F.log(F.col("p_cur") / F.col("p_ref"))
                * F.lit(PSI_SCALE)
            ).cast("bigint"),
        )
        .groupBy("trigger")
        .agg(F.sum("psi_term_q").cast("bigint").alias("psi_total_q"))
    )
    return (
        trig.join(tot, "trigger", "left")
        .join(psis, "trigger", "left")
        .select(
            "trigger",
            F.coalesce("n_ref", F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("bigint").alias("n_cur"),
            F.coalesce("psi_total_q", F.lit(0)).cast("bigint")
            .alias("psi_total_q"),
            (
                F.coalesce("psi_total_q", F.lit(0)) > F.lit(_DR9_THRESH_Q)
            ).alias("alarm"),
        )
    )


# The retrain-effect leg: sorted per-cell occupancy profile of the
# frozen quantizer vs the k-means||-retrained one over the SAME drifted
# corpus.  The oracle re-derives the ENTIRE retrain chain (sampling
# decisions, max-min reduction, Lloyd means, final assignment) from the
# generators the kpar queries verified — a hash match pins the retrain
# the stream runs, value for value, independent of the streaming
# harness.


def _dr9_profile_sql() -> str:
    from .similarity_q import (
        _fps_run_ctes,
        _km_assign_cte,
        _km_recompute_cte,
        _kpar_ctes,
    )

    return f"""
WITH {_DR9_E_DK},
el AS (SELECT vec_id, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
{_DR9_FZ_DK},
{_DR9_ASG_DK},
{_kpar_ctes(2 * _DR9_NC, 3)},
ke9 AS (SELECT cand_vid AS vec_id, cvec AS v FROM kcands),
{_fps_run_ctes(_DR9_NC, base="ke9", pfx="d9")},
c9s AS (SELECT sid AS cluster_id, v AS centroid FROM d9fseeds),
{_km_assign_cte("a9a", "c9s")},
{_km_recompute_cte("c9b", "a9a")},
{_km_assign_cte("a9b", "c9b")},
{_km_recompute_cte("c9c", "a9b")},
{_km_assign_cte("a9c", "c9c")},
occ_f AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, cluster_id) AS occ_rank
    FROM afz GROUP BY cluster_id
),
occ_r AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, cluster_id) AS occ_rank
    FROM a9c GROUP BY cluster_id
)
SELECT COALESCE(f.occ_rank, r.occ_rank) AS occ_rank,
       COALESCE(f.n, 0) AS n_frozen,
       COALESCE(r.n, 0) AS n_retrained
FROM occ_f f FULL OUTER JOIN occ_r r ON r.occ_rank = f.occ_rank
"""


@register("stream_retrain_occupancy_profile", _dr9_profile_sql())
def q_stream_retrain_occupancy_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The drift loop's RETRAIN leg, hash-verified: sorted per-cell
    occupancy of the drifted corpus under (a) the frozen smallest-id
    quantizer the stream trained on trigger 0 and (b) the
    k-means||-retrained quantizer ``retrain_quantizer`` builds when the
    PSI alarm fires (oversample l=2k → max-min reduce → 1 Lloyd
    iteration → final recompute → re-assign — every stage re-derived by
    the oracle).  Measured (sf0.01, head of each profile): frozen
    124/102/55…, retrained 174/61/54… — the fixture's shift is ONE
    tight cluster, so a fat head is the Lloyd-OPTIMAL steady state on
    both sides; the difference is that the retrained head is the drift
    family plus its true nearest uniforms (a deliberate dedicated
    list), where the frozen head is whichever trigger-0 vector happened
    to sit closest.  This query's job is pinning the retrain chain
    cross-engine value-for-value; the semantic effects (alarm placement,
    cell purity, exact recall at nprobe=2, replay convergence) are
    pinned by ``stream_retrain_psi_trace`` and
    tests/test_round9_retrain.py."""
    from ..operators.similarity import (
        assign_to_centroids,
        farthest_point_seeds,
        kmeans_parallel_oversample,
        kmeans_refine,
        recompute_centroids,
    )
    from pyspark.sql.window import Window as W

    fx, _frozen, asg = _dr9_frozen_and_assigned(spark, sf_dir)
    cands, _ = kmeans_parallel_oversample(
        fx, l=2 * _DR9_NC, rounds=3, id_col="vec_id", vec_col="v"
    )
    init = farthest_point_seeds(
        cands, k=_DR9_NC, id_col="vid", vec_col="vec"
    ).select("cluster_id", "centroid")
    assignment = kmeans_refine(
        fx, k=_DR9_NC, iters=1, id_col="vec_id", vec_col="v",
        init_centroids=init,
    )
    cents = recompute_centroids(fx, assignment, "vec_id", "v")
    final = assign_to_centroids(fx, cents, "vec_id", "v")
    w = W.orderBy(F.desc("n"), F.asc("cell"))
    occ_f = (
        asg.groupBy(F.col("cell"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn("occ_rank", F.row_number().over(w).cast("bigint"))
        .select("occ_rank", F.col("n").alias("n_frozen"))
    )
    wr = W.orderBy(F.desc("n"), F.asc("cluster_id"))
    occ_r = (
        final.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn("occ_rank", F.row_number().over(wr).cast("bigint"))
        .select("occ_rank", F.col("n").alias("n_retrained"))
    )
    return occ_f.join(occ_r, "occ_rank", "full_outer").select(
        "occ_rank",
        F.coalesce("n_frozen", F.lit(0)).cast("bigint").alias("n_frozen"),
        F.coalesce("n_retrained", F.lit(0)).cast("bigint").alias("n_retrained"),
    )


# Page's CUSUM over the retrain PSI trace — the persistent-shift
# sequential detector on the vector store's drift series, completing
# the pair the events/preference families already serve (SPRT + CUSUM):
# a threshold flag flickers on noisy triggers; CUSUM accumulates
# evidence and stays up once a real shift lands.

_DR9_CUSUM_K = int(0.1 * (2**40))   # per-trigger allowance (0.1 PSI)
_DR9_CUSUM_H = int(1.0 * (2**40))   # decision barrier (1.0 PSI)

_DR9_CUSUM_SQL = (
    f"WITH {_DR9_E_DK},\n{_DR9_FZ_DK},\n{_DR9_ASG_DK},\n"
    + ",\n".join(_dr9_psi_block(t) for t in range(1, _DR9_BATCHES))
    + f""",
trace AS (
    {" UNION ALL ".join(
        f"SELECT {t} AS trigger, (SELECT psi_q FROM psi{t}) AS psi_total_q"
        for t in range(1, _DR9_BATCHES)
    )}
),
x AS (
    SELECT trigger, psi_total_q,
           CAST(psi_total_q - {_DR9_CUSUM_K} AS BIGINT) AS xq
    FROM trace
),
c AS (
    SELECT trigger, psi_total_q, xq,
           CAST(SUM(xq) OVER (ORDER BY trigger) AS BIGINT) AS s
    FROM x
)
SELECT trigger, psi_total_q, xq,
       CAST(s - LEAST(CAST(0 AS BIGINT),
                      MIN(s) OVER (ORDER BY trigger)) AS BIGINT) AS cusum_q,
       (s - LEAST(CAST(0 AS BIGINT), MIN(s) OVER (ORDER BY trigger)))
           >= {_DR9_CUSUM_H} AS alarm
FROM c
"""
)


@register("stream_retrain_cusum", _DR9_CUSUM_SQL)
def q_stream_retrain_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's CUSUM over the drift-adversarial PSI trace — the
    persistent-shift form of the retrain alarm: x_t = psi_q − k_q (the
    quantized allowance; drift under 0.1 PSI per trigger is absorbed),
    C_t = Σx − min(0, running-min Σx) (the ``events_cusum_hourly``
    cumsum−running-min identity), alarm at C_t ≥ 1.0 PSI.  On this
    fixture the threshold flag and the CUSUM agree (one decisive
    shift); on a slow-burn drift the CUSUM fires where the per-trigger
    flag never crosses — the reason production monitors run both.  All
    integer arithmetic over the already-verified trace; two windows
    over an O(triggers) frame."""
    from pyspark.sql.window import Window as W

    _fx, _frozen, asg = _dr9_frozen_and_assigned(spark, sf_dir)
    from ..streaming.vector_index_stream import quantizer_drift_psi

    rows = []
    for t in range(1, _DR9_BATCHES):
        ref_occ = (
            asg.filter(F.col("batch") < t)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        cur_occ = (
            asg.filter(F.col("batch") == t)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        psi_q, _terms = quantizer_drift_psi(ref_occ, cur_occ, _DR9_NC)
        rows.append((t, psi_q))
    trace = spark.createDataFrame(rows, "trigger BIGINT, psi_total_q BIGINT")
    w = W.orderBy("trigger")
    x = trace.withColumn(
        "xq", (F.col("psi_total_q") - F.lit(_DR9_CUSUM_K)).cast("bigint")
    )
    c = x.withColumn("s", F.sum("xq").over(w).cast("bigint"))
    return c.select(
        "trigger",
        "psi_total_q",
        "xq",
        (
            F.col("s")
            - F.least(F.lit(0).cast("bigint"), F.min("s").over(w))
        ).cast("bigint").alias("cusum_q"),
        (
            (
                F.col("s")
                - F.least(F.lit(0).cast("bigint"), F.min("s").over(w))
            )
            >= F.lit(_DR9_CUSUM_H)
        ).alias("alarm"),
    )
