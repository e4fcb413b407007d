"""Preference / annotation-QA queries over an md5-analytic fixture
derived from ``documents`` — the RLHF-data quality surface (operators
in ``operators.preference``; scale + exactness rationale there).

Fixture: four "systems" each score every document with the 60-bit
md5-uniform (the clustered-embeddings discipline: both engines derive
identical doubles from identical formulas, nothing is shipped); every
document contributes one comparison per system pair, winner = higher
score (ties → smaller system id).  Annotators label each document from
a shared doc-level base plus per-annotator noise, so agreement is real
but imperfect — exactly the shape an annotation-QA gate sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators import preference
from ..sources.testdata import load_table

_N_SYS = 4
_N_RATERS = 3

# 60-bit md5 uniform in [-1, 1) — Spark rendering (see
# operators.similarity.synth_clustered_embeddings) and DuckDB twin
_U_SPARK = (
    "(CAST(CONV(SUBSTRING(MD5({s}), 1, 15), 16, 10) AS DOUBLE)"
    " / 1152921504606846976.0D * 2.0D - 1.0D)"
)
_U_DUCK = (
    "(('0x' || substr(md5({s}), 1, 15))::BIGINT"
    " / 1152921504606846976.0 * 2.0 - 1.0)"
)


def _score_spark(k: int) -> str:
    return _U_SPARK.format(s=f"CONCAT('bt:{k}:', CAST(doc_id AS STRING))")


def _comparisons(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    structs = []
    for i in range(_N_SYS):
        for j in range(i + 1, _N_SYS):
            structs.append(
                f"struct(CAST({i} AS BIGINT) AS sys_a,"
                f" CAST({j} AS BIGINT) AS sys_b,"
                f" CAST(IF({_score_spark(i)} >= {_score_spark(j)}, {i}, {j})"
                f" AS BIGINT) AS winner)"
            )
    return docs.select(
        F.expr(f"explode(array({', '.join(structs)}))").alias("c")
    ).select("c.*")


_COMP_DUCK = f"""syspairs AS (
    SELECT * FROM (VALUES {", ".join(f"({i}, {j})" for i in range(_N_SYS) for j in range(i + 1, _N_SYS))}) AS t(i, j)
),
comp AS (
    SELECT CAST(p.i AS BIGINT) AS sys_a, CAST(p.j AS BIGINT) AS sys_b,
           CAST(CASE WHEN
               {_U_DUCK.format(s="'bt:' || p.i || ':' || d.doc_id")}
               >= {_U_DUCK.format(s="'bt:' || p.j || ':' || d.doc_id")}
           THEN p.i ELSE p.j END AS BIGINT) AS winner
    FROM documents d CROSS JOIN syspairs p
)"""


_WINRATE_SQL = f"""
WITH {_COMP_DUCK}
SELECT sys_a, sys_b,
       CAST(COUNT(*) AS BIGINT) AS n_comparisons,
       CAST(SUM(CASE WHEN winner = sys_a THEN 1 ELSE 0 END) AS BIGINT)
           AS wins_a,
       CAST(SUM(CASE WHEN winner = sys_a THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS winrate_a
FROM comp
GROUP BY sys_a, sys_b
"""


@register("pref_winrate_matrix", _WINRATE_SQL)
def q_winrate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise win-rate matrix over the preference fixture: for every
    system pair, comparisons judged, a-side wins, a-side win rate — the
    first readout any RLHF data QA runs, one hash aggregation over the
    comparison log."""
    return preference.pairwise_winrates(_comparisons(spark, sf_dir))


def _bt_iter_sql(p_prev: str, t: str, d: str, p_next: str) -> str:
    return f"""{t} AS (
    SELECT pn.i, pn.j,
           CAST(FLOOR(CAST(pn.n_ij AS DOUBLE) / (pi.p + pj.p)
               * 1048576.0) AS BIGINT) AS term_q
    FROM pairsn pn
    JOIN {p_prev} pi ON pi.system = pn.i
    JOIN {p_prev} pj ON pj.system = pn.j
),
{d} AS (
    SELECT system, CAST(SUM(term_q) AS BIGINT) AS d_q FROM (
        SELECT i AS system, term_q FROM {t}
        UNION ALL SELECT j AS system, term_q FROM {t}
    ) GROUP BY system
),
{p_next} AS (
    SELECT w.system, CAST(w.w AS DOUBLE) * 1048576.0
               / CAST(d.d_q AS DOUBLE) AS p
    FROM wins w JOIN {d} d USING (system)
)"""


_BT_SQL = f"""
WITH {_COMP_DUCK},
pairsn AS (
    SELECT sys_a AS i, sys_b AS j, CAST(COUNT(*) AS BIGINT) AS n_ij
    FROM comp GROUP BY 1, 2
),
systems AS (
    SELECT DISTINCT sys_a AS system FROM comp
    UNION SELECT DISTINCT sys_b FROM comp
),
winsn AS (SELECT winner AS system, CAST(COUNT(*) AS BIGINT) AS w
          FROM comp GROUP BY 1),
wins AS (
    SELECT s.system, CAST(COALESCE(w.w, 0) AS BIGINT) AS w
    FROM systems s LEFT JOIN winsn w USING (system)
),
p0 AS (SELECT system, CAST(1.0 AS DOUBLE) AS p FROM systems),
{_bt_iter_sql("p0", "t1", "d1", "p1")},
{_bt_iter_sql("p1", "t2", "d2", "p2")}
SELECT CAST(system AS BIGINT) AS system, p AS strength,
       CAST(ROW_NUMBER() OVER (ORDER BY p DESC, system ASC) AS BIGINT) AS rnk
FROM p2
"""


@register("pref_bradley_terry", _BT_SQL)
def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths of the four systems via two fixed MM
    rounds — the aggregate-to-metadata shape: the comparison log
    reduces once to (pair counts, win counts); every iteration runs on
    the 4-system frame.  The hash match pins the full chain
    cross-engine: winner decisions, integer reduces, quantized
    denominators, both MM rounds, final ranking."""
    return preference.bradley_terry(_comparisons(spark, sf_dir), iters=2)


_N_FOLDS = 4
_FOLD_SPARK = (
    "(CAST(CONV(SUBSTRING(MD5(CONCAT('bt-fold:', CAST(doc_id AS STRING))),"
    f" 1, 4), 16, 10) AS BIGINT) % {_N_FOLDS})"
)
_FOLD_DUCK = (
    "(('0x' || substr(md5('bt-fold:' || d.doc_id), 1, 4))::BIGINT"
    f" % {_N_FOLDS})"
)


def _comparisons_folded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    structs = []
    for i in range(_N_SYS):
        for j in range(i + 1, _N_SYS):
            structs.append(
                f"struct(CAST({i} AS BIGINT) AS sys_a,"
                f" CAST({j} AS BIGINT) AS sys_b,"
                f" CAST(IF({_score_spark(i)} >= {_score_spark(j)}, {i}, {j})"
                f" AS BIGINT) AS winner)"
            )
    return docs.select(
        F.expr(_FOLD_SPARK).alias("fold"),
        F.expr(f"explode(array({', '.join(structs)}))").alias("c"),
    ).select("fold", "c.*")


def _bt_chain_sql(k: int) -> str:
    """One leave-fold-out Bradley-Terry chain (2 MM rounds) over the
    pre-reduced (pair, fold) counts — all CTEs tiny."""
    parts = [f"""pairs{k} AS (
    SELECT i, j, CAST(SUM(n) AS BIGINT) AS n_ij
    FROM pairfold WHERE fold <> {k} GROUP BY 1, 2
)""", f"""wins{k} AS (
    SELECT system, CAST(SUM(w) AS BIGINT) AS w FROM (
        SELECT i AS system, w FROM pairfold WHERE fold <> {k}
        UNION ALL SELECT j AS system, n - w FROM pairfold WHERE fold <> {k}
    ) GROUP BY system
)""", f"""p0_{k} AS (SELECT system, CAST(1.0 AS DOUBLE) AS p FROM systems)"""]
    prev = f"p0_{k}"
    for it in (1, 2):
        parts.append(f"""t{it}_{k} AS (
    SELECT pn.i, pn.j,
           CAST(FLOOR(CAST(pn.n_ij AS DOUBLE) / (pi.p + pj.p)
               * 1048576.0) AS BIGINT) AS term_q
    FROM pairs{k} pn
    JOIN {prev} pi ON pi.system = pn.i
    JOIN {prev} pj ON pj.system = pn.j
),
d{it}_{k} AS (
    SELECT system, CAST(SUM(term_q) AS BIGINT) AS d_q FROM (
        SELECT i AS system, term_q FROM t{it}_{k}
        UNION ALL SELECT j AS system, term_q FROM t{it}_{k}
    ) GROUP BY system
),
p{it}_{k} AS (
    SELECT w.system, CAST(w.w AS DOUBLE) * 1048576.0
               / CAST(d.d_q AS DOUBLE) AS p
    FROM wins{k} w JOIN d{it}_{k} d USING (system)
)""")
        prev = f"p{it}_{k}"
    return ",\n".join(parts)


_BT_JACK_SQL = f"""
WITH syspairs AS (
    SELECT * FROM (VALUES {", ".join(f"({i}, {j})" for i in range(_N_SYS) for j in range(i + 1, _N_SYS))}) AS t(i, j)
),
comp AS (
    SELECT {_FOLD_DUCK} AS fold,
           CAST(p.i AS BIGINT) AS sys_a, CAST(p.j AS BIGINT) AS sys_b,
           CAST(CASE WHEN
               {_U_DUCK.format(s="'bt:' || p.i || ':' || d.doc_id")}
               >= {_U_DUCK.format(s="'bt:' || p.j || ':' || d.doc_id")}
           THEN p.i ELSE p.j END AS BIGINT) AS winner
    FROM documents d CROSS JOIN syspairs p
),
pairfold AS MATERIALIZED (
    SELECT sys_a AS i, sys_b AS j, fold,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN winner = sys_a THEN 1 ELSE 0 END) AS BIGINT)
               AS w
    FROM comp GROUP BY 1, 2, 3
),
systems AS (
    SELECT DISTINCT i AS system FROM pairfold
    UNION SELECT DISTINCT j FROM pairfold
),
{",".join(_bt_chain_sql(k) for k in range(_N_FOLDS))}
SELECT s.system,
       (p2_0.p + p2_1.p + p2_2.p + p2_3.p) / 4.0 AS strength_mean,
       LEAST(p2_0.p, p2_1.p, p2_2.p, p2_3.p) AS strength_min,
       GREATEST(p2_0.p, p2_1.p, p2_2.p, p2_3.p) AS strength_max,
       GREATEST(p2_0.p, p2_1.p, p2_2.p, p2_3.p)
           - LEAST(p2_0.p, p2_1.p, p2_2.p, p2_3.p) AS spread
FROM systems s
JOIN p2_0 ON p2_0.system = s.system
JOIN p2_1 ON p2_1.system = s.system
JOIN p2_2 ON p2_2.system = s.system
JOIN p2_3 ON p2_3.system = s.system
"""


@register("pref_bt_jackknife", _BT_JACK_SQL)
def q_bt_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-jackknife stability for the Bradley-Terry strengths:
    documents (and their six comparisons — grouped, so dependent rows
    stay together) hash into 4 folds, BT runs leave-one-fold-out, and
    the per-system spread across the four estimates is the stability
    readout.  ONE corpus scan total: the log reduces once to (pair,
    fold) counts (24 rows, lineage-cut), every fold's MM chain runs on
    that tiny frame via ``bradley_terry_from_stats``.  Mean uses a
    fixed left-associated sum so the doubles are bit-identical
    cross-engine; min/max/spread are order-free."""
    comp = _comparisons_folded(spark, sf_dir)
    pf = (
        comp.groupBy("sys_a", "sys_b", "fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_comparisons"),
            F.sum(F.when(F.col("winner") == F.col("sys_a"), 1).otherwise(0))
            .cast("bigint")
            .alias("wins_a"),
        )
        .localCheckpoint()
    )
    folds = []
    for k in range(_N_FOLDS):
        stats_k = (
            pf.filter(F.col("fold") != k)
            .groupBy("sys_a", "sys_b")
            .agg(
                F.sum("n_comparisons").cast("bigint").alias("n_comparisons"),
                F.sum("wins_a").cast("bigint").alias("wins_a"),
            )
        )
        folds.append(
            preference.bradley_terry_from_stats(stats_k).select(
                "system", F.col("strength").alias(f"s{k}")
            )
        )
    joined = folds[0]
    for k in range(1, _N_FOLDS):
        joined = joined.join(folds[k], "system")
    mean = (
        F.col("s0") + F.col("s1") + F.col("s2") + F.col("s3")
    ) / F.lit(4.0)
    mn = F.least("s0", "s1", "s2", "s3")
    mx = F.greatest("s0", "s1", "s2", "s3")
    return joined.select(
        "system",
        mean.alias("strength_mean"),
        mn.alias("strength_min"),
        mx.alias("strength_max"),
        (mx - mn).alias("spread"),
    )


def _v_spark() -> str:
    base = _U_SPARK.format(s="CONCAT('base:', CAST(item_id AS STRING))")
    noise = _U_SPARK.format(
        s="CONCAT('an:', CAST(a AS STRING), ':', CAST(item_id AS STRING))"
    )
    return f"(0.5D * {base} + 0.5D * {noise})"


def _labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    v = _v_spark()
    return docs.select(
        F.col("doc_id").alias("item_id"),
        F.expr(f"explode(sequence(0, {_N_RATERS - 1}))").alias("a"),
    ).select(
        "item_id",
        F.col("a").cast("bigint").alias("rater"),
        F.expr(
            f"CAST(CASE WHEN {v} < -0.25D THEN 0"
            f" WHEN {v} < 0.25D THEN 1 ELSE 2 END AS BIGINT)"
        ).alias("label"),
    )


_V_DUCK = (
    f"(0.5 * {_U_DUCK.format(s=chr(39) + 'base:' + chr(39) + ' || d.doc_id')}"
    f" + 0.5 * {_U_DUCK.format(s=chr(39) + 'an:' + chr(39) + ' || a.a || ' + chr(39) + ':' + chr(39) + ' || d.doc_id')})"
)

_KAPPA_SQL = f"""
WITH raters AS (
    SELECT * FROM (VALUES {", ".join(f"({a})" for a in range(_N_RATERS))}) AS t(a)
),
lab AS (
    SELECT d.doc_id AS item_id, CAST(a.a AS BIGINT) AS rater,
           CAST(CASE WHEN {_V_DUCK} < -0.25 THEN 0
                WHEN {_V_DUCK} < 0.25 THEN 1 ELSE 2 END AS BIGINT) AS label
    FROM documents d CROSS JOIN raters a
),
rik AS (
    SELECT item_id, label, CAST(COUNT(*) AS BIGINT) AS r_ik
    FROM lab GROUP BY 1, 2
),
tot AS (
    SELECT CAST(SUM(r_ik * r_ik) AS BIGINT) AS sum_sq,
           CAST(COUNT(DISTINCT item_id) AS BIGINT) AS n
    FROM rik
),
cks AS (
    SELECT CAST(SUM(c_k * c_k) AS BIGINT) AS sum_ck_sq FROM (
        SELECT label, CAST(SUM(r_ik) AS BIGINT) AS c_k FROM rik GROUP BY 1
    )
),
rr AS (SELECT CAST(COUNT(DISTINCT rater) AS BIGINT) AS r FROM lab)
SELECT n AS n_items, r AS n_raters,
       (CAST(sum_sq AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)))
           / ((CAST(n AS DOUBLE) * CAST(r AS DOUBLE))
              * (CAST(r AS DOUBLE) - 1.0)) AS p_bar,
       CAST(sum_ck_sq AS DOUBLE)
           / ((CAST(n AS DOUBLE) * CAST(r AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(r AS DOUBLE))) AS p_e,
       (((CAST(sum_sq AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)))
           / ((CAST(n AS DOUBLE) * CAST(r AS DOUBLE))
              * (CAST(r AS DOUBLE) - 1.0)))
        - (CAST(sum_ck_sq AS DOUBLE)
           / ((CAST(n AS DOUBLE) * CAST(r AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)))))
       / (1.0 - (CAST(sum_ck_sq AS DOUBLE)
           / ((CAST(n AS DOUBLE) * CAST(r AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(r AS DOUBLE))))) AS kappa
FROM tot CROSS JOIN cks CROSS JOIN rr
"""


_COHEN_SQL = f"""
WITH raters AS (
    SELECT * FROM (VALUES {", ".join(f"({a})" for a in range(_N_RATERS))}) AS t(a)
),
lab AS (
    SELECT d.doc_id AS item_id, CAST(a.a AS BIGINT) AS rater,
           CAST(CASE WHEN {_V_DUCK} < -0.25 THEN 0
                WHEN {_V_DUCK} < 0.25 THEN 1 ELSE 2 END AS BIGINT) AS label
    FROM documents d CROSS JOIN raters a
),
obs AS (
    SELECT x.rater AS rater_a, y.rater AS rater_b,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CASE WHEN x.label = y.label THEN 1 ELSE 0 END)
               AS BIGINT) AS o
    FROM lab x JOIN lab y ON y.item_id = x.item_id AND x.rater < y.rater
    GROUP BY 1, 2
),
counts AS (
    SELECT rater, label, CAST(COUNT(*) AS BIGINT) AS c FROM lab GROUP BY 1, 2
),
dots AS (
    SELECT ca.rater AS rater_a, cb.rater AS rater_b,
           CAST(SUM(ca.c * cb.c) AS BIGINT) AS dot
    FROM counts ca JOIN counts cb
        ON cb.label = ca.label AND ca.rater < cb.rater
    GROUP BY 1, 2
)
SELECT o.rater_a, o.rater_b, o.n_items,
       CAST(o.o AS DOUBLE) / CAST(o.n_items AS DOUBLE) AS p_o,
       CAST(d.dot AS DOUBLE)
           / (CAST(o.n_items AS DOUBLE) * CAST(o.n_items AS DOUBLE)) AS p_e,
       ((CAST(o.o AS DOUBLE) / CAST(o.n_items AS DOUBLE))
        - (CAST(d.dot AS DOUBLE)
           / (CAST(o.n_items AS DOUBLE) * CAST(o.n_items AS DOUBLE))))
       / (1.0 - (CAST(d.dot AS DOUBLE)
           / (CAST(o.n_items AS DOUBLE) * CAST(o.n_items AS DOUBLE))))
           AS kappa
FROM obs o JOIN dots d USING (rater_a, rater_b)
"""


@register("pref_cohen_kappa_pairs", _COHEN_SQL)
def q_cohen_kappa_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa per annotator pair — the drill-down under the
    pooled Fleiss gate: with shared-base + per-annotator-noise labels,
    every pair agrees above chance and roughly equally; a rater whose
    pairs all sag is the outlier to audit.  Same integer-statistics
    exactness as the pooled query."""
    return preference.cohen_kappa_pairs(_labels(spark, sf_dir))


@register("pref_annotator_agreement", _KAPPA_SQL)
def q_annotator_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over the three-annotator fixture — the agreement
    gate preference data passes before training.  All sufficient
    statistics are integers (Σ r_ik², category column sums squared),
    divided once in a fixed expression shape, so the doubles are
    bit-identical cross-engine with no ordered float accumulation
    anywhere."""
    return preference.fleiss_kappa(_labels(spark, sf_dir))


# ---------------------------------------------------------------------------
# Sequential preference monitor (round 8): SPRT per system pair
# ---------------------------------------------------------------------------
# The fixed-sample family (win rates, Bradley-Terry, kappa) answers
# "who wins on this log"; the sequential rung answers "when could we
# have STOPPED collecting" — Wald's SPRT on the a-side win rate per
# pair, scanned in arrival (doc_id) order.  Increments and boundaries
# are computed ONCE here in Python and inlined as FLOOR(x·2^20) integer
# literals in BOTH engines (the events_sprt_sequential discipline) —
# no engine evaluates a transcendental.

import math as _math

_SPRT_P0, _SPRT_P1 = 0.5, 0.6
_SPRT_SCALE = 1 << 20
_SPQ1 = _math.floor(_math.log(_SPRT_P1 / _SPRT_P0) * _SPRT_SCALE)
_SPQ0 = _math.floor(
    _math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0)) * _SPRT_SCALE
)
_SPQA = _math.floor(_math.log(0.95 / 0.05) * _SPRT_SCALE)  # accept H1
_SPQB = _math.floor(_math.log(0.05 / 0.95) * _SPRT_SCALE)  # accept H0


def _comparisons_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The preference fixture WITH the arrival-order column retained —
    same winner rule as ``_comparisons``, one row per (pair, doc)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    structs = []
    for i in range(_N_SYS):
        for j in range(i + 1, _N_SYS):
            structs.append(
                f"struct(CAST({i} AS BIGINT) AS sys_a,"
                f" CAST({j} AS BIGINT) AS sys_b,"
                f" CAST(IF({_score_spark(i)} >= {_score_spark(j)}, {i}, {j})"
                f" AS BIGINT) AS winner)"
            )
    return docs.select(
        "doc_id", F.expr(f"explode(array({', '.join(structs)}))").alias("c")
    ).select("doc_id", "c.*")


_COMP_DUCK_ORD = f"""syspairs AS (
    SELECT * FROM (VALUES {", ".join(f"({i}, {j})" for i in range(_N_SYS) for j in range(i + 1, _N_SYS))}) AS t(i, j)
),
comp AS (
    SELECT d.doc_id,
           CAST(p.i AS BIGINT) AS sys_a, CAST(p.j AS BIGINT) AS sys_b,
           CAST(CASE WHEN
               {_U_DUCK.format(s="'bt:' || p.i || ':' || d.doc_id")}
               >= {_U_DUCK.format(s="'bt:' || p.j || ':' || d.doc_id")}
           THEN p.i ELSE p.j END AS BIGINT) AS winner
    FROM documents d CROSS JOIN syspairs p
)"""

_SPRT_MONITOR_SQL = f"""
WITH {_COMP_DUCK_ORD},
terms AS (
    SELECT sys_a, sys_b, doc_id,
           CASE WHEN winner = sys_a THEN 1 ELSE 0 END AS x,
           CASE WHEN winner = sys_a THEN {_SPQ1} ELSE {_SPQ0} END AS term_q
    FROM comp
),
cum AS (
    SELECT sys_a, sys_b, x,
           CAST(SUM(term_q) OVER (
               PARTITION BY sys_a, sys_b ORDER BY doc_id) AS BIGINT) AS cum_q,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY sys_a, sys_b ORDER BY doc_id) AS BIGINT) AS idx
    FROM terms
),
crossing AS (
    SELECT sys_a, sys_b, idx AS crossing_idx, cum_q AS crossing_cum_q FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY sys_a, sys_b ORDER BY idx) AS rn
        FROM cum WHERE cum_q >= {_SPQA} OR cum_q <= {_SPQB}
    ) WHERE rn = 1
),
tot AS (
    SELECT sys_a, sys_b, CAST(COUNT(*) AS BIGINT) AS n_comparisons,
           CAST(SUM(x) AS BIGINT) AS wins_a
    FROM terms GROUP BY 1, 2
)
SELECT t.sys_a, t.sys_b, t.n_comparisons, t.wins_a,
       CASE WHEN c.crossing_cum_q >= {_SPQA} THEN 'accept_h1'
            WHEN c.crossing_cum_q <= {_SPQB} THEN 'accept_h0'
            ELSE 'continue' END AS decision,
       CAST(COALESCE(c.crossing_idx, -1) AS BIGINT) AS crossing_idx,
       CAST(COALESCE(c.crossing_cum_q, 0) AS BIGINT) AS crossing_cum_q
FROM tot t
LEFT JOIN crossing c ON c.sys_a = t.sys_a AND c.sys_b = t.sys_b
"""


@register("pref_sprt_monitor", _SPRT_MONITOR_SQL)
def q_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential win-rate monitor per system pair — SPRT(H0 p=0.5 vs
    H1 p=0.6, α=β=0.05) on the a-side win indicator in arrival order:
    for each pair, sample size, wins, the stop/continue decision, and
    WHERE the log crossed a Wald boundary.  The "stop collecting, A
    wins" readout an RLHF collection pipeline runs while judgments
    stream in; the streaming face
    (``preference_stream.sprt_monitor_from_stats``) folds the same
    integer increments over per-batch counts — test-pinned equal to
    this event-level form at batch boundaries.  All integer arithmetic
    end-to-end (pre-quantized LLR literals, the
    ``events_sprt_sequential`` discipline)."""
    return preference.sprt_pair_decisions(
        _comparisons_ordered(spark, sf_dir),
        q1=_SPQ1, q0=_SPQ0, qa=_SPQA, qb=_SPQB,
        order_col="doc_id",
    )


# --- GRPO group-relative advantages (round 10) -------------------------------

_GRP_G = 8  # sampled completions per prompt

_GRPADV_SQL = f"""
WITH samples AS (
    SELECT doc_id AS prompt_id, s.s AS sample_idx,
           CAST(FLOOR((
               0.5 * {_U_DUCK.format(s="'grp:' || doc_id")}
               + {_U_DUCK.format(s="'grs:' || doc_id || ':' || s.s")}
           ) * 1048576.0) AS BIGINT) AS reward_q
    FROM documents CROSS JOIN range(0, {_GRP_G}) AS s(s)
),
gstat AS (
    SELECT prompt_id, CAST(SUM(reward_q) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS g
    FROM samples GROUP BY prompt_id
),
cent AS (
    SELECT sa.prompt_id, sa.sample_idx, sa.reward_q,
           CAST(gs.g * sa.reward_q - gs.s AS BIGINT) AS d_num, gs.g
    FROM samples sa JOIN gstat gs ON gs.prompt_id = sa.prompt_id
),
vstat AS (
    SELECT prompt_id, CAST(SUM(d_num * d_num) AS BIGINT) AS v
    FROM cent GROUP BY prompt_id
)
SELECT c.prompt_id, c.sample_idx, c.reward_q, c.d_num,
       CASE WHEN vs.v = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(FLOOR(CAST(c.d_num AS DOUBLE)
                * sqrt(CAST(c.g AS DOUBLE))
                / sqrt(CAST(vs.v AS DOUBLE))
                * 1048576.0) AS BIGINT)
       END AS adv_q
FROM cent c JOIN vstat vs ON vs.prompt_id = c.prompt_id
"""


@register("pref_group_advantage", _GRPADV_SQL)
def q_pref_group_advantage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-relative advantage baselines (GRPO, Shao et al.) — the
    critic-free normalization an RL-from-preference pipeline
    materializes per training prompt: G = 8 md5-analytic completion
    rewards per document (doc-level base + per-sample noise, the
    preference-fixture discipline), centered and scaled by the GROUP's
    own mean/std (``operators.preference.group_relative_advantage``).
    Rewards quantize before any aggregation, centering and the variance
    numerator are exact integers, and the advantage is one sqrt + one
    division from those integers — bit-deterministic cross-engine.
    Output: (prompt_id, sample_idx, reward_q, d_num, adv_q)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    u_base = _U_SPARK.format(s="CONCAT('grp:', CAST(doc_id AS STRING))")
    u_noise = _U_SPARK.format(
        s="CONCAT('grs:', CAST(doc_id AS STRING), ':', CAST(s AS STRING))"
    )
    samples = (
        docs.select(
            F.col("doc_id").alias("prompt_id"),
            F.explode(F.sequence(F.lit(0), F.lit(_GRP_G - 1))).alias(
                "sample_idx"
            ),
        )
        .withColumn(
            "reward_q",
            F.expr(
                f"CAST(FLOOR((0.5D * {u_base.replace('doc_id', 'prompt_id')}"
                f" + {u_noise.replace('doc_id', 'prompt_id').replace('CAST(s AS STRING)', 'CAST(sample_idx AS STRING)')})"
                " * 1048576.0D) AS BIGINT)"
            ),
        )
    )
    return preference.group_relative_advantage(
        samples, group_col="prompt_id", reward_q_col="reward_q"
    ).select("prompt_id", "sample_idx", "reward_q", "d_num", "adv_q")
