"""Pairwise-preference and annotation-agreement analytics — the QA
surface of an RLHF / preference-data pipeline: before preference pairs
train a reward model, the pipeline must answer "which system actually
wins, by how much, and do the annotators even agree?".

Reference parity note: the reference ETL
(Eugenia-DE/ecs-ecommerce-data-pipeline) has no preference surface —
this family extends the engine the way the dedup/ANN ladders do, as
first-class LLM-training-data operators.

Scale posture: the comparison log is the only data-sized input; every
operator reduces it with ONE hash aggregation to per-pair or per-item
sufficient statistics (counts), and all iteration happens on the
systems×systems frame — bounded model metadata, never corpus-sized.
Cross-engine exactness: every float is a fixed-order composition of
exact integer counts (divisions/adds/multiplies of identical doubles
are IEEE-identical in Spark and DuckDB); the one order-sensitive sum —
the Bradley-Terry denominator — is quantized to FLOOR(term · 2^20)
BIGINT per term, so the aggregation is integer-exact and
partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# Bradley-Terry denominator quantum: terms are bit-identical doubles in
# both engines (pure rational arithmetic on counts — no transcendental
# last-ulp hazard), so FLOOR at 2^20 is deterministic AND order-free to
# sum.
_BT_SCALE = float(1 << 20)


def pairwise_winrates(
    comparisons: DataFrame,
    a_col: str = "sys_a",
    b_col: str = "sys_b",
    winner_col: str = "winner",
) -> DataFrame:
    """Win-rate matrix from a pairwise comparison log (one row per
    judged pair, ``a_col < b_col`` canonical order): per (sys_a,
    sys_b), total comparisons, wins for the a-side, and the a-side win
    rate.  One hash aggregation over the log — the reduce every other
    preference statistic builds on."""
    return (
        comparisons.groupBy(
            F.col(a_col).cast("bigint").alias("sys_a"),
            F.col(b_col).cast("bigint").alias("sys_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_comparisons"),
            F.sum(
                F.when(F.col(winner_col) == F.col(a_col), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("wins_a"),
        )
        .withColumn(
            "winrate_a",
            F.col("wins_a").cast("double")
            / F.col("n_comparisons").cast("double"),
        )
    )


def bradley_terry(
    comparisons: DataFrame,
    iters: int = 2,
    a_col: str = "sys_a",
    b_col: str = "sys_b",
    winner_col: str = "winner",
) -> DataFrame:
    """Bradley-Terry strengths from a pairwise comparison log via
    ``iters`` FIXED minorization-maximization rounds (Hunter 2004):
    p_i' = W_i / Σ_{j≠i} n_ij / (p_i + p_j), starting from p = 1.

    Fixed iteration count → deterministic plan, no convergence probe;
    the comparison log reduces ONCE to (pair counts, per-system wins),
    and every MM round is a self-join of the systems×systems pair frame
    — bounded model metadata.  Each denominator term is quantized
    FLOOR(term · 2^20) BIGINT before summing, making the per-system sum
    order-free (exact integer aggregation) and bit-reproducible
    cross-engine.  Returns (system, strength, rnk), rank by strength
    descending (ties → smaller system id).
    """
    # round 11 (guide §1.2/§2.3 "aggregate before you shuffle"): the log
    # used to be scanned FOUR times (pair counts, win counts, and a
    # two-branch union for the system universe).  One map-side-combinable
    # aggregation reduces it to bounded (i, j, winner, n) groups —
    # ≤ systems²·3 rows — and every downstream frame derives from that.
    base = (
        comparisons.groupBy(
            F.col(a_col).cast("bigint").alias("i"),
            F.col(b_col).cast("bigint").alias("j"),
            F.col(winner_col).cast("bigint").alias("winner"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    pairs = base.groupBy("i", "j").agg(
        F.sum("n").cast("bigint").alias("n_ij")
    )
    wins = (
        base.groupBy(F.col("winner").alias("system"))
        .agg(F.sum("n").cast("bigint").alias("w"))
    )
    # systems that never win still need a strength row (w = 0)
    systems = (
        base.select(
            F.explode(F.array(F.col("i"), F.col("j"))).alias("system")
        )
        .distinct()
    )
    return _bt_mm(pairs, wins, systems, iters)


def bradley_terry_from_stats(stats: DataFrame, iters: int = 2) -> DataFrame:
    """Bradley-Terry from PRE-REDUCED pair statistics — the serving
    face of the streaming preference store: ``stats`` is the
    :func:`pairwise_winrates` shape (sys_a, sys_b, n_comparisons,
    wins_a), which is ALL the MM iteration ever reads, so streaming
    folds of per-batch counts lose nothing.  Identical result to
    :func:`bradley_terry` over the raw log (test-pinned)."""
    pairs = stats.select(
        F.col("sys_a").cast("bigint").alias("i"),
        F.col("sys_b").cast("bigint").alias("j"),
        F.col("n_comparisons").cast("bigint").alias("n_ij"),
    )
    wins = (
        stats.select(
            F.col("sys_a").cast("bigint").alias("system"),
            F.col("wins_a").cast("bigint").alias("w"),
        )
        .union(
            stats.select(
                F.col("sys_b").cast("bigint"),
                (F.col("n_comparisons") - F.col("wins_a")).cast("bigint"),
            )
        )
        .groupBy("system")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    systems = (
        stats.select(F.col("sys_a").cast("bigint").alias("system"))
        .union(stats.select(F.col("sys_b").cast("bigint")))
        .distinct()
    )
    return _bt_mm(pairs, wins, systems, iters)


def _bt_mm(
    pairs: DataFrame, wins: DataFrame, systems: DataFrame, iters: int
) -> DataFrame:
    """The shared MM loop: (i, j, n_ij) pair counts + per-system win
    counts + the system universe → (system, strength, rnk).  See
    :func:`bradley_terry` for the quantization rationale."""
    wins = systems.join(wins, "system", "left").select(
        "system",
        F.coalesce(F.col("w"), F.lit(0)).cast("bigint").alias("w"),
    )
    p = systems.select("system", F.lit(1.0).alias("p"))
    for _ in range(iters):
        both = (
            pairs.join(
                p.select(F.col("system").alias("i"), F.col("p").alias("p_i")),
                "i",
            )
            .join(
                p.select(F.col("system").alias("j"), F.col("p").alias("p_j")),
                "j",
            )
            .withColumn(
                "term_q",
                F.floor(
                    F.col("n_ij").cast("double")
                    / (F.col("p_i") + F.col("p_j"))
                    * F.lit(_BT_SCALE)
                ).cast("bigint"),
            )
        )
        # one explode instead of a two-branch union (no CSE across
        # union branches — the joins above would run twice)
        terms = both.select(
            F.explode(F.array(F.col("i"), F.col("j"))).alias("system"),
            "term_q",
        )
        denom = terms.groupBy("system").agg(
            F.sum("term_q").cast("bigint").alias("d_q")
        )
        p = wins.join(denom, "system").select(
            "system",
            (
                F.col("w").cast("double")
                * F.lit(_BT_SCALE)
                / F.col("d_q").cast("double")
            ).alias("p"),
        )
    from pyspark.sql import Window as W

    w_rank = W.orderBy(F.desc("p"), F.asc("system"))
    return p.select(
        "system",
        F.col("p").alias("strength"),
        F.row_number().over(w_rank).cast("bigint").alias("rnk"),
    )


def cohen_kappa_pairs(
    labels: DataFrame,
    item_col: str = "item_id",
    rater_col: str = "rater",
    label_col: str = "label",
) -> DataFrame:
    """Cohen's kappa for EVERY annotator pair — the drill-down under
    :func:`fleiss_kappa`: when the pool disagrees, which rater is the
    outlier?  One self-join on the item key (rater_a < rater_b
    canonical), then integer sufficient statistics per pair: observed
    agreement o (label equality count) and the expected-agreement dot
    product Σ_k c_ak·c_bk — so p_o = o/n and p_e = Σ_k c_ak·c_bk / n²
    are each ONE division of exact integers, bit-identical cross-engine.
    Returns (rater_a, rater_b, n_items, p_o, p_e, kappa)."""
    a = labels.select(
        F.col(item_col).alias("item"),
        F.col(rater_col).cast("bigint").alias("rater_a"),
        F.col(label_col).alias("la"),
    )
    b = labels.select(
        F.col(item_col).alias("item"),
        F.col(rater_col).cast("bigint").alias("rater_b"),
        F.col(label_col).alias("lb"),
    )
    joined = a.join(b, "item").filter(F.col("rater_a") < F.col("rater_b"))
    obs = joined.groupBy("rater_a", "rater_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.when(F.col("la") == F.col("lb"), 1).otherwise(0))
        .cast("bigint")
        .alias("o"),
    )
    # per (rater, label) counts, then the per-pair label dot product
    counts = labels.groupBy(
        F.col(rater_col).cast("bigint").alias("rater"),
        F.col(label_col).alias("lab"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ca = counts.select(
        F.col("rater").alias("rater_a"), "lab", F.col("c").alias("c_a")
    )
    cb = counts.select(
        F.col("rater").alias("rater_b"), "lab", F.col("c").alias("c_b")
    )
    dots = (
        ca.join(cb, "lab")
        .filter(F.col("rater_a") < F.col("rater_b"))
        .groupBy("rater_a", "rater_b")
        .agg(F.sum(F.col("c_a") * F.col("c_b")).cast("bigint").alias("dot"))
    )
    out = obs.join(dots, ["rater_a", "rater_b"])
    n_d = F.col("n_items").cast("double")
    p_o = F.col("o").cast("double") / n_d
    p_e = F.col("dot").cast("double") / (n_d * n_d)
    return out.select(
        "rater_a",
        "rater_b",
        "n_items",
        p_o.alias("p_o"),
        p_e.alias("p_e"),
        ((p_o - p_e) / (F.lit(1.0) - p_e)).alias("kappa"),
    )


def fleiss_kappa(
    labels: DataFrame,
    item_col: str = "item_id",
    rater_col: str = "rater",
    label_col: str = "label",
) -> DataFrame:
    """Fleiss' kappa over a complete (every rater labels every item)
    annotation table — the agreement gate preference data must pass
    before it trains anything.

    Entirely integer sufficient statistics: with r_ik = raters putting
    item i in category k, P̄ = (Σ_ik r_ik² − n·r) / (n·r·(r−1)) and
    P_e = Σ_k c_k² / (n·r)² (c_k the category column sums) — both are
    one integer aggregate divided once, so no float accumulates in any
    engine-dependent order.  Returns one row (n_items, n_raters, p_bar,
    p_e, kappa).
    """
    rik = labels.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("r_ik")
    )
    tot = rik.agg(
        F.sum(F.col("r_ik") * F.col("r_ik")).cast("bigint").alias("sum_sq"),
        F.countDistinct(item_col).cast("bigint").alias("n"),
    )
    ck = rik.groupBy(label_col).agg(F.sum("r_ik").cast("bigint").alias("c_k"))
    cksq = ck.agg(
        F.sum(F.col("c_k") * F.col("c_k")).cast("bigint").alias("sum_ck_sq")
    )
    r = labels.agg(
        F.countDistinct(rater_col).cast("bigint").alias("r")
    )
    out = tot.crossJoin(F.broadcast(cksq)).crossJoin(F.broadcast(r))
    nr = F.col("n").cast("double") * F.col("r").cast("double")
    p_bar = (
        F.col("sum_sq").cast("double") - nr
    ) / (nr * (F.col("r").cast("double") - F.lit(1.0)))
    p_e = F.col("sum_ck_sq").cast("double") / (nr * nr)
    return out.select(
        F.col("n").alias("n_items"),
        F.col("r").alias("n_raters"),
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
        ((p_bar - p_e) / (F.lit(1.0) - p_e)).alias("kappa"),
    )


def sprt_pair_decisions(
    comparisons: DataFrame,
    q1: int,
    q0: int,
    qa: int,
    qb: int,
    order_col: str = "doc_id",
    a_col: str = "sys_a",
    b_col: str = "sys_b",
    winner_col: str = "winner",
) -> DataFrame:
    """Wald's SPRT per system pair over the comparison log scanned in
    arrival order — the sequential rung of the preference family
    ("stop collecting, A wins"): per (sys_a, sys_b), the cumulative
    pre-quantized integer log-likelihood ratio (``q1`` on an a-win,
    ``q0`` otherwise — callers compute FLOOR(ln(p1/p0)·2^S) etc. ONCE
    in Python and inline the literals in BOTH engines, the
    ``events_sprt_sequential`` discipline) and the FIRST crossing of
    the Wald boundaries ``qa``/``qb``, all integer arithmetic.

    Returns one row per pair: (sys_a, sys_b, n_comparisons, wins_a,
    decision ∈ accept_h1|accept_h0|continue, crossing_idx,
    crossing_cum_q); crossing_idx = −1 when the log never crosses.

    Shape: one projection + one per-pair ordered window (shuffle on the
    pair key) + a 2-struct-min reduce.  This is the event-level AUDIT
    form — each pair's history sorts within one partition, fine for the
    bounded pair×history sizes an offline audit reads.  The SERVING
    form at 100 TB is :func:`streaming.preference_stream.
    sprt_monitor_from_stats`: the identical integer fold over per-batch
    sufficient statistics (O(batches·pairs) rows, no event-level sort
    anywhere) — batch increments are exact because every event
    contributes the same two possible literals.
    """
    terms = comparisons.select(
        F.col(a_col).cast("bigint").alias("sys_a"),
        F.col(b_col).cast("bigint").alias("sys_b"),
        F.col(order_col).alias("_ord"),
        F.when(F.col(winner_col) == F.col(a_col), 1).otherwise(0).alias("x"),
        F.when(F.col(winner_col) == F.col(a_col), F.lit(q1))
        .otherwise(F.lit(q0))
        .cast("bigint")
        .alias("term_q"),
    )
    w = W.partitionBy("sys_a", "sys_b").orderBy("_ord")
    cum = terms.select(
        "sys_a",
        "sys_b",
        "x",
        F.sum("term_q").over(w).cast("bigint").alias("cum_q"),
        F.row_number().over(w).cast("bigint").alias("idx"),
    )
    crossing = (
        cum.filter((F.col("cum_q") >= qa) | (F.col("cum_q") <= qb))
        .groupBy("sys_a", "sys_b")
        .agg(F.min(F.struct("idx", "cum_q")).alias("c"))
        .select(
            "sys_a",
            "sys_b",
            F.col("c.idx").alias("crossing_idx"),
            F.col("c.cum_q").alias("crossing_cum_q"),
        )
    )
    tot = cum.groupBy("sys_a", "sys_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_comparisons"),
        F.sum("x").cast("bigint").alias("wins_a"),
    )
    return tot.join(F.broadcast(crossing), ["sys_a", "sys_b"], "left").select(
        "sys_a",
        "sys_b",
        "n_comparisons",
        "wins_a",
        F.when(F.col("crossing_cum_q") >= qa, F.lit("accept_h1"))
        .when(F.col("crossing_cum_q") <= qb, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
        F.coalesce(F.col("crossing_idx"), F.lit(-1)).cast("bigint").alias(
            "crossing_idx"
        ),
        F.coalesce(F.col("crossing_cum_q"), F.lit(0)).cast("bigint").alias(
            "crossing_cum_q"
        ),
    )


def group_relative_advantage(
    rewards: DataFrame,
    group_col: str = "prompt_id",
    reward_q_col: str = "reward_q",
) -> DataFrame:
    """Group-relative advantage baselines — the GRPO data-prep op
    (Shao et al., 'DeepSeekMath: ... Group Relative Policy
    Optimization'): per prompt, G sampled completions' rewards are
    normalized against the GROUP's own mean and std,
    ``adv_i = (r_i − mean(r)) / std(r)`` — the critic-free baseline a
    preference/RL pipeline materializes for every training prompt.

    Determinism contract: rewards arrive QUANTIZED (bigint, e.g.
    FLOOR(r·2^20)) so the group sum is exact integer arithmetic;
    centering uses ``d_i = G·rq_i − Σrq`` (exact), the variance
    numerator ``Σd²`` is exact, and the advantage is computed from
    those two integers in doubles — ``d_i · sqrt(G) / sqrt(Σd²)``
    (algebraically (r_i−μ)/σ with σ the population std) — one sqrt and
    one division per row, bit-reproducible cross-engine.  A
    zero-variance group (all rewards equal) gets advantage 0.

    Scale shape: one hash aggregation per group (G-bounded) broadcast
    back onto the sample rows — O(rows), no window over the corpus.
    Returns the input keys plus (d_num, adv_q = FLOOR(adv·2^20))."""
    g = rewards.groupBy(group_col).agg(
        F.sum(reward_q_col).cast("bigint").alias("_s"),
        F.count(F.lit(1)).cast("bigint").alias("_g"),
    )
    centered = rewards.join(F.broadcast(g), group_col).withColumn(
        "d_num",
        (F.col("_g") * F.col(reward_q_col) - F.col("_s")).cast("bigint"),
    )
    var = centered.groupBy(group_col).agg(
        F.sum(F.col("d_num") * F.col("d_num")).cast("bigint").alias("_v")
    )
    return (
        centered.join(F.broadcast(var), group_col)
        .withColumn(
            "adv_q",
            F.when(F.col("_v") == 0, F.lit(0).cast("bigint")).otherwise(
                F.floor(
                    F.col("d_num").cast("double")
                    * F.sqrt(F.col("_g").cast("double"))
                    / F.sqrt(F.col("_v").cast("double"))
                    * F.lit(1048576.0)
                ).cast("bigint")
            ),
        )
        .drop("_s", "_g", "_v")
    )
