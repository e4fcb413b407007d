"""Count-min sketch: fixed-memory frequency estimation at 100 TB.

Exact per-key counts need a shuffle keyed by every distinct value; a
count-min sketch needs ``depth × width`` integers TOTAL, regardless of
cardinality — the right tool for "how often does X occur" over
billion-key streams (frequencies, heavy hitters, join-size estimation).

Engine shape: bucket counts are ONE map-side-combinable aggregation on
(depth, bucket) — the shuffle carries at most ``depth × width`` rows per
map partition, never the raw keys. Estimates join the (tiny, broadcast)
sketch. The depth-explode amplifies scan rows ×depth before the partial
agg absorbs them; a custom Arrow combiner could fold that into one pass,
but the explode form stays whole-stage-codegen'd and the partial agg
already bounds the shuffle.

Determinism: hashes are md5-derived (``h_j(x) = md5(j:x) mod width``) —
the DuckDB oracle rebuilds the ENTIRE sketch bit-for-bit, so estimates
are hash-checked, not bounds-assumed (unlike the engine-internal HLL /
t-digest sketches, which get error-bound gates instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import md5_bigint


def _bucket(j: F.Column, key: F.Column, width: int) -> F.Column:
    return md5_bigint(F.concat_ws(":", j.cast("string"), key)) % width


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """(j, bucket, c) bucket-count table of the count-min sketch —
    ``depth × width`` rows max, independent of input cardinality.

    NULL keys are EXCLUDED (a null has no frequency identity; this also
    matches the oracle's ``j || ':' || k`` formula, where a null key
    nulls the hash — whereas ``concat_ws`` would silently fold nulls
    into the literal key ``''``)."""
    k = F.col(key_col).cast("string")
    rows = df.filter(k.isNotNull()).select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
        k.alias("k"),
    )
    return (
        rows.select("j", _bucket(F.col("j"), F.col("k"), width).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """min-over-depth estimate for each row of ``keys`` → (key_col,
    cms_est). The sketch is broadcast (≤ depth·width rows).

    LEFT join + per-row coalesce-to-0: a probe key hitting an EMPTY
    bucket (absent from the sparse bucket table) must contribute 0 to
    the min — an inner join would drop never-seen keys entirely and
    over-estimate partially-absent ones."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    ).select(
        key_col,
        "j",
        _bucket(F.col("j"), F.col(key_col).cast("string"), width).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )


def cms_join_size(
    sketch_a: DataFrame, sketch_b: DataFrame
) -> DataFrame:
    """Equi-join cardinality estimate from two CMS sketches over the join
    key: per depth row j, Σ_bucket cntA·cntB over-estimates |A ⨝ B|
    (collisions only add); min over depths tightens it. 1-row output.

    This is how an optimizer sizes a join without touching the data —
    both sketches are depth×width integers, mergeable across partitions
    and across TIME (today's sketch + yesterday's sketch add up).
    """
    prod = (
        sketch_a.alias("a")
        .join(
            sketch_b.alias("b"),
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(F.col("a.j").alias("j"), (F.col("a.c") * F.col("b.c")).alias("p"))
    )
    return (
        prod.groupBy("j")
        .agg(F.sum("p").alias("dot"))
        .agg(F.min("dot").cast("bigint").alias("est_join_size"))
    )


# --- mergeable binned-quantile state ---------------------------------------

def quantile_bin_state(
    df: DataFrame,
    value_col: str,
    stats: DataFrame,
    n_bins: int = 64,
) -> DataFrame:
    """Per-batch mergeable quantile state: equal-width bin counts of
    ``value_col`` against broadcast (vmin, vmax) ``stats``.

    The incremental-percentile counterpart of the HLL distinct state:
    exact percentiles need the full value multiset per recompute, but a
    binned histogram is ≤ ``n_bins`` BIGINT rows per batch, merging is
    a count sum (associative, any grouping), and the estimate error is
    bounded by one bin width. At 100 TB the (vmin, vmax) frame comes
    from table statistics or a prior batch — here one tiny agg.

    Returns (bin, c); NULL values are excluded (no percentile identity).
    """
    v = F.col(value_col).cast("double")
    width = (F.col("_qvmax") - F.col("_qvmin")) / F.lit(float(n_bins))
    bin_id = F.when(F.col("_qvmax") == F.col("_qvmin"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.floor((v - F.col("_qvmin")) / width).cast("int"),
        )
    )
    return (
        df.filter(v.isNotNull())
        .crossJoin(F.broadcast(stats))
        .select(bin_id.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def quantile_value_stats(df: DataFrame, value_col: str) -> DataFrame:
    """One-row (vmin, vmax) frame driving the equal-width binning."""
    v = F.col(value_col).cast("double")
    return df.filter(v.isNotNull()).agg(
        F.min(v).alias("_qvmin"), F.max(v).alias("_qvmax")
    )


def quantile_from_bins(
    merged: DataFrame,
    stats: DataFrame,
    qs: list[float],
    n_bins: int = 64,
) -> DataFrame:
    """Estimate quantiles from MERGED bin counts: for each q, walk the
    cumulative histogram to the bin containing rank ceil(q·N) and
    interpolate within it. The window runs over ≤ ``n_bins`` rows — a
    bounded input, never corpus-sized.

    Returns (q, est) with |est − exact| ≤ one bin width by construction.
    """
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        merged.withColumn("cum", F.sum("c").over(w))
        .withColumn("cum_prev", F.col("cum") - F.col("c"))
        .crossJoin(F.broadcast(stats))
        .crossJoin(
            F.broadcast(
                merged.agg(F.sum("c").cast("bigint").alias("_qn"))
            )
        )
    )
    width = (F.col("_qvmax") - F.col("_qvmin")) / F.lit(float(n_bins))
    # ONE plan for all quantiles: cross the (≤n_bins)-row cumulative
    # histogram with the quantile list and keep the bracketing bin per q
    # — a per-q union would recompute the merged state |qs| times
    qdf = merged.sparkSession.createDataFrame([(q,) for q in qs], "q double")
    target = F.ceil(F.col("q") * F.col("_qn")).cast("bigint")
    return (
        cum.crossJoin(F.broadcast(qdf))
        .filter((F.col("cum") >= target) & (F.col("cum_prev") < target))
        .select(
            "q",
            (
                F.col("_qvmin")
                + width
                * (
                    F.col("bin").cast("double")
                    + (target - F.col("cum_prev")).cast("double")
                    / F.col("c").cast("double")
                )
            ).alias("est"),
        )
    )


# --- Bloom filter membership ------------------------------------------------


def _bloom_pos(i: F.Column, key: F.Column, m: int) -> F.Column:
    """Bit position of hash function ``i`` for ``key``: 60-bit md5 of
    ``'bf' || i || ':' || key`` mod ``m`` — the same portable-hash idiom
    as the CMS buckets, so a foreign engine rebuilds the filter
    bit-for-bit."""
    return (
        md5_bigint(
            F.concat(
                F.lit("bf"), i.cast("string"), F.lit(":"), key.cast("string")
            )
        )
        % m
    )


def bloom_bits(
    df: DataFrame, key_col: str, k: int = 4, m: int = 65536
) -> DataFrame:
    """(pos) — the DISTINCT set bit positions of a Bloom filter over the
    key column: ``m`` bits of state TOTAL regardless of how many keys go
    in, and mergeable (union of position sets == filter of the union).

    This is the membership twin of the CMS frequency sketch: exact
    membership needs every distinct key shuffled somewhere; the Bloom
    filter needs ≤ ``m`` rows, answers "definitely absent / probably
    present", and NEVER false-negatives — the property the test suite
    pins. NULL keys are excluded (no membership identity).

    Shape: one explode (×k) over the key stream → one distinct on an
    integer ≤ ``m`` — map-side-combinable, shuffle bounded by ``m``
    rows per map partition."""
    key = F.col(key_col)
    rows = df.filter(key.isNotNull()).select(
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
        key.alias("key"),
    )
    return rows.select(
        _bloom_pos(F.col("i"), F.col("key"), m).alias("pos")
    ).distinct()


def bloom_probe(
    bits: DataFrame, probes: DataFrame, key_col: str, k: int = 4,
    m: int = 65536,
) -> DataFrame:
    """(key_col, bloom_member) — probe each key against the filter:
    member iff ALL ``k`` positions are set.

    The bit table is broadcast (≤ ``m`` rows); the probe stream never
    shuffles — per key it explodes its ``k`` positions, left-joins the
    broadcast bits, and counts hits (a per-key agg on the probe's own
    key, map-side combinable)."""
    marked = bits.withColumn("_hit", F.lit(1))
    ppos = probes.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
    ).select(
        key_col,
        _bloom_pos(F.col("i"), F.col(key_col), m).alias("pos"),
    )
    # member iff NO probed position missed — counting hits == k would
    # false-negative a key that appears more than once in the probe
    # frame (2k hit rows), violating the never-false-negative guarantee.
    # NULL probe keys still report false (no membership identity — their
    # positions are NULL, the join misses, and the miss count is k).
    return (
        ppos.join(F.broadcast(marked), "pos", "left")
        .groupBy(key_col)
        .agg(
            (F.count(F.when(F.col("_hit").isNull(), 1)) == 0).alias(
                "bloom_member"
            )
        )
    )
