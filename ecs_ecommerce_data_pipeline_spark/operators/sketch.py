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
