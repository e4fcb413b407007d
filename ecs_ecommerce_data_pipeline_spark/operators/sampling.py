"""Deterministic sampling, dataset splitting, and token-budget shard
packing — the reproducibility operators of a training-data pipeline.

The reference has no sampling surface at all beyond a row-limit probe
(reference ``ecs/validation/validate_task.py:28,131`` — ``nrows=100``
sample reads, and even those are effectively disabled, SURVEY §2.8 Q1).
A corpus pipeline needs more: train/val/test membership must be a pure
function of the record key (stable under reruns, re-partitioning, and
data growth — a doc never migrates between splits when the corpus
doubles), samples must be reproducible without materializing a seed
table, and training shards must pack to a token budget without a
driver-side loop.

Scale posture (100 TB):

* ``assign_split`` / ``hash_sample`` are **map-only** — a row-local md5
  over the key, no shuffle, no state, trivially parallel at any width.
  This is why the hash is md5 and not ``rand(seed)``: ``rand`` is
  partitioning-dependent (seed is per-partition), so the same row lands
  in different splits under AQE re-planning; md5-of-key is not.
* ``stratified_sample`` shuffles once on the stratum key (the window
  partition). Hot strata are bounded by the per-stratum output cap, but
  the *input* window still sorts each stratum; for a stratum that is
  most of the corpus, cap its sort width by pre-filtering on
  ``hash_bucket < ~2×fraction`` before ranking (noted inline).
* ``pack_shards`` packs per ``part_col`` group with a running-sum
  window — parallelism = number of groups. A global pack (one group)
  would serialize; partition the pack by a coarse key (source, date,
  language) so each group's window sorts independently.

Cross-engine determinism: every hash routes through
``functions.textfn.md5_bigint`` (md5 hex → BIGINT), reproducible in the
DuckDB oracle as ``('0x' || substr(md5(x),1,15))::BIGINT`` — never
Spark's murmur ``hash()``/``xxhash64``/``rand``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textfn import md5_bigint


def hash_bucket(key: str | Column, buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in ``[0, buckets)`` from md5 of the key.

    ``salt`` derives independent bucketings from the same key (e.g. one
    for splitting, one for sampling) — concatenated into the hashed
    string, so DuckDB reproduces it as
    ``('0x' || substr(md5(salt || CAST(k AS VARCHAR)), 1, 15))::BIGINT % buckets``.
    """
    c = F.col(key) if isinstance(key, str) else key
    return md5_bigint(F.concat(F.lit(salt), c.cast("string"))) % buckets


def assign_split(
    df: DataFrame,
    key: str,
    splits: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split by
    hash-bucket range. ``splits`` maps name → percent (must sum to 100);
    default 90/5/5 train/val/test.

    Membership is a pure function of ``key`` — stable under reruns,
    repartitioning, and corpus growth. Map-only: no shuffle.
    """
    splits = splits or {"train": 90, "val": 5, "test": 5}
    if sum(splits.values()) != 100:
        raise ValueError(f"split percents must sum to 100: {splits}")
    b = hash_bucket(key, 100, salt=salt)
    expr: Column | None = None
    lo = 0
    for name, pct in splits.items():
        cond = (b >= lo) & (b < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket
    (out of 1e6) falls below the cutoff. Map-only; the same rows are
    kept on every run and on any cluster layout."""
    cutoff = int(fraction * 1_000_000)
    return df.filter(hash_bucket(key, 1_000_000, salt=salt) < cutoff)


def stratified_sample(
    df: DataFrame,
    stratum: str,
    key: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Exact per-stratum sample: ``ceil(fraction × n)`` rows from every
    stratum, chosen by hash rank (deterministic, seedless).

    One shuffle on ``stratum``; each stratum sorts by hash rank inside
    its window. For a stratum that dominates the corpus, pre-filter with
    ``hash_sample(df, key, 2*fraction)`` first to bound the sort — the
    rank of the survivors is unchanged (md5 order is preserved under
    filtering), so the top-``ceil(f·n)`` set is identical as long as the
    pre-filter keeps at least that many rows per stratum.
    """
    h = hash_bucket(key, 1_000_000_000, salt=salt)
    w = Window.partitionBy(stratum).orderBy(h, F.col(key))
    wn = Window.partitionBy(stratum)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .filter(F.col("_rk") <= F.ceil(F.col("_n") * F.lit(fraction)))
        .drop("_rk", "_n")
    )


def pack_shards(
    df: DataFrame,
    part_col: str,
    order_col: str,
    cost_col: str | Column,
    budget: int,
) -> DataFrame:
    """Streaming shard packing: within each ``part_col`` group, walk rows
    in ``order_col`` order and assign ``shard_id = floor(exclusive-
    prefix-sum(cost) / budget)`` — consecutive rows fill a shard until
    the budget spills into the next one (a shard may overshoot by at
    most one row's cost, the standard greedy-streaming bound).

    Expressed as one running-sum window per group — no driver loop, no
    collect; parallelism = number of groups, so pick ``part_col`` at
    least as wide as the cluster (source, date, lang-bucket…).
    """
    cost = F.col(cost_col) if isinstance(cost_col, str) else cost_col
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix_incl = F.sum(cost).over(w)
    return df.withColumn(
        "shard_id", F.floor((prefix_incl - cost) / F.lit(budget)).cast("bigint")
    )


def pack_token_budget(
    df: DataFrame,
    part_col: str,
    token_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """Deterministic token-budget sequence packing (next-fit-decreasing):
    within each ``part_col`` group, documents are walked in
    (``token_col`` DESC, ``id_col``) order and greedily packed into bins
    of capacity ``budget`` — the step that turns a curated corpus into
    fixed-token-budget training sequences.

    Semantics (the exact per-row recurrence both engines implement):
    ``fill + t > budget  →  bin += 1, fill = t``, else ``fill += t``.
    Consequences: no bin ever exceeds the budget EXCEPT a bin holding a
    single oversized document (t > budget), which sits alone and is
    flagged by the caller via ``bin_tokens > budget``; every document is
    packed exactly once; decreasing order gives the classical NFD
    packing quality without bin-state joins.

    Scale shape: one shuffle (repartition by group) + an in-partition
    sort; the fold itself is a numpy kernel vectorized PER BIN
    (``searchsorted`` over the monotone token cumsum — same idiom as the
    settle fold in ``balance_q``), with dict-free carry across Arrow
    batch boundaries.  Parallelism = number of groups; pick ``part_col``
    at least cluster-wide (source, lang, date…).

    Returns the input ids with (bin_id, n_tokens) per row.
    """
    import numpy as np
    import pandas as pd

    budget_i = int(budget)

    def pack_partitions(batches):
        carry_part = None
        carry_bin = 0
        carry_fill = 0

        def pack_segment(t: "np.ndarray", b0: int, f0: int):
            """NFD fold of one group's desc-sorted token counts starting
            from (bin b0, fill f0).  Vectorized per bin: each bin
            boundary is one searchsorted over the monotone cumsum."""
            n = len(t)
            bins = np.empty(n, dtype=np.int64)
            csum = np.cumsum(t)
            b, base, pos = b0, -f0, 0
            fresh = f0 == 0
            while pos < n:
                j = int(np.searchsorted(csum, base + budget_i, side="right"))
                if j == pos:
                    if not fresh:
                        # doesn't fit the carried bin — open a new one
                        b += 1
                        base = int(csum[pos]) - int(t[pos])
                        fresh = True
                        continue
                    # oversized document: its own (flagged) bin
                    bins[pos] = b
                    base = int(csum[pos])
                    pos += 1
                    b += 1
                    continue
                bins[pos:j] = b
                pos = j
                fresh = False
                if pos < n:
                    b += 1
                    base = int(csum[pos - 1])
                    fresh = True
            return bins, b, int(csum[-1]) - base

        for pdf in batches:
            if len(pdf) == 0:
                continue
            parts = pdf["_part"].to_numpy()
            toks = pdf["_tok"].to_numpy()
            ids = pdf["_id"].to_numpy()
            bins_out = np.empty(len(parts), dtype=np.int64)
            starts = np.flatnonzero(
                np.concatenate(([True], parts[1:] != parts[:-1]))
            )
            ends = np.concatenate((starts[1:], [len(parts)]))
            for s, e in zip(starts, ends):
                part = parts[s]
                if part == carry_part:
                    b0, f0 = carry_bin, carry_fill
                else:
                    b0, f0 = 0, 0
                seg_bins, carry_bin, carry_fill = pack_segment(
                    toks[s:e], b0, f0
                )
                bins_out[s:e] = seg_bins
                carry_part = part
            yield pd.DataFrame(
                {
                    "_part": parts,
                    "_id": ids,
                    "n_tokens": toks,
                    "bin_id": bins_out,
                }
            )

    # cast the pass-through columns to the DECLARED kernel schema: the
    # mapInPandas output schema below is fixed (string part, bigint id),
    # so an int/date part or string id would otherwise hit an Arrow
    # schema mismatch at runtime despite the generic signature
    prepared = df.select(
        F.col(part_col).cast("string").alias("_part"),
        F.col(id_col).cast("bigint").alias("_id"),
        F.col(token_col).cast("bigint").alias("_tok"),
    )
    out_schema = (
        "_part string, _id bigint, n_tokens bigint, bin_id bigint"
    )
    return (
        prepared.repartition("_part")
        .sortWithinPartitions("_part", F.desc("_tok"), F.asc("_id"))
        .mapInPandas(pack_partitions, out_schema)
        .select(
            F.col("_part").alias(part_col),
            F.col("_id").alias(id_col),
            "n_tokens",
            "bin_id",
        )
    )


def weighted_sample(
    df: DataFrame, key: str, weight: Column, salt: str = ""
) -> DataFrame:
    """Poisson sampling with per-row inclusion probability
    ``clamp(weight, 0, 1)`` — the curation primitive for quality- or
    length-proportional downsampling ("keep high-quality documents with
    higher probability").

    Include a row iff its md5 u01 draw falls below the row's own weight:
    deterministic (a pure function of ``key``+``salt``), map-only, and
    monotone in the weight — raising a document's quality score can only
    add it to the sample, never evict others. Expected sample size =
    Σ weights; the draw is reproducible in any engine via the md5 idiom
    above.
    """
    b = hash_bucket(key, 1_000_000, salt=salt)
    p = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0))
    return df.filter(b < p * F.lit(1_000_000))


def weighted_sample_exact_k(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    stratum: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Exact-k weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): rank rows by ``u^(1/w)`` descending — equivalently
    ``ln(u)/w`` — where ``u`` is the row's deterministic md5 uniform,
    and keep the top k (per stratum when given).

    ``weighted_sample`` (Poisson) gives each row an independent
    inclusion draw — sample size varies; A-ES pins the size exactly
    while keeping inclusion probability monotone in the weight, and
    stays one window over a map-computed key: no iteration, no
    rejection loop.

    Portability: the ES key is quantized ``floor(ln(u)/w · 2^20)``.
    Coarse on purpose: a last-ulp cross-engine ``ln`` difference
    (|error| ~1e-16) flips a quantized bin only when the value lands
    within the error of a bin edge — probability ~1e-10 per row at this
    quantum (at 2^40 it would be ~1e-4 per row: a real hash-parity
    hazard on a large corpus). Collisions the coarseness creates break
    deterministically on the row key, identically in both engines. Rows
    with non-positive weight are excluded (ES is undefined there).
    """
    u = (md5_bigint(F.concat(F.lit(salt), F.col(key).cast("string"))) + 1).cast(
        "double"
    ) / F.lit(float(2**60))
    w = F.col(weight_col).cast("double")
    es_q = F.floor(F.log(u) / w * F.lit(float(2**20))).cast("bigint")
    part = [stratum] if stratum else []
    win = Window.partitionBy(*part).orderBy(F.desc("es_q"), F.asc(key))
    return (
        df.filter(w > 0)
        .withColumn("es_q", es_q)
        .withColumn("rnk", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rnk") <= k)
    )
