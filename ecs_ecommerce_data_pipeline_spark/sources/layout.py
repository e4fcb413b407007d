"""Sort-clustered layout writer + small-file compaction: the data-skipping
and file-count levers of the write path.

The reference's write path is row-at-a-time DynamoDB ``put_item`` loops
(reference ``ecs/transformation/transform_task.py:295-303,330-339``) — no
file layout exists to tune. At 100 TB the layout IS the read cost: a
parquet scan can skip a row group (or a whole file) only when the footer
min/max for the filtered column excludes the predicate range, and those
stats are only tight when the data arrives sorted.

``write_clustered`` makes the stats tight: a range repartition on the
cluster columns (sampled range boundaries → each output file owns a
disjoint key range) followed by an intra-partition sort (so every row
group within each file is tight too). A point or range predicate on the
cluster column then touches ~1 file instead of all of them — the
precondition for parquet data skipping, verified in
``tests/test_layout.py`` by reading the footers back with pyarrow and
asserting the per-file ranges are pairwise disjoint.

Cluster posture:

* ``repartitionByRange`` samples the cluster column to pick balanced
  boundaries (reservoir sample, driver-side boundary list only — the
  data never collects), so skew in the cluster key yields balanced files
  anyway — unlike hash bucketing, which needs a salt for hot keys.
* one shuffle, amortized into the write; every later scan that filters
  on the cluster column pays proportionally less. Multi-column
  clustering is lexicographic (major → minor): filters on the major
  column skip files; filters on minor columns skip row groups within
  the files they touch. (True multi-dimensional interleaving — Z/Hilbert
  order — trades per-column tightness for all-column mediocrity; the
  lexicographic default is right when one column dominates filters.)
* ``compact`` fixes the other failure mode — thousands of tiny files
  from incremental appends (task scheduling + footer overhead dominate
  below ~100 MB/file). It re-reads and rewrites a partition at a target
  file count, preserving the cluster order when asked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    files: int = 8,
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``:
    ``files`` output files with pairwise-disjoint lexicographic key
    ranges, rows sorted within each file."""
    (
        df.repartitionByRange(files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_expr(
    ranks: list[Column], bits: int = 8
) -> Column:
    """Interleave the low ``bits`` bits of per-column rank codes into one
    Z-value (Morton code) — bit ``b`` of column ``c`` lands at position
    ``b*ncols + c``. Pure shift/and/or Column arithmetic: JVM-side,
    codegen'd, no UDF."""
    ncols = len(ranks)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for c, r in enumerate(ranks):
            bit = F.shiftright(r.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ncols + c))
    return z


def quantile_rank(col_name: str, boundaries: list[float]) -> Column:
    """Rank of a value among precomputed quantile boundaries: the count
    of boundaries ≤ value. The boundary list is a tiny driver-side
    constant folded into the plan (like a broadcast of ~2^bits doubles);
    the rank itself is a row-local array filter — map-only."""
    bnds = F.lit(boundaries)
    v = F.col(col_name).cast("double")
    return F.size(F.filter(bnds, lambda b: b <= v))


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` parquet clustered on the **Z-order** (Morton
    interleaving) of ``cluster_cols`` — the multi-dimensional complement
    of ``write_clustered``.

    Lexicographic clustering makes file ranges tight on the major column
    and useless on the others; Z-order quantizes every column to a
    ``2^bits``-level quantile rank and interleaves the bits, so each
    file covers a small hyper-rectangle — footer min/max stay tight on
    EVERY cluster column and a predicate on any of them skips most
    files. The trade: per-column ranges are ~k-th-root-tight rather than
    exactly tight, so prefer ``write_clustered`` when one column
    dominates the workload's filters.

    Cost shape at scale: one ``approxQuantile`` pass per column to learn
    boundaries (aggregate tree, driver receives only ~2^bits doubles per
    column), then the same single range-shuffle-plus-sort as
    ``write_clustered``. Columns must be numeric/castable to double
    (dates: cast to epoch first).
    """
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    ranks = [
        quantile_rank(c, df.approxQuantile(c, probs, 0.001))
        for c in cluster_cols
    ]
    (
        df.withColumn("_z", zorder_expr(ranks, bits))
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    path: str,
    files: int,
    cluster_cols: list[str] | None = None,
) -> None:
    """Rewrite ``path`` at ``files`` output files (small-file
    compaction). With ``cluster_cols`` the rewrite re-clusters (range
    repartition + sort); without, a plain ``coalesce`` — no shuffle at
    all, partitions merge where they sit."""
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + "__compact_staging"
    if cluster_cols:
        out = df.repartitionByRange(files, *cluster_cols).sortWithinPartitions(
            *cluster_cols
        )
    else:
        out = df.coalesce(files)
    out.write.mode("overwrite").parquet(staging)
    # Atomic-enough swap for a filesystem path; on object stores this is
    # the ledger's job (plans/incremental.BatchLedger gates the rename).
    import shutil

    shutil.rmtree(path)
    shutil.move(staging, path)


def file_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) of ``column`` read from the parquet footers —
    the stats the scan's data-skipping consults. Test/inspection helper;
    metadata-only, never touches row data."""
    import os

    import pyarrow.parquet as pq

    ranges = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = md.schema.names.index(column)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                los.append(st.min)
                his.append(st.max)
        if los:
            ranges.append((min(los), max(his)))
    return ranges
