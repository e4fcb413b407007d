"""Declarative data-quality expectations, evaluated in ONE aggregate pass.

Generalizes the reference validation stage (required-column and
null-count checks plus referential integrity,
``ecs/validation/validate_task.py:153-207``) into a rule suite a user
declares against any DataFrame:

* ``not_null(col)``       — no missing values;
* ``unique(col)``         — no duplicate (non-null) values;
* ``in_set(col, vals)``   — domain membership;
* ``between(col, lo, hi)``— closed range;
* ``matches(col, regex)`` — format check (keep patterns in the
  Java-regex ∩ RE2 ∩ POSIX subset if an external engine must agree);
* ``satisfies(name, cond)`` — arbitrary boolean Column escape hatch.

Scale shape: every rule compiles to an aggregate expression over the
same scan, so N rules cost one pass over the data and one 1-row
partial-merge — no per-rule jobs, no driver-side row inspection. The
result is a tidy (rule, rows_checked, violations, passed) table; gate
batches on ``passed`` exactly like the reference's reject path
(engine twin: ``operators/validation.py`` quarantine).

NULL semantics: a NULL never *passes* a row-level rule except
``not_null``'s complement — i.e. row rules count ``NOT coalesce(cond,
false)`` as a violation, matching SQL's WHERE-clause treatment of
unknown.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declarative rule: ``violations`` is an aggregate expression
    counting offending rows (or values, for uniqueness)."""

    name: str
    violations: Column


def _row_rule(name: str, cond: Column) -> Expectation:
    bad = F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
    return Expectation(name, F.sum(bad).cast("bigint"))


def not_null(col: str) -> Expectation:
    return _row_rule(f"not_null_{col}", F.col(col).isNotNull())


def unique(col: str) -> Expectation:
    """Duplicate count among non-null values: COUNT(col) − COUNT(DISTINCT col)."""
    return Expectation(
        f"unique_{col}",
        (F.count(col) - F.countDistinct(col)).cast("bigint"),
    )


def in_set(col: str, values: list) -> Expectation:
    return _row_rule(f"in_set_{col}", F.col(col).isin(values))


def between(col: str, lo, hi) -> Expectation:
    return _row_rule(f"between_{col}", F.col(col).between(F.lit(lo), F.lit(hi)))


def matches(col: str, pattern: str) -> Expectation:
    return _row_rule(f"matches_{col}", F.col(col).rlike(pattern))


def satisfies(name: str, cond: Column) -> Expectation:
    return _row_rule(name, cond)


def check(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Evaluate every rule in one aggregation over one scan.

    Returns (rule, rows_checked, violations, passed) — one row per rule.
    The single wide agg produces a 1-row frame; exploding it to tidy
    long format is O(#rules), driver-free.
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_rows")] + [
        r.violations.alias(f"_v{i}") for i, r in enumerate(rules)
    ]
    wide = df.agg(*aggs)
    entries = F.array(*[
        F.struct(
            F.lit(r.name).alias("rule"),
            F.col(f"_v{i}").alias("violations"),
        )
        for i, r in enumerate(rules)
    ])
    return (
        wide.select(F.col("_rows"), F.explode(entries).alias("e"))
        .select(
            F.col("e.rule").alias("rule"),
            F.col("_rows").alias("rows_checked"),
            F.col("e.violations").alias("violations"),
            (F.col("e.violations") == 0).alias("passed"),
        )
    )
