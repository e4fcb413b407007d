"""Data-quality expectation-suite queries.

The engine twin of "Great Expectations"-style declarative validation,
built on ``operators.expectations`` — the generalization of the
reference's hardcoded checks (``ecs/validation/validate_task.py:153-207``:
required columns, null counts, referential integrity) into a rule
catalog evaluated in one aggregate pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators import expectations as X
from ..sources.testdata import load_table

_DQ_ORDERS_SQL = """
WITH base AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS rows_checked,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS v_not_null,
           CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
               AS v_unique,
           CAST(SUM(CASE WHEN NOT COALESCE(o_totalprice BETWEEN 0 AND 200000, FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_between,
           CAST(SUM(CASE WHEN NOT COALESCE(o_orderstatus IN ('F','O','P'), FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_in_set,
           CAST(SUM(CASE WHEN NOT COALESCE(regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+$'), FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_matches,
           CAST(SUM(CASE WHEN NOT COALESCE(o_orderdate BETWEEN TIMESTAMP '1992-01-01'
                         AND TIMESTAMP '1998-12-31', FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_daterange
    FROM orders
)
SELECT 'not_null_o_custkey' AS rule, rows_checked, v_not_null AS violations,
       v_not_null = 0 AS passed FROM base
UNION ALL
SELECT 'unique_o_orderkey', rows_checked, v_unique, v_unique = 0 FROM base
UNION ALL
SELECT 'between_o_totalprice', rows_checked, v_between, v_between = 0 FROM base
UNION ALL
SELECT 'in_set_o_orderstatus', rows_checked, v_in_set, v_in_set = 0 FROM base
UNION ALL
SELECT 'matches_o_orderpriority', rows_checked, v_matches, v_matches = 0 FROM base
UNION ALL
SELECT 'orderdate_in_range', rows_checked, v_daterange, v_daterange = 0 FROM base
"""


@register("dq_expectations", _DQ_ORDERS_SQL)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-rule expectation suite over orders — nullability, uniqueness,
    range, domain, format, and date-window checks, all from one scan.
    ``between_o_totalprice`` is a deliberate outlier probe (large orders
    violate it), showing a failing rule reports rather than errors.
    """
    orders = load_table(spark, sf_dir, "orders")
    rules = [
        X.not_null("o_custkey"),
        X.unique("o_orderkey"),
        X.between("o_totalprice", 0, 200000),
        X.in_set("o_orderstatus", ["F", "O", "P"]),
        X.matches("o_orderpriority", "^[1-5]-[A-Z]+$"),
        X.satisfies(
            "orderdate_in_range",
            F.col("o_orderdate").between("1992-01-01", "1998-12-31"),
        ),
    ]
    return X.check(orders, rules)


# --- Benford first-digit audit ----------------------------------------------

# log10(1 + 1/d) written as identical decimal literals on both sides (a
# runtime log10 could differ in the last ulp between engines).
_BENFORD = {
    1: "0.3010299956639812",
    2: "0.17609125905568124",
    3: "0.12493873660829992",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}

_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN {d} THEN {lit}" for d, lit in _BENFORD.items()
) + " END"

_BENFORD_SQL = f"""
WITH d AS (
    SELECT CAST(regexp_extract(
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
               '([1-9])', 1) AS INTEGER) AS digit
    FROM orders
    WHERE o_totalprice > 0
),
c AS (
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
SELECT digit, n,
       CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
       {_BENFORD_CASE_SQL} AS benford_expected,
       abs(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
           - {_BENFORD_CASE_SQL}) AS abs_dev
FROM c, t
"""


@register("dq_benford_first_digit", _BENFORD_SQL)
def q_dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: the observed first-
    significant-digit distribution against log10(1 + 1/d), the
    fabricated-data / unit-mixing screen every financial DQ suite
    carries. The digit comes from the DECIMAL(18,2) string rendering
    (exact and identical on both engines), NOT floor(x/10^floor(log10 x))
    — a last-ulp log10 difference at a power-of-ten boundary would flip
    a digit.

    Scale shape: map-only digit extraction, one hash agg to ≤9 rows,
    broadcast 1-row total back — the scan never shuffles data rows."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.filter(F.col("o_totalprice") > 0).select(
        F.regexp_extract(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
            r"([1-9])",
            1,
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    total = c.agg(F.sum("n").cast("bigint").alias("total"))
    expected = F.lit(None).cast("double")
    for dig, lit in reversed(_BENFORD.items()):
        expected = F.when(
            F.col("digit") == dig, F.expr(lit + "D")
        ).otherwise(expected)
    share = F.col("n").cast("double") / F.col("total").cast("double")
    return c.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        share.alias("share"),
        expected.alias("benford_expected"),
        F.abs(share - expected).alias("abs_dev"),
    )


# --- join-key skew report ----------------------------------------------------

_SKEW_KEYS = [
    ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("events", "user_id"),
]


def _skew_sql() -> str:
    parts = []
    for table, key in _SKEW_KEYS:
        parts.append(f"""
SELECT '{table}.{key}' AS keyed,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST((max(struct_pack(c := n, k := k))).c AS BIGINT) AS max_cnt,
       CAST((max(struct_pack(c := n, k := k))).k AS BIGINT) AS heavy_key,
       CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_cnt,
       CAST((max(struct_pack(c := n, k := k))).c AS DOUBLE)
           / (CAST(SUM(n) AS DOUBLE) / COUNT(*)) AS skew_ratio
FROM (SELECT {key} AS k, CAST(COUNT(*) AS BIGINT) AS n
      FROM {table} GROUP BY 1)""")
    return "\nUNION ALL\n".join(parts)


@register("dq_join_key_skew", _skew_sql())
def q_dq_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report over the four hot join/aggregation keys:
    rows, distinct keys, the heaviest key and its count, and the
    max/mean skew ratio — the diagnostic that decides WHICH keys need
    salting (``join_salted_orders_customer`` / ``agg_salted_skew`` show
    the treatment; this query is the detector). At 100 TB you run this
    off the table-stats pipeline before picking join strategies: a
    skew_ratio in the hundreds means one task owns the hot key's whole
    partition.

    Scale shape: per key family, one map-side-combinable count-by-key
    followed by an all-integer fold to ONE row; the heavy key comes
    from ``max(struct(cnt, key))`` — the same map-side struct-extremum
    argmax as ``sim_pq_codes``, never a sort or window. Lexicographic
    struct comparison ties identically on both engines (count, then
    key)."""
    from functools import reduce

    frames = []
    for table, key in _SKEW_KEYS:
        df = load_table(spark, sf_dir, table)
        counts = df.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
        top = F.max(F.struct(F.col("n").alias("c"), F.col("k").alias("k")))
        frames.append(
            counts.agg(
                F.sum("n").cast("bigint").alias("n_rows"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                top.getField("c").cast("bigint").alias("max_cnt"),
                top.getField("k").cast("bigint").alias("heavy_key"),
            ).select(
                F.lit(f"{table}.{key}").alias("keyed"),
                "n_rows",
                "n_keys",
                "max_cnt",
                "heavy_key",
                (F.col("n_rows").cast("double") / F.col("n_keys")).alias(
                    "avg_cnt"
                ),
                (
                    F.col("max_cnt").cast("double")
                    / (F.col("n_rows").cast("double") / F.col("n_keys"))
                ).alias("skew_ratio"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), frames)
