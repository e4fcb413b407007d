"""Graph-analytics queries: PageRank over the purchase bipartite graph.

Oracle parity: the SQL unrolls the same fixed iterations with the same
2^40 integer-scaled contribution sums (see ``operators.graph``) and the
same IEEE double expressions. The damping base term must be an actual
DOUBLE subtraction on both sides: DuckDB evaluates a bare
``(1.0 - 0.85)`` in exact DECIMAL first (yielding the decimal 0.15 →
double 0.1499999999999999944…), while Spark subtracts doubles
(0.15000000000000002…) — hence the explicit ``CAST(… AS DOUBLE)``
operands in the SQL. One ulp here shifts ranks after two iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.graph import pagerank
from ..sources.testdata import load_table

_ITERS = 2
_TOP = 100

_PAGERANK_SQL = f"""
WITH pairs AS (
    SELECT DISTINCT 'u:' || o_custkey AS u, 'p:' || l_partkey AS p
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
    SELECT u AS src, p AS dst FROM pairs
    UNION ALL
    SELECT p AS src, u AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_nodes FROM nodes),
r0 AS (SELECT node, 1.0 / n_nodes AS rank FROM nodes CROSS JOIN n),
c1 AS (
    SELECT e.dst AS node,
           CAST(SUM(CAST(FLOOR((r.rank / CAST(d.outdeg AS DOUBLE))
                               * 1099511627776.0) AS BIGINT)) AS DOUBLE)
               / 1099511627776.0 AS in_mass
    FROM edges e JOIN r0 r ON r.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY 1
),
r1 AS (
    SELECT nodes.node,
           (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n_nodes + 0.85 * COALESCE(c1.in_mass, 0.0) AS rank
    FROM nodes LEFT JOIN c1 ON c1.node = nodes.node CROSS JOIN n
),
c2 AS (
    SELECT e.dst AS node,
           CAST(SUM(CAST(FLOOR((r.rank / CAST(d.outdeg AS DOUBLE))
                               * 1099511627776.0) AS BIGINT)) AS DOUBLE)
               / 1099511627776.0 AS in_mass
    FROM edges e JOIN r1 r ON r.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY 1
),
r2 AS (
    SELECT nodes.node,
           (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n_nodes + 0.85 * COALESCE(c2.in_mass, 0.0) AS rank
    FROM nodes LEFT JOIN c2 ON c2.node = nodes.node CROSS JOIN n
)
SELECT node, rank
FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS rnk FROM r2
) WHERE rnk <= {_TOP}
"""


@register("graph_pagerank_purchases", _PAGERANK_SQL)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (2 fixed decimal-exact iterations) over the mirrored
    user↔product purchase graph; top-100 via distributed TakeOrdered.
    Per iteration: one edges⨝ranks join + one combinable dst-agg."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # Compact integer node ids through the iterations — users even
    # (2k), products odd (2k+1): every per-iteration shuffle then moves
    # 8-byte longs instead of 'u:<id>' strings (~3x narrower rows, and
    # long hashing/sorting beats UTF8String). Labels are reconstructed
    # only on the top-k output.
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_partkey") * 2 + 1).alias("p"),
        )
        .distinct()
    )
    # mirror via ONE explode, not a union of two selects: Spark has no
    # common-subexpression elimination across union branches, so the
    # union form executed the join+distinct pipeline twice (the
    # connected-components `und` lesson)
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("src"), F.col("p").alias("dst")),
                F.struct(F.col("p").alias("src"), F.col("u").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # the mirrored image of a distinct pair set is structurally distinct
    # (even/odd namespacing) — skip the defensive dedup shuffle
    ranks = pagerank(edges, iters=_ITERS, distinct_edges=False)
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("u:"), F.shiftright(F.col("node"), 1)),
    ).otherwise(F.concat(F.lit("p:"), F.shiftright(F.col("node"), 1)))
    return (
        ranks.select(label.alias("node"), "rank")
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(_TOP)
    )


# --------------------------------------------------------------------------
# Recursive-CTE BFS (Spark 4 WITH RECURSIVE) — the SQL text IS the oracle
# --------------------------------------------------------------------------

_BFS_SQL = """
WITH RECURSIVE edges AS (
    SELECT DISTINCT 'u:' || CAST(o.o_custkey AS STRING) AS src,
                    'p:' || CAST(l.l_partkey AS STRING) AS dst
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
bi AS (
    SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
),
seed AS (
    SELECT 'u:' || CAST(MIN(o_custkey) AS STRING) AS node FROM orders
),
walk(node, depth) AS (
    SELECT node, 0 FROM seed
    UNION ALL
    SELECT b.dst, w.depth + 1
    FROM walk w JOIN bi b ON b.src = w.node
    WHERE w.depth < 3
),
mind AS (
    SELECT node, MIN(depth) AS depth FROM walk GROUP BY node
)
SELECT CAST(depth AS BIGINT) AS depth, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM mind
GROUP BY depth
"""


@register("graph_bfs_recursive_cte", _BFS_SQL)
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS over the user↔part purchase graph via Spark 4's
    ``WITH RECURSIVE`` — nodes reachable from the smallest customer, by
    minimum hop count (≤ 3). The recursion is depth-bounded so the
    UNION ALL path expansion terminates on the cyclic bipartite graph;
    per level Catalyst plans one hash join of the frontier against the
    edge list — the same per-iteration shape the hand-rolled PageRank /
    connected-components loops use, but driven by the SQL engine's
    recursion operator. The query text IS the DuckDB oracle, unchanged.
    """
    from ..sources.testdata import register_views

    register_views(spark, sf_dir)
    return spark.sql(_BFS_SQL)


_TRIANGLES_SQL = """
WITH pairs AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
    SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
    FROM pairs e1
    JOIN pairs e2 ON e2.pa = e1.pb          -- y < z by construction
    JOIN pairs e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
)
SELECT CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles,
       CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(DISTINCT pa) + 0 FROM (
           SELECT pa FROM pairs UNION SELECT pb FROM pairs) u(pa)) AS BIGINT)
           AS n_parts
"""


@register("graph_triangle_count", _TRIANGLES_SQL)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the part co-purchase graph — the clustering
    primitive behind community detection and recommendation quality
    metrics.

    Shape: the ordered-edge convention (pa < pb everywhere) means each
    triangle {x<y<z} is generated exactly once as (x,y)·(y,z) closed by
    (x,z) — no /6 dedup factor, and the wedge join fans out only
    low→high (forward degree), the standard compact-forward algorithm.
    The edge list derives from per-basket inline pair expansion
    (map-only), not a fact self-join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("items"))
        .filter(F.size("items") >= 2)
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(items) - 2), i ->"
                    " transform(sequence(i + 1, size(items) - 1), j ->"
                    " named_struct('pa', items[i], 'pb', items[j]))))"
                )
            ).alias("p")
        )
        .select("p.pa", "p.pb")
        .distinct()
        .localCheckpoint(eager=False)  # feeds 3 join roles + 2 counts
    )
    e1 = pairs.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    e2 = pairs.select(F.col("pa").alias("y"), F.col("pb").alias("z"))
    e3 = pairs.select(F.col("pa").alias("x"), F.col("pb").alias("z"))
    wedges = e1.join(e2, "y")
    tri = wedges.join(e3, ["x", "z"], "left_semi")
    n_tri = tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    n_edges = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    n_parts = (
        pairs.select(F.col("pa").alias("p"))
        .unionByName(pairs.select(F.col("pb").alias("p")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
    )
    return n_tri.crossJoin(F.broadcast(n_edges)).crossJoin(F.broadcast(n_parts))


# ---------------------------------------------------------------------------
# Personalized PageRank (round 8): seed-anchored affinity
# ---------------------------------------------------------------------------

_PPR_SEEDS = 3
_PPR_TOP = 50


def _ppr_iter_sql(prev: str, c: str, nxt: str) -> str:
    return f"""{c} AS (
    SELECT e.dst AS node,
           CAST(SUM(CAST(FLOOR((r.rank / CAST(d.outdeg AS DOUBLE))
                               * 1099511627776.0) AS BIGINT)) AS DOUBLE)
               / 1099511627776.0 AS in_mass
    FROM edges e JOIN {prev} r ON r.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY 1
),
{nxt} AS (
    SELECT b.node,
           (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * b.r
               + 0.85 * COALESCE({c}.in_mass, 0.0) AS rank
    FROM pbase b LEFT JOIN {c} ON {c}.node = b.node
)"""


_PPR_SQL = f"""
WITH pairs AS (
    SELECT DISTINCT 'u:' || o_custkey AS u, 'p:' || l_partkey AS p
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
    SELECT u AS src, p AS dst FROM pairs
    UNION ALL
    SELECT p AS src, u AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
pseeds AS (
    SELECT DISTINCT u AS node FROM pairs ORDER BY u LIMIT {_PPR_SEEDS}
),
ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_seeds FROM pseeds),
pbase AS (
    SELECT nodes.node,
           CASE WHEN pseeds.node IS NOT NULL THEN 1.0 / n_seeds
                ELSE CAST(0.0 AS DOUBLE) END AS r
    FROM nodes LEFT JOIN pseeds ON pseeds.node = nodes.node CROSS JOIN ns
),
pr0 AS (SELECT node, r AS rank FROM pbase),
{_ppr_iter_sql("pr0", "pc1", "pr1")},
{_ppr_iter_sql("pr1", "pc2", "pr2")}
SELECT node, rank
FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS rnk FROM pr2
) WHERE rnk <= {_PPR_TOP}
"""


@register("graph_ppr_purchases", _PPR_SQL)
def q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the three smallest customers over the
    mirrored purchase graph — the recommendation form of the global
    PageRank: restart mass returns to the seed set, so high-rank
    products are those reachable through the seeds' purchase
    neighborhood, not the globally popular ones.  Same per-iteration
    plan (one edges⨝ranks join + one combinable dst-agg), same 2^40
    integer-scaled contribution sums, same explicit DOUBLE-subtraction
    damping term the global oracle needs — the seed restart is one
    extra broadcast-joined column."""
    from ..operators.graph import personalized_pagerank

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # Round 12: compact integer node ids through the whole chain (users
    # even 2k, products odd 2k+1 — the q_pagerank round-11 treatment):
    # the join+distinct shuffles 16 bytes/row instead of two 'u:'/'p:'
    # strings, and the single-task kernel factorizes int64s instead of
    # strings.  Rank values are relabel-invariant (they depend only on
    # graph structure, the restart set and N), so the oracle — which
    # stays in string space — still hash-matches after the labels are
    # reconstructed on the bounded top-k output.
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_partkey") * 2 + 1).alias("p"),
        )
        .distinct()
        # pinned: pairs feeds BOTH the mirrored edge list and the seed
        # pick — without the pin the join+distinct executes per consumer
        .persist()
    )
    # mirror via ONE explode (no CSE across union branches — see
    # q_pagerank)
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("src"), F.col("p").alias("dst")),
                F.struct(F.col("p").alias("src"), F.col("u").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # the oracle picks seeds by LEXICOGRAPHIC order of the 'u:<custkey>'
    # strings ('u:10' < 'u:2') — order by the reconstructed label, keep
    # the integer id
    seeds = (
        pairs.select(F.col("u").alias("node"))
        .distinct()
        .orderBy(
            F.concat(
                F.lit("u:"), F.shiftright(F.col("node"), 1).cast("string")
            )
        )
        .limit(_PPR_SEEDS)
    )
    ranks = personalized_pagerank(
        edges, seeds, iters=_ITERS, distinct_edges=False
    )
    # ranks is materialized (checkpointed) by the operator on both its
    # paths, and the seed collect ran inside it — safe to release
    pairs.unpersist()
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("u:"), F.shiftright(F.col("node"), 1)),
    ).otherwise(F.concat(F.lit("p:"), F.shiftright(F.col("node"), 1)))
    relabeled = ranks.select(label.alias("node"), "rank")
    w = W.orderBy(F.desc("rank"), F.asc("node"))
    return relabeled.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= _PPR_TOP
    ).select("node", "rank")
