"""Spatial-lite analytics: grid bucketing and nearest-center assignment
with EXACT arithmetic (no trig — haversine's sin/cos differ by ulps
across engines; an equirectangular squared-distance is monotone over
city-scale extents and is pure IEEE multiply/add, bit-identical
everywhere).

The testdata carries no coordinates, so each customer gets a
deterministic synthetic position derived from md5(c_custkey) — the same
portable-hash idiom the samplers use; the operators (grid bucket,
broadcast nearest-center argmin) are the real surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.textfn import md5_bigint
from ..sources.testdata import load_table

_GRID = 10  # 10 x 10 grid over the unit square
_N_CENTERS = 8


def _coord(key: F.Column, salt: str) -> F.Column:
    """Uniform [0, 1) coordinate from md5(salt || key) — 60-bit mantissa
    scaled by one exact power-of-two division."""
    return md5_bigint(F.concat(F.lit(salt), key.cast("string"))).cast("double") / F.lit(
        float(2**60)
    )


def _centers_py() -> list[tuple[int, float, float]]:
    import hashlib

    out = []
    for i in range(_N_CENTERS):
        hx = int(hashlib.md5(f"cx{i}".encode()).hexdigest()[:15], 16)
        hy = int(hashlib.md5(f"cy{i}".encode()).hexdigest()[:15], 16)
        out.append((i, float(hx) / float(2**60), float(hy) / float(2**60)))
    return out


_GRID_SQL = f"""
WITH pos AS (
    SELECT c_custkey,
           ('0x' || substr(md5('x' || CAST(c_custkey AS STRING)), 1, 15))::BIGINT
               / 1152921504606846976.0 AS x,
           ('0x' || substr(md5('y' || CAST(c_custkey AS STRING)), 1, 15))::BIGINT
               / 1152921504606846976.0 AS y
    FROM customer
)
SELECT CAST(FLOOR(x * {_GRID}) AS BIGINT) AS cell_x,
       CAST(FLOOR(y * {_GRID}) AS BIGINT) AS cell_y,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(MIN(c_custkey) AS BIGINT) AS min_custkey
FROM pos
GROUP BY 1, 2
"""


@register("geo_grid_buckets", _GRID_SQL)
def q_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial grid bucketing (geohash-style, integer cells): map-only
    cell assignment + one count aggregation — the index layer every
    spatial join starts from."""
    c = load_table(spark, sf_dir, "customer")
    x = _coord(F.col("c_custkey"), "x")
    y = _coord(F.col("c_custkey"), "y")
    return (
        c.select(
            "c_custkey",
            F.floor(x * _GRID).cast("bigint").alias("cell_x"),
            F.floor(y * _GRID).cast("bigint").alias("cell_y"),
        )
        .groupBy("cell_x", "cell_y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.min("c_custkey").cast("bigint").alias("min_custkey"),
        )
    )


def _centers_sql() -> str:
    rows = ", ".join(
        f"({i}, ('0x' || substr(md5('cx{i}'), 1, 15))::BIGINT / 1152921504606846976.0,"
        f" ('0x' || substr(md5('cy{i}'), 1, 15))::BIGINT / 1152921504606846976.0)"
        for i in range(_N_CENTERS)
    )
    return f"(VALUES {rows}) AS centers(center_id, cx, cy)"


_NEAREST_SQL = f"""
WITH pos AS (
    SELECT c_custkey,
           ('0x' || substr(md5('x' || CAST(c_custkey AS STRING)), 1, 15))::BIGINT
               / 1152921504606846976.0 AS x,
           ('0x' || substr(md5('y' || CAST(c_custkey AS STRING)), 1, 15))::BIGINT
               / 1152921504606846976.0 AS y
    FROM customer
),
scored AS (
    SELECT p.c_custkey, centers.center_id,
           (p.x - centers.cx) * (p.x - centers.cx)
             + (p.y - centers.cy) * (p.y - centers.cy) AS d2
    FROM pos p, {_centers_sql()}
),
best AS (
    SELECT c_custkey, center_id, d2,
           ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY d2 ASC, center_id ASC) AS rk
    FROM scored
)
SELECT center_id,
       CAST(COUNT(*) AS BIGINT) AS n_assigned,
       CAST(MIN(c_custkey) AS BIGINT) AS min_custkey
FROM best WHERE rk = 1
GROUP BY center_id
"""


@register("geo_nearest_center", _NEAREST_SQL)
def q_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-center assignment: tiny center table broadcast against
    the point scan, squared-distance argmin per point (exact multiply/
    add, ties to the smaller center id), counts per center. The
    broadcast-NLJ + per-point argmin is the same shape the IVF coarse
    quantizer uses — spatial is just 2-dimensional embeddings."""
    c = load_table(spark, sf_dir, "customer")
    spark_centers = F.array(
        *[
            F.struct(
                F.lit(i).alias("center_id"),
                F.lit(cx).alias("cx"),
                F.lit(cy).alias("cy"),
            )
            for i, cx, cy in _centers_py()
        ]
    )
    x = _coord(F.col("c_custkey"), "x")
    y = _coord(F.col("c_custkey"), "y")
    pos = c.select("c_custkey", x.alias("x"), y.alias("y"))
    # per-row argmin over the literal center array: map-only, no join at all
    best = pos.select(
        "c_custkey",
        F.aggregate(
            spark_centers,
            F.struct(
                F.lit(-1).alias("center_id"),
                F.lit(float("inf")).alias("d2"),
            ),
            lambda acc, ctr: F.when(
                (F.col("x") - ctr.cx) * (F.col("x") - ctr.cx)
                + (F.col("y") - ctr.cy) * (F.col("y") - ctr.cy)
                < acc.d2,
                F.struct(
                    ctr.center_id.alias("center_id"),
                    (
                        (F.col("x") - ctr.cx) * (F.col("x") - ctr.cx)
                        + (F.col("y") - ctr.cy) * (F.col("y") - ctr.cy)
                    ).alias("d2"),
                ),
            ).otherwise(acc),
        ).getField("center_id").cast("bigint").alias("center_id"),
    )
    return best.groupBy("center_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assigned"),
        F.min("c_custkey").cast("bigint").alias("min_custkey"),
    )


# --- grid-blocked radius join ------------------------------------------------

_RADIUS = 0.05  # must stay <= 1/_GRID so a 3x3 neighborhood covers it
_R2 = _RADIUS * _RADIUS

_RADIUS_SQL = f"""
WITH cpos AS (
    SELECT c_custkey,
           ('0x' || substr(md5('x' || CAST(c_custkey AS STRING)), 1, 15))::BIGINT
               / 1152921504606846976.0 AS x,
           ('0x' || substr(md5('y' || CAST(c_custkey AS STRING)), 1, 15))::BIGINT
               / 1152921504606846976.0 AS y
    FROM customer
),
spos AS (
    SELECT s_suppkey,
           ('0x' || substr(md5('sx' || CAST(s_suppkey AS STRING)), 1, 15))::BIGINT
               / 1152921504606846976.0 AS x,
           ('0x' || substr(md5('sy' || CAST(s_suppkey AS STRING)), 1, 15))::BIGINT
               / 1152921504606846976.0 AS y
    FROM supplier
),
c AS (
    SELECT c_custkey, x, y,
           CAST(FLOOR(x * {_GRID}) AS BIGINT) AS cx,
           CAST(FLOOR(y * {_GRID}) AS BIGINT) AS cy
    FROM cpos
),
s AS (
    SELECT s_suppkey, x, y,
           CAST(FLOOR(x * {_GRID}) AS BIGINT) + dx.o AS cx,
           CAST(FLOOR(y * {_GRID}) AS BIGINT) + dy.o AS cy
    FROM spos,
         (SELECT unnest([-1, 0, 1]) AS o) dx,
         (SELECT unnest([-1, 0, 1]) AS o) dy
)
SELECT c.c_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers_within,
       MIN((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y))
           AS min_d2
FROM c JOIN s ON c.cx = s.cx AND c.cy = s.cy
WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= {_R2!r}
GROUP BY c.c_custkey
"""


@register("geo_radius_join", _RADIUS_SQL)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join as an EQUI-join: suppliers within r = 0.05 of
    each customer. The blocking trick every distributed spatial join
    uses: replicate the smaller side into its 3×3 neighbor cells (r ≤
    cell size guarantees coverage), hash-join on the cell key, then an
    exact distance filter — candidate pairs are per-cell products, never
    the |C|×|S| cross join. At 100 TB the 9× replication of the small
    side is the whole cost, and it broadcasts.

    Determinism: coordinates are exact md5-hash / 2^60 doubles; the
    squared distance is pure IEEE multiply/add (no sqrt needed — compare
    against r², and r² is the same folded literal on both sides);
    counts are integers and min_d2 is an order-free extremum."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _coord(F.col("c_custkey"), "x").alias("x"),
        _coord(F.col("c_custkey"), "y").alias("y"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _coord(F.col("s_suppkey"), "sx").alias("x"),
        _coord(F.col("s_suppkey"), "sy").alias("y"),
    )
    c = c.select(
        "c_custkey",
        "x",
        "y",
        F.floor(F.col("x") * _GRID).cast("bigint").alias("cx"),
        F.floor(F.col("y") * _GRID).cast("bigint").alias("cy"),
    )
    off = F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
    s = (
        s.select(
            "s_suppkey",
            "x",
            "y",
            F.floor(F.col("x") * _GRID).cast("bigint").alias("bx"),
            F.floor(F.col("y") * _GRID).cast("bigint").alias("by"),
        )
        .select("*", off.alias("ox"))
        .select("*", off.alias("oy"))
        .select(
            "s_suppkey",
            F.col("x").alias("sx_"),
            F.col("y").alias("sy_"),
            (F.col("bx") + F.col("ox")).alias("cx"),
            (F.col("by") + F.col("oy")).alias("cy"),
        )
    )
    d2 = (F.col("x") - F.col("sx_")) * (F.col("x") - F.col("sx_")) + (
        F.col("y") - F.col("sy_")
    ) * (F.col("y") - F.col("sy_"))
    return (
        c.join(F.broadcast(s), ["cx", "cy"])
        .filter(d2 <= F.lit(_R2))
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers_within"),
            F.min(d2).alias("min_d2"),
        )
    )


# ---------------------------------------------------------------------------
# Spatial hotspot clusters (round 8): DBSCAN-lite over dense grid cells
# ---------------------------------------------------------------------------

_HS_GRID = 30      # finer than the 10x10 join grid: ~1.7 customers/cell
_HS_MIN = 4        # dense-cell threshold (>= 4 customers)

_HOTSPOT_SQL = f"""
WITH RECURSIVE pos AS (
    SELECT c_custkey,
           ('0x' || substr(md5('x' || CAST(c_custkey AS STRING)), 1, 15))::BIGINT
               / 1152921504606846976.0 AS x,
           ('0x' || substr(md5('y' || CAST(c_custkey AS STRING)), 1, 15))::BIGINT
               / 1152921504606846976.0 AS y
    FROM customer
),
cells AS (
    SELECT CAST(FLOOR(x * {_HS_GRID}) AS BIGINT) AS cx,
           CAST(FLOOR(y * {_HS_GRID}) AS BIGINT) AS cy,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pos GROUP BY 1, 2
),
dense AS (
    SELECT cx * {_HS_GRID} + cy AS cell, cx, cy, n
    FROM cells WHERE n >= {_HS_MIN}
),
adj AS (
    SELECT a.cell AS u, b.cell AS v
    FROM dense a JOIN dense b
      ON ABS(a.cx - b.cx) <= 1 AND ABS(a.cy - b.cy) <= 1
     AND a.cell <> b.cell
),
reach(node, r) AS (
    SELECT cell, cell FROM dense
    UNION
    SELECT e.v, r.r FROM reach r JOIN adj e ON e.u = r.node
),
labeled AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT l.component,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(d.n) AS BIGINT) AS n_customers,
       CAST(MIN(l.node) AS BIGINT) AS min_cell
FROM labeled l JOIN dense d ON d.cell = l.node
GROUP BY l.component
"""


@register("geo_hotspot_clusters", _HOTSPOT_SQL)
def q_geo_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial hotspot detection, DBSCAN-lite: grid cells above a
    density threshold merged across 8-neighbor adjacency by the shared
    star-contraction connected components — per hotspot, its cell
    count, customer mass, and canonical min-cell id.  The grid-bucket
    trick that made the radius join an equi-join makes density
    clustering one groupBy + a bounded dense-cell self-join (the dense
    subset is a small fraction of cells by construction); the oracle
    states the same fixpoint as a recursive closure."""
    from ..functions.textfn import md5_bigint
    from ..operators.dedup import connected_components

    cust = load_table(spark, sf_dir, "customer")
    x = _coord(F.col("c_custkey"), "x")
    y = _coord(F.col("c_custkey"), "y")
    cells = (
        cust.select(
            F.floor(x * _HS_GRID).cast("bigint").alias("cx"),
            F.floor(y * _HS_GRID).cast("bigint").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    # round 11: lazy localCheckpoint instead of an unreleased persist()
    # — same one-materialization semantics for the three consumers
    # (both adjacency sides + the label join), but the blocks are
    # reclaimed by the context cleaner instead of leaking across bench
    # invocations
    dense = cells.filter(F.col("n") >= _HS_MIN).select(
        (F.col("cx") * _HS_GRID + F.col("cy")).alias("cell"), "cx", "cy", "n"
    ).localCheckpoint(eager=False)
    a = dense.select(
        F.col("cell").alias("doc_a"), F.col("cx").alias("ax"),
        F.col("cy").alias("ay"),
    )
    b = dense.select(
        F.col("cell").alias("doc_b"), F.col("cx").alias("bx"),
        F.col("cy").alias("by"),
    )
    adj = a.join(
        b,
        (F.abs(F.col("ax") - F.col("bx")) <= 1)
        & (F.abs(F.col("ay") - F.col("by")) <= 1)
        & (F.col("doc_a") < F.col("doc_b")),
    ).select("doc_a", "doc_b")
    labels = connected_components(adj, src="doc_a", dst="doc_b")
    # isolated dense cells form their own singleton hotspots
    labeled = dense.join(
        labels, dense["cell"] == labels["node"], "left"
    ).select(
        "cell", "n", F.coalesce("component", F.col("cell")).alias("component")
    )
    return labeled.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("n").cast("bigint").alias("n_customers"),
        F.min("cell").cast("bigint").alias("min_cell"),
    )
