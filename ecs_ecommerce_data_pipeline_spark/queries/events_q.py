"""Event-stream-shaped queries over ``events`` plus multimodal-column
plumbing (LLM-pipeline extension surface).

These are the *batch* equivalents of the streaming operators in
``streaming/`` — tumbling windows, sessionization, JSON prop extraction —
each with a DuckDB oracle. The Structured Streaming variants (watermarks,
``Trigger.AvailableNow``) are exercised in ``tests/test_streaming.py``;
their windowed semantics are pinned here via identical batch logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.numeric import money_sum
from ..sources.testdata import cached_count, load_table

_JSON_SQL = """
SELECT event_id, event_type,
       json_extract_string(props, '$.k')::BIGINT AS k_value
FROM events
"""


@register("events_json_props", _JSON_SQL)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column → typed value (get_json_object —
    JVM-side JSON path, no UDF)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


_TUMBLING_SQL = """
SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("events_tumbling_5min", _TUMBLING_SQL)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windowed aggregation — the batch twin of the
    streaming windowed count (same epoch-aligned buckets as
    ``F.window``)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000

_SESSIONIZE_SQL = f"""
WITH flagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {_SESSION_GAP_US}
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
    SELECT *, SUM(is_new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sessioned
GROUP BY 1, 2
"""


@register("events_sessionize", _SESSIONIZE_SQL)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap): lag + cumulative-sum
    session ids over a total per-user order, then per-session rollup.
    Batch twin of streaming ``session_window``. Integer microsecond
    arithmetic — exact."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > _SESSION_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_new_session"),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("is_new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint"),
    )
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        money_sum("value").alias("session_value"),
    )


_TYPE_STATS_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_value,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
FROM events
GROUP BY event_type
"""


@register("events_type_stats", _TYPE_STATS_SQL)
def q_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        money_sum("value").alias("total_value"),
        (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("value"))
        .alias("avg_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_seen"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
    )


# ---------------------------------------------------------------------------
# Multimodal columns: opaque binary payload + typed metadata
# ---------------------------------------------------------------------------

_BINARY_META_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       substr(md5(text), 1, 8) AS content_key
FROM documents
"""


@register("multimodal_binary_meta", _BINARY_META_SQL)
def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: payloads as opaque BINARY + derived
    metadata (byte length, content hash — md5 of the UTF-8 bytes, so the
    VARCHAR-side oracle is identical). The pattern generalizes to
    image/audio blobs where only metadata is relational."""
    doc = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return doc.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
        F.substring(F.md5(payload), 1, 8).alias("content_key"),
    )


# The decode/resize/frame-sample kernels are md5-deterministic stubs
# (image/audio libs absent in this container), which makes them fully
# oracle-expressible: DuckDB reproduces the same md5-derived fake
# dimensions, so the Arrow plumbing is hash-checked end-to-end.
_HEXDIM = "(('0x' || substr(md5(text), {a}, {n}))::BIGINT % {mod} + 1)"

_DECODE_SQL = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST({_HEXDIM.format(a=1, n=4, mod=2048)} AS INT) AS width,
       CAST({_HEXDIM.format(a=5, n=4, mod=2048)} AS INT) AS height,
       CAST({_HEXDIM.format(a=9, n=2, mod=4)} AS INT) AS n_channels,
       md5(text) AS checksum,
       'stub' AS kernel
FROM documents
"""


@register("multimodal_decode_features", _DECODE_SQL)
def q_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode stage: Arrow-batched ``mapInPandas`` over binary
    payloads (stub kernel — see ``operators.multimodal``)."""
    from ..operators.multimodal import decode_features, with_binary_payload

    doc = load_table(spark, sf_dir, "documents")
    return decode_features(with_binary_payload(doc))


# Image near-dup: the Spark side round-trips REAL PNG bytes (encode →
# stdlib decode → dHash), the oracle recomputes the same md5-derived
# pixels ANALYTICALLY — a hash match therefore proves the PNG encode /
# decode / fingerprint chain is lossless end-to-end, not just that two
# engines ran the same SQL.
#
# The synthetic replica structure keeps the duplication RATE constant
# across scales (~_IMG_REPLICAS images per base family at every sf) —
# a real corpus's duplicate-cluster size doesn't grow with corpus size.
# A fixed base count would make cluster size scale with the corpus and
# pair volume scale quadratically (measured 122k pairs at sf0.1 with
# 100 fixed bases vs ~10k with rate-constant families).
_IMG_REPLICAS = 5
_IMG_NOISE_CUT = 8
_IMG_MAX_HAMMING = 10


def _img_base_mod(n_docs: int) -> int:
    return max(1, n_docs // _IMG_REPLICAS)


_IMG_PX = f"""bm AS (
    SELECT GREATEST(COUNT(*) // {_IMG_REPLICAS}, 1) AS m FROM documents
),
px AS (
    SELECT doc_id, r, c,
           CASE WHEN ('0x' || substr(md5('noise:' || doc_id || ':' || r || ':' || c), 1, 2))::BIGINT < {_IMG_NOISE_CUT}
                THEN ('0x' || substr(md5('pert:' || doc_id || ':' || r || ':' || c), 1, 2))::BIGINT
                ELSE ('0x' || substr(md5('img:' || (doc_id % bm.m) || ':' || r || ':' || c), 1, 2))::BIGINT
           END AS p
    FROM documents, bm, range(0, 8) t1(r), range(0, 9) t2(c)
),
bits AS (
    SELECT a.doc_id, a.r, a.c,
           CASE WHEN a.p > b.p THEN 1 ELSE 0 END AS bit
    FROM px a JOIN px b
      ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
    WHERE a.c < 8
),
bands AS (
    SELECT doc_id, CAST(r AS INT) AS band_idx,
           CAST(SUM(bit * (1 << c)) AS BIGINT) AS band_val
    FROM bits GROUP BY 1, 2
)"""

_IMG_DHASH_SQL = f"""
WITH {_IMG_PX}
SELECT doc_id, band_idx, band_val FROM bands
"""


@register("multimodal_image_dhash", _IMG_DHASH_SQL)
def q_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dHash fingerprints of synthesized PNG payloads: real
    zlib/CRC PNG encode, real stdlib decode (loud on corrupt bytes),
    9x8 grayscale adjacent-pixel comparison, one 8-bit band per row.
    Map-only Arrow stage — the fingerprint rows are 3 integers however
    large the image."""
    from ..operators.multimodal import image_dhash_bands, synth_png_images

    doc = load_table(spark, sf_dir, "documents")
    return image_dhash_bands(
        synth_png_images(doc, _img_base_mod(doc.count()), _IMG_NOISE_CUT)
    )


# Ladder-policy blocking (round 11): the registered near-dup family
# fuses bands at the width ``dhash_band_policy`` picks from the corpus
# count — (8×8) → (4×16) → (2×32); the oracle re-derives the ladder and
# fuses at RUNTIME k = w/8, pinning the pick in ``band_bits`` — while
# the narrowband companion keeps its documented fixed 8-bit contract
# (it EXISTS to exhibit that width's collision floor).
_IMG_WQ = """iwq AS (
    SELECT CASE WHEN 8.0 * COUNT(*) / 256.0 <= 8.0 THEN 8
                WHEN 4.0 * COUNT(*) / 65536.0 <= 8.0 THEN 16
                ELSE 32 END AS w
    FROM documents
)"""

_IMG_ABAND = """aband AS (
    SELECT doc_id, CAST(band_idx // (w // 8) AS INT) AS band_idx,
           CAST(SUM(band_val *
                CASE WHEN band_idx % (w // 8) = 1 THEN 256
                     WHEN band_idx % (w // 8) = 2 THEN 65536
                     WHEN band_idx % (w // 8) = 3 THEN 16777216
                     ELSE 1 END) AS BIGINT) AS band_val
    FROM bands CROSS JOIN iwq GROUP BY doc_id, band_idx // (w // 8)
)"""


def _img_neardup_sql(blocks: str) -> str:
    auto = blocks == "aband"
    extra = f"{_IMG_WQ},\n{_IMG_ABAND}," if auto else ""
    wcol = (
        ",\n       CAST((SELECT w FROM iwq) AS BIGINT) AS band_bits"
        if auto
        else ""
    )
    return f"""
WITH {_IMG_PX},
{extra}
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM {blocks} a JOIN {blocks} b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(SUM(bit_count(xor(ba.band_val, bb.band_val))) AS BIGINT) AS hamming{wcol}
FROM cand c
JOIN bands ba ON ba.doc_id = c.doc_a
JOIN bands bb ON bb.doc_id = c.doc_b AND bb.band_idx = ba.band_idx
GROUP BY 1, 2
HAVING CAST(SUM(bit_count(xor(ba.band_val, bb.band_val))) AS BIGINT) <= {_IMG_MAX_HAMMING}
"""


@register("multimodal_image_neardup", _img_neardup_sql("aband"))
def q_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs (the multimodal member of the dedup
    family), registered at the POLICY-picked blocking width (round 11:
    ``dhash_band_policy`` replaces the fixed 16-bit registration the
    round-6 verdict introduced — the ladder still lands on 16 at the
    500-5000-image test scales and moves to 32 beyond ~2M, with the
    pick pinned cross-engine in ``band_bits``).  Fused bands block
    candidates (n²/2^w floor, exact to Hamming 64/w−1 by pigeonhole,
    LSH-recall above); verification is exact Hamming over the full
    64-bit hash.  The 8-bit exact-to-Hamming-7 form stays available as
    the bounded high-recall companion
    (``multimodal_image_neardup_narrowband``)."""
    from ..operators.multimodal import (
        dhash_band_policy,
        image_dhash_bands,
        image_neardup_pairs,
        synth_png_images,
    )

    doc = load_table(spark, sf_dir, "documents")
    n = cached_count(spark, sf_dir, "documents")
    w = dhash_band_policy(n)
    bands = image_dhash_bands(
        synth_png_images(doc, _img_base_mod(n), _IMG_NOISE_CUT)
    )
    return image_neardup_pairs(
        bands, _IMG_MAX_HAMMING, band_bits=w
    ).withColumn("band_bits", F.lit(w).cast("bigint"))


@register("multimodal_image_neardup_narrowband", _img_neardup_sql("bands"))
def q_image_neardup_narrowband(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 8-bit-banded near-dup form: exact up to Hamming 7 by
    pigeonhole (8 bands, so any pair within distance 7 shares an intact
    band) — the high-recall RE-CHECK for bounded corpora or flagged
    shards, NOT the web-scale default (its n²/2⁸ random-collision
    candidate floor grows quadratically).  Wide-band pairs are a subset
    of these pairs by construction (a shared fused block implies both
    constituent bands shared) — pinned by the containment test."""
    from ..operators.multimodal import (
        image_dhash_bands,
        image_neardup_pairs,
        synth_png_images,
    )

    doc = load_table(spark, sf_dir, "documents")
    bands = image_dhash_bands(
        synth_png_images(doc, _img_base_mod(doc.count()), _IMG_NOISE_CUT)
    )
    return image_neardup_pairs(bands, _IMG_MAX_HAMMING, band_bits=8)


_IMG_CLUSTERS_SQL = f"""
WITH RECURSIVE {_IMG_PX},
{_IMG_WQ},
{_IMG_ABAND},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM aband a JOIN aband b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
),
pairs AS (
    SELECT c.doc_a, c.doc_b
    FROM cand c
    JOIN bands ba ON ba.doc_id = c.doc_a
    JOIN bands bb ON bb.doc_id = c.doc_b AND bb.band_idx = ba.band_idx
    GROUP BY 1, 2
    HAVING SUM(bit_count(xor(ba.band_val, bb.band_val))) <= {_IMG_MAX_HAMMING}
),
und AS (
    SELECT doc_a AS u, doc_b AS v FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
),
cc_nodes AS (SELECT DISTINCT u AS node FROM und),
reach(node, r) AS (
    SELECT node, node FROM cc_nodes
    UNION
    SELECT ed.v, r.r FROM reach r JOIN und ed ON ed.u = r.node
),
labeled AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT component,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(node) AS BIGINT) AS sum_members,
       CAST((SELECT w FROM iwq) AS BIGINT) AS band_bits
FROM labeled
GROUP BY component
"""


@register("multimodal_image_dedup_clusters", _IMG_CLUSTERS_SQL)
def q_image_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup SURVIVOR selection: near-dup pairs fed through
    min-label connected components — component id = min doc_id, the
    canonical keep-one image per replica cluster (the multimodal twin
    of dedup_semantic_clusters).  Pairs come from the POLICY-picked
    blocking width (round 11 — see ``multimodal_image_neardup``),
    pinned in ``band_bits``.  The oracle states the same fixpoint as a
    recursive-CTE transitive closure over the verified pairs and
    re-derives the width ladder."""
    from ..operators.dedup import connected_components
    from ..operators.multimodal import (
        dhash_band_policy,
        image_dhash_bands,
        image_neardup_pairs,
        synth_png_images,
    )

    doc = load_table(spark, sf_dir, "documents")
    n = cached_count(spark, sf_dir, "documents")
    w = dhash_band_policy(n)
    bands = image_dhash_bands(
        synth_png_images(doc, _img_base_mod(n), _IMG_NOISE_CUT)
    )
    pairs = image_neardup_pairs(bands, _IMG_MAX_HAMMING, band_bits=w)
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    return labels.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("node").cast("bigint").alias("sum_members"),
    ).withColumn("band_bits", F.lit(w).cast("bigint"))


_MAX_DIM = 256

_RESIZE_SQL = f"""
WITH decoded AS (
    SELECT doc_id,
           {_HEXDIM.format(a=1, n=4, mod=2048)} AS width,
           {_HEXDIM.format(a=5, n=4, mod=2048)} AS height,
           md5(text) AS checksum
    FROM documents
),
sized AS (
    SELECT doc_id, width, height, checksum,
           GREATEST(width, height) AS longest,
           CASE WHEN GREATEST(width, height) <= {_MAX_DIM} THEN width
                ELSE GREATEST(1, width * {_MAX_DIM} // GREATEST(width, height))
           END AS new_width,
           CASE WHEN GREATEST(width, height) <= {_MAX_DIM} THEN height
                ELSE GREATEST(1, height * {_MAX_DIM} // GREATEST(width, height))
           END AS new_height
    FROM decoded
)
SELECT doc_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       CAST(new_width AS INT) AS new_width, CAST(new_height AS INT) AS new_height,
       md5(checksum || ':' || new_width || 'x' || new_height) AS resized_checksum
FROM sized
"""


@register("multimodal_resize_meta", _RESIZE_SQL)
def q_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize stage: integer aspect-fit into a 256px box,
    Arrow-batched; 1:1 row contract hash-checked against the oracle."""
    from ..operators.multimodal import (
        decode_features,
        resize_features,
        with_binary_payload,
    )

    doc = load_table(spark, sf_dir, "documents")
    return resize_features(decode_features(with_binary_payload(doc)), max_dim=_MAX_DIM)


_MAX_FRAMES = 4

_FRAMES_SQL = f"""
WITH d AS (SELECT doc_id, md5(text) AS m FROM documents),
f AS (
    SELECT doc_id, m,
           1 + (('0x' || substr(m, 1, 4))::BIGINT % {_MAX_FRAMES}) AS n_frames
    FROM d
)
SELECT doc_id, CAST(idx AS INT) AS frame_idx,
       md5(m || ':' || idx) AS frame_checksum
FROM (SELECT doc_id, m, unnest(range(0, n_frames)) AS idx FROM f)
"""


@register("multimodal_frame_sample", _FRAMES_SQL)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: 1 payload row → N frame rows through
    ``mapInPandas`` (N payload-derived) — the video-pipeline expansion
    shape, hash-checked."""
    from ..operators.multimodal import sample_frames, with_binary_payload

    doc = load_table(spark, sf_dir, "documents")
    return sample_frames(with_binary_payload(doc), max_frames=_MAX_FRAMES)


_FUNNEL_SQL = """
WITH stage AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events GROUP BY user_id
)
SELECT CAST(COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS BIGINT) AS n_view,
       CAST(COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                       THEN 1 END) AS BIGINT) AS n_view_click,
       CAST(COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                            AND t_purchase > t_click
                       THEN 1 END) AS BIGINT) AS n_full_funnel
FROM stage
"""


@register("events_funnel", _FUNNEL_SQL)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict first-event funnel (view → click → purchase): per-user
    first-occurrence times from ONE combinable agg, ordered-stage counts
    from a second 1-row agg. (Strict = the FIRST click must follow the
    FIRST view; sequence-scan variants would use window lag.) Two
    map-side-combinable shuffles, no window over raw events."""
    e = load_table(spark, sf_dir, "events")

    def first_ts(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    stage = e.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return stage.agg(
        F.count(F.when(viewed, 1)).alias("n_view"),
        F.count(F.when(clicked, 1)).alias("n_view_click"),
        F.count(F.when(purchased, 1)).alias("n_full_funnel"),
    )


_HOPPING_SQL = """
WITH hops AS (
    SELECT e.*,
           time_bucket(INTERVAL '10 minutes', ts - (k.k * INTERVAL '5 minutes'))
               + (k.k * INTERVAL '5 minutes') AS win_start
    FROM events e CROSS JOIN (SELECT unnest(range(0, 2)) AS k) k
)
SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM hops
GROUP BY 1, 2
"""


@register("events_hopping_windows", _HOPPING_SQL)
def q_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 10-minute windows every 5 minutes —
    each event lands in window_length/slide = 2 overlapping windows
    (``F.window`` with a slide explodes exactly that replication; the
    oracle derives the k-th hop start arithmetically). Same shape runs
    under Structured Streaming with a watermark."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_ATTRIB_HORIZON_US = 30 * 60 * 1_000_000

_ATTRIB_SQL = f"""
WITH v AS (
    SELECT user_id, event_id AS view_id, ts AS view_ts
    FROM events WHERE event_type = 'view'
),
p AS (
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, value
    FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id, v.view_id, p.purchase_id,
       strftime(v.view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
       strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CAST(CAST(p.value AS DECIMAL(18,2)) AS DOUBLE) AS purchase_value
FROM v JOIN p
  ON p.user_id = v.user_id
 AND epoch_us(p.purchase_ts) >= epoch_us(v.view_ts)
 AND epoch_us(p.purchase_ts) <= epoch_us(v.view_ts) + {_ATTRIB_HORIZON_US}
"""


@register("events_attribution", _ATTRIB_SQL)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase attribution: every purchase a user makes within 30
    minutes of a view, credited to that view.  Batch twin of the
    stream-stream interval join in ``streaming.pipeline
    .view_purchase_attribution`` (same equi-key + time-range condition;
    the streaming form adds watermarks so join state is evicted).
    Timestamp arithmetic is µs-integer on both engines so a purchase on
    the horizon boundary lands identically."""
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts_raw"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts_raw"),
        F.col("value"),
    )
    pus, vus = F.unix_micros("purchase_ts_raw"), F.unix_micros("view_ts_raw")
    return (
        v.join(
            p,
            (F.col("p_user") == F.col("user_id"))
            & (pus >= vus)
            & (pus <= vus + F.lit(_ATTRIB_HORIZON_US)),
        )
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            F.date_format("view_ts_raw", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
            F.date_format("purchase_ts_raw", "yyyy-MM-dd HH:mm:ss").alias(
                "purchase_ts"
            ),
            F.col("value").cast("decimal(18,2)").cast("double").alias(
                "purchase_value"
            ),
        )
    )


_VARIANT_SQL = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_value,
       (json_extract(props, '$.k') IS NOT NULL) AS has_k
FROM events
"""


@register("events_variant_props", _VARIANT_SQL)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through the VARIANT type (Spark 4):
    ``parse_json`` once into an open-schema binary-encoded value, then
    typed ``variant_get`` path extraction — the shredded-read pattern for
    columns whose schema drifts per row. Unlike ``get_json_object``
    (string re-parse per path), the variant parses once and every
    extraction reads the encoded tree; absent paths yield NULL, same as
    the JSON-path oracle."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_value"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_value"),
        # presence, not castability: a string-typed k still "has" the key
        F.try_variant_get(v, "$.k", "variant").isNotNull().alias("has_k"),
    )


_COUNT_WINDOWS_SQL = """
WITH seq AS (
    SELECT user_id, value,
           CAST((ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)
                // 25 AS BIGINT) AS win_id
    FROM events
)
SELECT user_id, win_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM seq
GROUP BY user_id, win_id
"""


@register("events_count_windows", _COUNT_WINDOWS_SQL)
def q_events_count_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based windows (every 25 events per user) — the tumbling
    window's row-count sibling: deterministic (ts, event_id) sequencing,
    window id from integer division of the row number, one aggregation.
    The shape batch feature-extraction uses for fixed-size context
    blocks."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "value",
        F.floor((F.row_number().over(w) - 1) / 25).cast("bigint").alias("win_id"),
    )
    return seq.groupBy("user_id", "win_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        money_sum("value").alias("total_value"),
    )


# --- multi-touch attribution credit (first / last / linear) ----------------

_CREDIT_SQL = f"""
WITH v AS (
    SELECT user_id, event_id AS view_id, ts AS view_ts
    FROM events WHERE event_type = 'view'
),
p AS (
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, value
    FROM events WHERE event_type = 'purchase'
),
touches AS (
    SELECT v.view_id, p.purchase_id,
           epoch_us(v.view_ts) AS vus,
           CAST(CAST(p.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM v JOIN p
      ON p.user_id = v.user_id
     AND epoch_us(p.purchase_ts) >= epoch_us(v.view_ts)
     AND epoch_us(p.purchase_ts) <= epoch_us(v.view_ts) + {_ATTRIB_HORIZON_US}
),
ranked AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY purchase_id
                              ORDER BY vus, view_id) AS rn_first,
           ROW_NUMBER() OVER (PARTITION BY purchase_id
                              ORDER BY vus DESC, view_id DESC) AS rn_last,
           COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches
    FROM touches
)
SELECT view_id,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM((cents * 10000) // n_touches) AS DOUBLE) / 1000000.0
           AS credit_linear,
       CAST(SUM(CASE WHEN rn_first = 1 THEN cents ELSE 0 END) AS DOUBLE)
           / 100.0 AS credit_first,
       CAST(SUM(CASE WHEN rn_last = 1 THEN cents ELSE 0 END) AS DOUBLE)
           / 100.0 AS credit_last
FROM ranked
GROUP BY view_id
"""


@register("events_attribution_credit", _CREDIT_SQL)
def q_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: each purchase's value credited to its
    in-horizon views under three models at once — first-touch,
    last-touch, and linear (value split evenly across touches).

    Determinism: money rides as integer CENTS; the linear split is
    integer division of micro-cents by the touch count (exact,
    order-independent BIGINT sums — a double division per touch would
    make per-view sums partitioning-dependent); ties on touch time break
    by view_id. The per-purchase windows are bounded by touches-per-
    purchase (horizon-bounded), so no corpus-sized window exists.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.unix_micros("ts").alias("vus"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("pus"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    touches = v.join(
        p,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("pus") >= F.col("vus"))
        & (F.col("pus") <= F.col("vus") + F.lit(_ATTRIB_HORIZON_US)),
    ).select("view_id", "purchase_id", "vus", "cents")
    wp = Window.partitionBy("purchase_id")
    ranked = (
        touches.withColumn(
            "rn_first",
            F.row_number().over(wp.orderBy("vus", "view_id")),
        )
        .withColumn(
            "rn_last",
            F.row_number().over(wp.orderBy(F.desc("vus"), F.desc("view_id"))),
        )
        .withColumn("n_touches", F.count(F.lit(1)).over(wp))
    )
    # Spark's `div` truncates toward zero while DuckDB's `//` floors —
    # for a refund-style NEGATIVE value the two disagree by 1 micro-cent.
    # Make the Spark side floor-consistent exactly (pure BIGINT algebra,
    # no double rounding; n_touches > 0 always, so the signs differ iff
    # cents < 0).
    floor_div = F.expr(
        "(cents * 10000) div n_touches"
        " - (CASE WHEN (cents * 10000) % n_touches != 0 AND cents < 0"
        " THEN 1 ELSE 0 END)"
    )
    return ranked.groupBy("view_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        (F.sum(floor_div).cast("double") / 1000000.0).alias("credit_linear"),
        (
            F.sum(F.when(F.col("rn_first") == 1, F.col("cents")).otherwise(0))
            .cast("double")
            / 100.0
        ).alias("credit_first"),
        (
            F.sum(F.when(F.col("rn_last") == 1, F.col("cents")).otherwise(0))
            .cast("double")
            / 100.0
        ).alias("credit_last"),
    )


_AUDIO_SQL = """
WITH d AS (SELECT doc_id, md5(text) AS m FROM documents),
a AS (
    SELECT doc_id, m,
           [16000, 22050, 44100][CAST(('0x' || substr(m, 1, 4))::BIGINT % 3 AS INT) + 1]
               AS sr,
           ('0x' || substr(m, 5, 4))::BIGINT % 7 AS dur_extra,
           ('0x' || substr(m, 9, 4))::BIGINT AS frac_raw
    FROM d
),
s AS (
    SELECT doc_id, m, sr,
           sr * (1 + dur_extra) + frac_raw % sr AS n_samples
    FROM a
),
w AS (
    SELECT doc_id, m, sr, n_samples,
           unnest(range(0, (n_samples + sr - 1) // sr)) AS idx
    FROM s
)
SELECT doc_id,
       CAST(sr AS INT) AS sample_rate,
       CAST(n_samples AS BIGINT) AS n_samples,
       CAST(idx AS INT) AS window_idx,
       CAST(idx * sr AS BIGINT) AS start_sample,
       CAST(LEAST(sr, n_samples - idx * sr) AS BIGINT) AS window_len,
       md5(m || ':' || idx) AS window_checksum
FROM w
"""


@register("multimodal_audio_windows", _AUDIO_SQL)
def q_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio 1-second windowing: 1 payload row → one row per analysis
    window, the window count derived from the (stub-)decoded duration —
    a DATA-sized mapInPandas expansion (vs the hash-mod-sized frame
    sampler), truncated final window included. Hash-checked end-to-end."""
    from ..operators.multimodal import audio_windows, with_binary_payload

    doc = load_table(spark, sf_dir, "documents")
    return audio_windows(with_binary_payload(doc))


# --- hourly volume anomaly detection (trailing z-score) --------------------

_ANOM_MIN_TRAIL = 12
_ANOM_Z = 3.0

_ANOMALY_SQL = f"""
WITH h AS (
    SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
),
w AS (
    SELECT event_type, hr, n_events,
           CAST(COUNT(*) OVER tw AS BIGINT) AS trailing_n,
           CAST(SUM(n_events) OVER tw AS BIGINT) AS s,
           CAST(SUM(n_events * n_events) OVER tw AS BIGINT) AS ss
    FROM h
    WINDOW tw AS (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type,
       strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       n_events, trailing_n,
       CASE WHEN trailing_n >= {_ANOM_MIN_TRAIL}
             AND SQRT(GREATEST(
                   CAST(ss AS DOUBLE) / trailing_n
                   - (CAST(s AS DOUBLE) / trailing_n)
                     * (CAST(s AS DOUBLE) / trailing_n), 0.0)) > 0.0
            THEN (CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / trailing_n)
                 / SQRT(GREATEST(
                     CAST(ss AS DOUBLE) / trailing_n
                     - (CAST(s AS DOUBLE) / trailing_n)
                       * (CAST(s AS DOUBLE) / trailing_n), 0.0))
       END AS z,
       COALESCE(ABS(
           CASE WHEN trailing_n >= {_ANOM_MIN_TRAIL}
                 AND SQRT(GREATEST(
                       CAST(ss AS DOUBLE) / trailing_n
                       - (CAST(s AS DOUBLE) / trailing_n)
                         * (CAST(s AS DOUBLE) / trailing_n), 0.0)) > 0.0
                THEN (CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / trailing_n)
                     / SQRT(GREATEST(
                         CAST(ss AS DOUBLE) / trailing_n
                         - (CAST(s AS DOUBLE) / trailing_n)
                           * (CAST(s AS DOUBLE) / trailing_n), 0.0))
           END) > {_ANOM_Z!r}, FALSE) AS is_anomaly
FROM w
"""


@register("events_hourly_anomaly", _ANOMALY_SQL)
def q_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational volume-anomaly detection: per event type, each hour's
    count scored against the TRAILING 24 hours' mean/std (z-score; flag
    at |z| > 3, NULL until 12 trailing hours exist or when the trailing
    window is flat). The monitoring query every ingest pipeline runs on
    itself.

    Frame semantics (deliberate, documented): the ROWS frame spans the
    trailing 24 OBSERVED (event_type, hour) buckets — hours with zero
    events produce no row, so across a gap the frame silently covers a
    longer wall-clock span, and a TOTAL volume dropout emits no row and
    is never flagged here. ``events_hourly_anomaly_gapfill`` below is
    the dropout-aware variant (zero-filled hour spine, so missing hours
    score z < 0 and a dead stream IS flagged).

    Scale shape: the corpus reduces to (event_type × hour) counts
    BEFORE any window; the trailing frame is a bounded 24-row
    ROWS-frame partitioned by type — never corpus-sized, never a
    global sort. All window sums are BIGINT; mean/std/z are computed
    with the same IEEE expression on both engines."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    tw = (
        W.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-24, -1)
    )
    w = h.select(
        "event_type",
        "hr",
        "n_events",
        F.count(F.lit(1)).over(tw).cast("bigint").alias("trailing_n"),
        F.sum("n_events").over(tw).cast("bigint").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).over(tw).cast("bigint").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("trailing_n")
    var = F.greatest(
        F.col("ss").cast("double") / F.col("trailing_n") - mean * mean,
        F.lit(0.0),
    )
    std = F.sqrt(var)
    z = F.when(
        (F.col("trailing_n") >= _ANOM_MIN_TRAIL) & (std > 0.0),
        (F.col("n_events").cast("double") - mean) / std,
    )
    return w.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
        "n_events",
        "trailing_n",
        z.alias("z"),
        F.coalesce(F.abs(z) > _ANOM_Z, F.lit(False)).alias("is_anomaly"),
    )


_ANOMALY_GAPFILL_SQL = f"""
WITH h AS (
    SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT event_type, MIN(hr) AS t0,
           (SELECT MAX(hr) FROM h) AS t1
    FROM h GROUP BY event_type
),
spine AS (
    SELECT event_type, unnest(generate_series(t0, t1, INTERVAL '1 hour')) AS hr
    FROM bounds
),
filled AS (
    SELECT s.event_type, s.hr, COALESCE(h.n_events, 0) AS n_events
    FROM spine s LEFT JOIN h ON h.event_type = s.event_type AND h.hr = s.hr
),
w AS (
    SELECT event_type, hr, n_events,
           CAST(COUNT(*) OVER tw AS BIGINT) AS trailing_n,
           CAST(SUM(n_events) OVER tw AS BIGINT) AS s,
           CAST(SUM(n_events * n_events) OVER tw AS BIGINT) AS ss
    FROM filled
    WINDOW tw AS (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type,
       strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       n_events, trailing_n,
       CASE WHEN trailing_n >= {_ANOM_MIN_TRAIL}
             AND SQRT(GREATEST(
                   CAST(ss AS DOUBLE) / trailing_n
                   - (CAST(s AS DOUBLE) / trailing_n)
                     * (CAST(s AS DOUBLE) / trailing_n), 0.0)) > 0.0
            THEN (CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / trailing_n)
                 / SQRT(GREATEST(
                     CAST(ss AS DOUBLE) / trailing_n
                     - (CAST(s AS DOUBLE) / trailing_n)
                       * (CAST(s AS DOUBLE) / trailing_n), 0.0))
       END AS z,
       COALESCE(ABS(
           CASE WHEN trailing_n >= {_ANOM_MIN_TRAIL}
                 AND SQRT(GREATEST(
                       CAST(ss AS DOUBLE) / trailing_n
                       - (CAST(s AS DOUBLE) / trailing_n)
                         * (CAST(s AS DOUBLE) / trailing_n), 0.0)) > 0.0
                THEN (CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / trailing_n)
                     / SQRT(GREATEST(
                         CAST(ss AS DOUBLE) / trailing_n
                         - (CAST(s AS DOUBLE) / trailing_n)
                           * (CAST(s AS DOUBLE) / trailing_n), 0.0))
           END) > {_ANOM_Z!r}, FALSE) AS is_anomaly
FROM w
"""


@register("events_hourly_anomaly_gapfill", _ANOMALY_GAPFILL_SQL)
def q_hourly_anomaly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dropout-aware volume-anomaly detection: the hour axis is
    GAP-FILLED with zero-count rows (per type, from the type's first
    hour to the corpus' last hour) before the trailing-24h z-score — so
    the trailing frame always spans exactly 24 wall-clock hours, and a
    total volume dropout (the classic incident the observed-bucket
    variant above cannot see) emits an n_events=0 row that scores
    z < 0 and gets flagged.

    Scale shape: the spine is |types| × |hours| rows — sequence+explode
    over a per-type (first_hour, last_hour) bounds frame, tiny relative
    to the event corpus; everything downstream matches
    ``events_hourly_anomaly``."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    # global last hour: 1-row broadcast onto the per-type bounds
    t1 = h.agg(F.max("hr").alias("t1"))
    bounds = (
        h.groupBy("event_type")
        .agg(F.min("hr").alias("t0"))
        .crossJoin(F.broadcast(t1))
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    filled = spine.join(h, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
    )
    tw = W.partitionBy("event_type").orderBy("hr").rowsBetween(-24, -1)
    w = filled.select(
        "event_type",
        "hr",
        "n_events",
        F.count(F.lit(1)).over(tw).cast("bigint").alias("trailing_n"),
        F.sum("n_events").over(tw).cast("bigint").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).over(tw).cast("bigint").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("trailing_n")
    var = F.greatest(
        F.col("ss").cast("double") / F.col("trailing_n") - mean * mean,
        F.lit(0.0),
    )
    std = F.sqrt(var)
    z = F.when(
        (F.col("trailing_n") >= _ANOM_MIN_TRAIL) & (std > 0.0),
        (F.col("n_events").cast("double") - mean) / std,
    )
    return w.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
        "n_events",
        "trailing_n",
        z.alias("z"),
        F.coalesce(F.abs(z) > _ANOM_Z, F.lit(False)).alias("is_anomaly"),
    )


# --- DAU / WAU stickiness --------------------------------------------------

_STICKY_SQL = """
WITH d AS (
    SELECT CAST(ts AS DATE) AS day, user_id FROM events
),
dau AS (
    SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau FROM d GROUP BY day
),
wau AS (
    SELECT a.day,
           CAST(COUNT(DISTINCT b.user_id) AS BIGINT) AS wau
    FROM (SELECT DISTINCT day FROM d) a
    JOIN d b ON b.day > a.day - 7 AND b.day <= a.day
    GROUP BY a.day
)
SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
       CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
"""


@register("events_dau_wau_stickiness", _STICKY_SQL)
def q_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU stickiness per day — the standard
    product-engagement ratio, with EXACT distinct counts.

    Scale shape: the corpus first reduces to distinct (day, user) pairs
    (one hash aggregation); the trailing-window WAU re-counts distincts
    over a 7-day RANGE join of that reduced relation — cost is
    7×|distinct day-user| join rows, never corpus-sized, and the day
    list side is tiny. (An approximate twin would merge 7 daily HLL
    sketches — see ``hll_distinct_merge`` — but the gate here is exact.)
    """
    e = load_table(spark, sf_dir, "events")
    d = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = d.groupBy("day").agg(F.countDistinct("user_id").cast("bigint").alias("dau"))
    days = d.select("day").distinct().select(F.col("day").alias("aday"))
    wau = (
        days.join(
            d,
            (F.col("day") > F.date_sub(F.col("aday"), 7))
            & (F.col("day") <= F.col("aday")),
        )
        .groupBy("aday")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )
    return (
        dau.join(wau, dau["day"] == wau["aday"])
        .select(
            F.date_format(dau["day"], "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


# --- funnel conversion (ordered steps within a horizon) --------------------

_FUNNEL_HOURS = 24

_FUNNEL_SQL = f"""
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN s1 ON s1.user_id = e.user_id
    WHERE e.event_type = 'click' AND e.ts > s1.t1
      AND e.ts <= s1.t1 + INTERVAL '{_FUNNEL_HOURS}' HOUR
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e
    JOIN s1 ON s1.user_id = e.user_id
    JOIN s2 ON s2.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      AND e.ts <= s1.t1 + INTERVAL '{_FUNNEL_HOURS}' HOUR
    GROUP BY e.user_id
),
counts AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n3
)
SELECT step, step_name, n_users, conv_from_prev, conv_from_start
FROM counts, LATERAL (VALUES
    (CAST(1 AS BIGINT), 'view', n1, CAST(NULL AS DOUBLE),
     CAST(NULL AS DOUBLE)),
    (CAST(2 AS BIGINT), 'click', n2,
     CASE WHEN n1 > 0 THEN CAST(n2 AS DOUBLE) / n1 END,
     CASE WHEN n1 > 0 THEN CAST(n2 AS DOUBLE) / n1 END),
    (CAST(3 AS BIGINT), 'purchase', n3,
     CASE WHEN n2 > 0 THEN CAST(n3 AS DOUBLE) / n2 END,
     CASE WHEN n1 > 0 THEN CAST(n3 AS DOUBLE) / n1 END)
) AS t(step, step_name, n_users, conv_from_prev, conv_from_start)
"""


@register("events_funnel_conversion", _FUNNEL_SQL)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel (view → click → purchase within 24 h of the
    first view): per step, how many users progressed IN ORDER, plus
    step-over-step and end-to-end conversion rates — the product
    analytics query every event pipeline serves.

    Semantics: step k's timestamp is the user's FIRST qualifying event
    strictly after step k-1's timestamp and inside the horizon anchored
    at step 1 — ordered progression, not mere co-occurrence.

    Scale shape: three per-user MIN aggregations + two equi-joins on
    user_id (user-sized, never event²); the final step table is 3 rows.
    Rates are BIGINT/BIGINT divisions — bit-identical cross-engine."""
    e = load_table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    horizon = F.col("t1") + F.expr(f"INTERVAL {_FUNNEL_HOURS} HOURS")
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= horizon))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= horizon))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    n2 = s2.agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    n3 = s3.agg(F.count(F.lit(1)).cast("bigint").alias("n3"))
    counts = F.broadcast(n1).crossJoin(F.broadcast(n2)).crossJoin(
        F.broadcast(n3)
    )
    steps = counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).cast("bigint").alias("step"),
                    F.lit("view").alias("step_name"),
                    F.col("n1").alias("n_users"),
                    F.lit(None).cast("double").alias("conv_from_prev"),
                    F.lit(None).cast("double").alias("conv_from_start"),
                ),
                F.struct(
                    F.lit(2).cast("bigint").alias("step"),
                    F.lit("click").alias("step_name"),
                    F.col("n2").alias("n_users"),
                    F.when(
                        F.col("n1") > 0,
                        F.col("n2").cast("double") / F.col("n1"),
                    ).alias("conv_from_prev"),
                    F.when(
                        F.col("n1") > 0,
                        F.col("n2").cast("double") / F.col("n1"),
                    ).alias("conv_from_start"),
                ),
                F.struct(
                    F.lit(3).cast("bigint").alias("step"),
                    F.lit("purchase").alias("step_name"),
                    F.col("n3").alias("n_users"),
                    F.when(
                        F.col("n2") > 0,
                        F.col("n3").cast("double") / F.col("n2"),
                    ).alias("conv_from_prev"),
                    F.when(
                        F.col("n1") > 0,
                        F.col("n3").cast("double") / F.col("n1"),
                    ).alias("conv_from_start"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    return steps


# --- weekly retention cohorts ----------------------------------------------

_RETENTION_SQL = """
WITH firsts AS (
    SELECT user_id, date_trunc('week', CAST(MIN(ts) AS DATE)) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT e.user_id, f.cohort_week,
           date_trunc('week', CAST(e.ts AS DATE)) AS active_week
    FROM events e JOIN firsts f ON f.user_id = e.user_id
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cohort_week, active_week) / 7 AS BIGINT)
           AS week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
FROM activity
GROUP BY cohort_week, 2
"""


@register("events_retention_cohorts", _RETENTION_SQL)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohort triangle: users grouped by first-seen
    week; for each later week, how many of that cohort were active —
    the second canonical product-analytics rollup (with the funnel
    above).  Two hash aggregations + one user-sized equi-join; the
    output is |cohorts| × |weeks| rows."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts").cast("date")).cast("date").alias(
            "cohort_week"
        )
    )
    activity = (
        e.select(
            "user_id",
            F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias(
                "active_week"
            ),
        )
        .distinct()
        .join(firsts, "user_id")
    )
    return (
        activity.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff("active_week", "cohort_week") / 7
            ).cast("bigint").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )


# --- A/B experiment readout with CUPED variance reduction ------------------

# Deterministic assignment: md5-bucket of user_id (the engine's standard
# portable hash idiom); pre-period = first 15 days, experiment = rest.
_AB_SPLIT_DAY = 15

_AB_CUPED_SQL = f"""
WITH per_user AS (
    SELECT user_id,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
               AS variant,
           CAST(COALESCE(SUM(CASE
               WHEN date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    < {_AB_SPLIT_DAY}
               THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0)
               AS BIGINT) AS x_cents,
           CAST(COALESCE(SUM(CASE
               WHEN date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    >= {_AB_SPLIT_DAY}
               THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0)
               AS BIGINT) AS y_cents
    FROM events
    GROUP BY user_id
),
pooled AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x_cents) AS BIGINT) AS sx,
           CAST(SUM(y_cents) AS BIGINT) AS sy,
           CAST(SUM(x_cents * x_cents) AS BIGINT) AS sxx,
           CAST(SUM(x_cents * y_cents) AS BIGINT) AS sxy
    FROM per_user
),
theta AS (
    SELECT n, sx,
           CASE WHEN CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * sx > 0.0
                THEN (CAST(sxy AS DOUBLE) * n - CAST(sx AS DOUBLE) * sy)
                     / (CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * sx)
                ELSE 0.0 END AS th
    FROM pooled
)
SELECT v.variant,
       CAST(v.nv AS BIGINT) AS n_users,
       (CAST(v.syv AS DOUBLE) / v.nv) / 100.0 AS mean_post,
       ((CAST(v.syv AS DOUBLE) / v.nv)
        - t.th * (CAST(v.sxv AS DOUBLE) / v.nv - CAST(t.sx AS DOUBLE) / t.n))
       / 100.0 AS mean_cuped
FROM (
    SELECT variant, COUNT(*) AS nv,
           CAST(SUM(x_cents) AS BIGINT) AS sxv,
           CAST(SUM(y_cents) AS BIGINT) AS syv
    FROM per_user GROUP BY variant
) v CROSS JOIN theta t
"""


@register("events_ab_cuped", _AB_CUPED_SQL)
def q_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with CUPED variance reduction (Deng et
    al.): users hash-assigned to two variants; the experiment-period
    revenue mean is adjusted by the pre-period covariate,
    ``mean_y − θ·(mean_x − pooled_mean_x)`` with
    ``θ = cov(x,y)/var(x)`` — the standard trick that removes
    pre-existing user-spend variance from the treatment estimate.

    Determinism: assignment is the md5-bucket idiom; x/y are exact
    BIGINT cent sums per user, θ and the adjusted means are computed
    once in double FROM identical integers — bit-reproducible.  Scale
    shape: one per-user hash agg, one per-variant agg, one 1-row
    broadcast of pooled moments."""
    e = load_table(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    per_user = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(day < _AB_SPLIT_DAY, cents)), F.lit(0)
        ).cast("bigint").alias("x_cents"),
        F.coalesce(
            F.sum(F.when(day >= _AB_SPLIT_DAY, cents)), F.lit(0)
        ).cast("bigint").alias("y_cents"),
    ).withColumn(
        "variant",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % 2,
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x_cents").cast("bigint").alias("sx"),
        F.sum("y_cents").cast("bigint").alias("sy"),
        F.sum(F.col("x_cents") * F.col("x_cents")).cast("bigint").alias("sxx"),
        F.sum(F.col("x_cents") * F.col("y_cents")).cast("bigint").alias("sxy"),
    )
    denom = F.col("sxx").cast("double") * F.col("n") - F.col(
        "sx"
    ).cast("double") * F.col("sx")
    theta = pooled.select(
        "n",
        "sx",
        F.when(
            denom > 0.0,
            (
                F.col("sxy").cast("double") * F.col("n")
                - F.col("sx").cast("double") * F.col("sy")
            )
            / denom,
        )
        .otherwise(0.0)
        .alias("th"),
    )
    per_variant = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum("x_cents").cast("bigint").alias("sxv"),
        F.sum("y_cents").cast("bigint").alias("syv"),
    )
    return per_variant.crossJoin(F.broadcast(theta)).select(
        "variant",
        F.col("nv").cast("bigint").alias("n_users"),
        ((F.col("syv").cast("double") / F.col("nv")) / 100.0).alias("mean_post"),
        (
            (
                (F.col("syv").cast("double") / F.col("nv"))
                - F.col("th")
                * (
                    F.col("sxv").cast("double") / F.col("nv")
                    - F.col("sx").cast("double") / F.col("n")
                )
            )
            / 100.0
        ).alias("mean_cuped"),
    )


# --- EWMA-smoothed hourly volumes (exact power-of-two decay) ---------------

# Half-life decay α=1/2 truncated at 24 lags: relative weight of lag j is
# 2^(24−j) — every weight is an exact integer, num/den are BIGINT sums,
# and the smoothed value is ONE double division of identical integers on
# both engines. Warm-up rows renormalize by the weights actually present.
_EWMA_J = 24
_EWMA_SPIKE_MULT = 4.0
_EWMA_SPIKE_MIN = 10


def _ewma_terms(lag_fmt: str, cur: str) -> tuple[str, str]:
    """(numerator, denominator) SQL fragments: Σ lag_j·2^(24−j) and
    Σ present_j·2^(24−j), j=0 being the current row."""
    num = [f"{cur} * {1 << _EWMA_J}"]
    den = [f"{1 << _EWMA_J}"]
    for j in range(1, _EWMA_J + 1):
        w = 1 << (_EWMA_J - j)
        lj = lag_fmt.format(j=j)
        num.append(f"COALESCE({lj}, 0) * {w}")
        den.append(f"CASE WHEN {lj} IS NOT NULL THEN {w} ELSE 0 END")
    return " + ".join(num), " + ".join(den)


_EWMA_NUM, _EWMA_DEN = _ewma_terms(
    "lag(n_events, {j}) OVER (PARTITION BY event_type ORDER BY hr)", "n_events"
)

_EWMA_SQL = f"""
WITH h AS (
    SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT event_type, MIN(hr) AS t0, (SELECT MAX(hr) FROM h) AS t1
    FROM h GROUP BY event_type
),
spine AS (
    SELECT event_type, unnest(generate_series(t0, t1, INTERVAL '1 hour')) AS hr
    FROM bounds
),
filled AS (
    SELECT s.event_type, s.hr, COALESCE(h.n_events, 0) AS n_events
    FROM spine s LEFT JOIN h ON h.event_type = s.event_type AND h.hr = s.hr
),
w AS (
    SELECT event_type, hr, n_events,
           CAST({_EWMA_NUM} AS BIGINT) AS num,
           CAST({_EWMA_DEN} AS BIGINT) AS den
    FROM filled
)
SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour_ts, n_events,
       CAST(num AS DOUBLE) / den AS ewma,
       n_events >= {_EWMA_SPIKE_MIN}
       AND CAST(n_events AS DOUBLE) > {_EWMA_SPIKE_MULT!r} *
           (CAST(num AS DOUBLE) / den) AS is_spike
FROM w
"""


@register("events_ewma_hourly", _EWMA_SQL)
def q_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed hourly event volume per type with spike flags — the
    exponential-decay twin of the trailing-z-score monitors above.

    The sequential EWMA recurrence is re-expressed as a FINITE KERNEL
    CONVOLUTION: with α=1/2 the relative weight of lag j is exactly
    2^(24−j), so a 25-term lag window (one pass — all terms share the
    window spec) computes Σ n_{h−j}·2^(24−j) and the present-weight sum
    as BIGINT, and the smoothed value is one double division. Weights
    are exact powers of two (``customer_decay_score``'s idiom), the
    truncation error is 2^-25 of the oldest mass, and warm-up rows
    renormalize by the weights present instead of biasing low. The hour
    axis is the gap-filled spine of ``events_hourly_anomaly_gapfill``,
    so silent hours decay the average instead of vanishing.

    Scale shape: one hash agg to hourly counts, a tiny per-type spine,
    one window pass partitioned by type — no global sort, no iterative
    fold."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    t1 = h.agg(F.max("hr").alias("t1"))
    bounds = (
        h.groupBy("event_type")
        .agg(F.min("hr").alias("t0"))
        .crossJoin(F.broadcast(t1))
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
    )
    filled = spine.join(h, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
    )
    num_sql, den_sql = _ewma_terms(
        "lag(n_events, {j}) OVER (PARTITION BY event_type ORDER BY hr)",
        "n_events",
    )
    w = filled.withColumn("num", F.expr(num_sql).cast("bigint")).withColumn(
        "den", F.expr(den_sql).cast("bigint")
    )
    ewma = F.col("num").cast("double") / F.col("den")
    return w.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
        "n_events",
        ewma.alias("ewma"),
        (
            (F.col("n_events") >= _EWMA_SPIKE_MIN)
            & (F.col("n_events").cast("double") > _EWMA_SPIKE_MULT * ewma)
        ).alias("is_spike"),
    )


# --- clickstream path mining (top event-type trigrams within sessions) -----

_PATH_TOP = 10

_TOP_PATHS_SQL = f"""
WITH flagged AS (
    SELECT user_id, event_id, ts, event_type,
           CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {_SESSION_GAP_US}
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
    SELECT *, SUM(is_new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
),
tri AS (
    SELECT event_type
           || '>' || LEAD(event_type, 1) OVER s
           || '>' || LEAD(event_type, 2) OVER s AS path,
           CASE WHEN LEAD(session_id, 2) OVER s = session_id
                THEN 1 ELSE 0 END AS in_session
    FROM sessioned
    WINDOW s AS (PARTITION BY user_id ORDER BY ts, event_id)
),
cnt AS (
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM tri WHERE in_session = 1 AND path IS NOT NULL
    GROUP BY path
)
SELECT path, n_paths,
       CAST(n_paths AS DOUBLE)
           / CAST(SUM(n_paths) OVER () AS BIGINT) AS share
FROM cnt
ORDER BY n_paths DESC, path
LIMIT {_PATH_TOP}
"""


@register("events_top_paths", _TOP_PATHS_SQL)
def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path mining: the top-10 most common 3-step
    event-type paths that occur WITHIN one session (30-min-gap
    sessions, the ``events_sessionize`` rule), with each path's share
    of all session trigrams — the "how do users actually move"
    readout behind funnel design.

    Scale shape: sessionization and the two LEAD lookaheads share the
    SAME per-user window spec (one partitioned window pass — the
    sessionize lag, the running session sum, and the trigram leads all
    ride one shuffle by user); trigram counting is a map-side
    combinable hash agg on the path string; top-10 is TakeOrdered; the
    denominator is a 1-row broadcast."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            F.lag(F.unix_micros("ts")).over(w).isNull()
            | (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
                > _SESSION_GAP_US
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new_session"),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("is_new_session").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    tri = sessioned.select(
        F.concat_ws(
            ">",
            "event_type",
            F.lead("event_type", 1).over(w),
            F.lead("event_type", 2).over(w),
        ).alias("path"),
        F.when(
            F.lead("session_id", 2).over(w) == F.col("session_id"), 1
        )
        .otherwise(0)
        .alias("in_session"),
        F.lead("event_type", 2).over(w).alias("_third"),
    )
    cnt = (
        tri.filter((F.col("in_session") == 1) & F.col("_third").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
    )
    # denominator via an unordered global window over the path-count
    # table — BOUNDED at |event_types|^3 rows, and it keeps ONE pipeline
    # (a separate 1-row agg + crossJoin would re-execute the whole
    # session window upstream: no CSE across join branches)
    tot = F.sum("n_paths").over(W.partitionBy()).cast("bigint")
    return (
        cnt.select(
            "path",
            "n_paths",
            (F.col("n_paths").cast("double") / tot).alias("share"),
        )
        .orderBy(F.desc("n_paths"), "path")
        .limit(_PATH_TOP)
    )


# --- difference-in-differences readout -------------------------------------

_DID_SQL = f"""
WITH base AS (
    SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
               AS variant,
           CASE WHEN date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                     < {_AB_SPLIT_DAY} THEN 0 ELSE 1 END AS period,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           user_id
    FROM events
),
cell AS (
    SELECT variant, period,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM base GROUP BY 1, 2
),
m AS (
    SELECT variant, period, n_users,
           CAST(cents AS DOUBLE) / n_users / 100.0 AS mean_rev
    FROM cell
)
SELECT t1.mean_rev - t0.mean_rev AS treat_delta,
       c1.mean_rev - c0.mean_rev AS control_delta,
       (t1.mean_rev - t0.mean_rev) - (c1.mean_rev - c0.mean_rev) AS did,
       CAST(t0.n_users AS BIGINT) AS n_treat_pre,
       CAST(t1.n_users AS BIGINT) AS n_treat_post,
       CAST(c0.n_users AS BIGINT) AS n_control_pre,
       CAST(c1.n_users AS BIGINT) AS n_control_post
FROM m t0, m t1, m c0, m c1
WHERE t0.variant = 1 AND t0.period = 0 AND t1.variant = 1 AND t1.period = 1
  AND c0.variant = 0 AND c0.period = 0 AND c1.variant = 0 AND c1.period = 1
"""


@register("events_did_readout", _DID_SQL)
def q_events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout: per-user-mean revenue in the
    four (variant × pre/post) cells, the within-group deltas, and the
    DiD estimate (treatment delta minus control delta) — the
    observational counterpart of ``events_ab_cuped`` when assignment
    isn't randomized and pre-trends must be differenced out.

    Determinism: cell sums are exact BIGINT cents; per-cell means and
    the three deltas are fixed double-op sequences on identical
    integers. Scale shape: one hash agg to FOUR rows, then a
    conditional-aggregation pivot of those four rows into one — a
    filtered 4-way self-join would re-execute the corpus agg per cell
    (no CSE across join branches), so the pivot is a second 4-row agg
    on the SAME pipeline instead."""
    e = load_table(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
    base = e.select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("variant"),
        F.when(day < _AB_SPLIT_DAY, 0).otherwise(1).alias("period"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "user_id",
    )
    cell = base.groupBy("variant", "period").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum("cents").cast("bigint").alias("cents"),
    )
    m = cell.select(
        "variant",
        "period",
        "n_users",
        (F.col("cents").cast("double") / F.col("n_users") / 100.0).alias(
            "mean_rev"
        ),
    )

    def _pick(v: int, p: int, col: str):
        return F.max(
            F.when(
                (F.col("variant") == v) & (F.col("period") == p), F.col(col)
            )
        )

    joined = m.agg(
        _pick(1, 0, "mean_rev").alias("mr_t0"),
        _pick(1, 1, "mean_rev").alias("mr_t1"),
        _pick(0, 0, "mean_rev").alias("mr_c0"),
        _pick(0, 1, "mean_rev").alias("mr_c1"),
        _pick(1, 0, "n_users").alias("nu_t0"),
        _pick(1, 1, "n_users").alias("nu_t1"),
        _pick(0, 0, "n_users").alias("nu_c0"),
        _pick(0, 1, "n_users").alias("nu_c1"),
    )
    return joined.select(
        (F.col("mr_t1") - F.col("mr_t0")).alias("treat_delta"),
        (F.col("mr_c1") - F.col("mr_c0")).alias("control_delta"),
        (
            (F.col("mr_t1") - F.col("mr_t0"))
            - (F.col("mr_c1") - F.col("mr_c0"))
        ).alias("did"),
        F.col("nu_t0").cast("bigint").alias("n_treat_pre"),
        F.col("nu_t1").cast("bigint").alias("n_treat_post"),
        F.col("nu_c0").cast("bigint").alias("n_control_pre"),
        F.col("nu_c1").cast("bigint").alias("n_control_post"),
    )


# --- sample-ratio-mismatch guard --------------------------------------------

_SRM_SQL = f"""
WITH base AS (
    SELECT DISTINCT
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
               AS variant,
           CASE WHEN date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                     < {_AB_SPLIT_DAY} THEN 0 ELSE 1 END AS period,
           user_id
    FROM events
),
cell AS (
    SELECT period, variant, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM base GROUP BY 1, 2
),
p AS (
    SELECT period,
           CAST(MAX(CASE WHEN variant = 0 THEN n_users END) AS BIGINT)
               AS n_control,
           CAST(MAX(CASE WHEN variant = 1 THEN n_users END) AS BIGINT)
               AS n_treat
    FROM cell GROUP BY period
)
SELECT period, n_control, n_treat,
       (CAST(n_control AS DOUBLE)
            - (CAST(n_control AS DOUBLE) + CAST(n_treat AS DOUBLE)) / 2.0)
       * (CAST(n_control AS DOUBLE)
            - (CAST(n_control AS DOUBLE) + CAST(n_treat AS DOUBLE)) / 2.0)
       / ((CAST(n_control AS DOUBLE) + CAST(n_treat AS DOUBLE)) / 2.0)
       * 2.0 AS chi2,
       (CAST(n_control AS DOUBLE)
            - (CAST(n_control AS DOUBLE) + CAST(n_treat AS DOUBLE)) / 2.0)
       * (CAST(n_control AS DOUBLE)
            - (CAST(n_control AS DOUBLE) + CAST(n_treat AS DOUBLE)) / 2.0)
       / ((CAST(n_control AS DOUBLE) + CAST(n_treat AS DOUBLE)) / 2.0)
       * 2.0 > 3.841 AS srm_flag
FROM p
"""


@register("events_srm_check", _SRM_SQL)
def q_events_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard for the hash-split experiment: per
    period, the distinct-user counts landing in each variant and the
    1-df chi-square statistic against the designed 50/50 split
    (symmetric cells make it 2·(n_c − e)²/e with e = (n_c + n_t)/2).
    A flagged period means the assignment itself is broken — the
    readout (``events_ab_cuped``, ``events_did_readout``) is invalid no
    matter what the metric says; SRM is the first gate every experiment
    pipeline runs.

    Determinism: cells are exact distinct-user BIGINT counts; the
    statistic is a fixed double-op sequence on those integers (one
    hash-distinct + one agg, then a 2-row conditional pivot — same
    single-pipeline shape as ``events_did_readout``)."""
    e = load_table(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
    base = e.select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("variant"),
        F.when(day < _AB_SPLIT_DAY, 0).otherwise(1).alias("period"),
        "user_id",
    ).distinct()
    cell = base.groupBy("period", "variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    p = cell.groupBy("period").agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users")))
        .cast("bigint")
        .alias("n_control"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users")))
        .cast("bigint")
        .alias("n_treat"),
    )
    nc = F.col("n_control").cast("double")
    nt = F.col("n_treat").cast("double")
    expected = (nc + nt) / 2.0
    chi2 = (nc - expected) * (nc - expected) / expected * 2.0
    return p.select(
        "period",
        "n_control",
        "n_treat",
        chi2.alias("chi2"),
        (chi2 > 3.841).alias("srm_flag"),
    )


# --- telemetry debounce (adjacent-duplicate suppression) ---------------------

_DEBOUNCE_S = 5

_DEBOUNCE_SQL = f"""
WITH x AS (
    SELECT event_type, user_id, ts,
           date_diff('second',
                     LAG(ts) OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id),
                     ts) AS gap_s
    FROM events
),
f AS (
    SELECT event_type,
           CASE WHEN gap_s IS NULL OR gap_s >= {_DEBOUNCE_S}
                THEN 1 ELSE 0 END AS kept
    FROM x
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_debounced,
       CAST(COUNT(*) - SUM(kept) AS DOUBLE) / COUNT(*) AS debounce_rate
FROM f
GROUP BY event_type
"""


@register("events_debounce", _DEBOUNCE_SQL)
def q_events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce audit: per event type, how many events arrive
    within 5 s of the SAME user's previous event of that type
    (double-clicks, retry storms, SDK re-fires) and would be suppressed
    by a 5-second debounce — the ingestion-side dedup every event
    pipeline runs before sessionization.

    Predecessor-gap semantics (each event vs its immediate predecessor),
    deliberately NOT the greedy keep-first-then-reopen-window fold: the
    lag form is one window pass — exactly parallelizable — while the
    greedy fold is a sequential recurrence (see
    ``settled_running_balance`` for how the repo handles those when the
    semantics genuinely require it). One per-(user,type) window shuffle,
    then a hash agg to |event types| rows; integer-second gaps, no
    float anywhere."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    x = e.select(
        "event_type",
        gap.alias("gap_s"),
    )
    kept = F.when(
        F.col("gap_s").isNull() | (F.col("gap_s") >= _DEBOUNCE_S), 1
    ).otherwise(0)
    f = x.select("event_type", kept.alias("kept"))
    return f.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum("kept")).cast("bigint").alias(
            "n_debounced"
        ),
        (
            (F.count(F.lit(1)) - F.sum("kept")).cast("double")
            / F.count(F.lit(1))
        ).alias("debounce_rate"),
    )


# --- Kaplan-Meier time-to-conversion -----------------------------------------

_KM_HORIZON = 30

_KM_SQL = f"""
WITH RECURSIVE tv AS (
    SELECT user_id, MIN(ts) AS t_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
),
tp AS (
    SELECT e.user_id, MIN(e.ts) AS t_purch
    FROM events e JOIN tv ON tv.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= tv.t_view
    GROUP BY e.user_id
),
u AS (
    SELECT tv.user_id,
           CASE WHEN tp.t_purch IS NOT NULL
                     AND date_diff('day', CAST(tv.t_view AS DATE),
                                   CAST(tp.t_purch AS DATE)) <= {_KM_HORIZON}
                THEN date_diff('day', CAST(tv.t_view AS DATE),
                               CAST(tp.t_purch AS DATE))
                ELSE {_KM_HORIZON} END AS t,
           CASE WHEN tp.t_purch IS NOT NULL
                     AND date_diff('day', CAST(tv.t_view AS DATE),
                                   CAST(tp.t_purch AS DATE)) <= {_KM_HORIZON}
                THEN 1 ELSE 0 END AS converted
    FROM tv LEFT JOIN tp ON tp.user_id = tv.user_id
),
d AS (
    SELECT t AS day,
           CAST(SUM(converted) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_leaving
    FROM u GROUP BY t
),
r AS (
    SELECT day, n_events,
           CAST(SUM(n_leaving) OVER (ORDER BY day DESC) AS BIGINT) AS n_risk,
           ROW_NUMBER() OVER (ORDER BY day) AS rn
    FROM d
),
km AS (
    SELECT rn, day, n_events, n_risk,
           1.0 * (1.0 - CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE))
               AS survival
    FROM r WHERE rn = 1
    UNION ALL
    SELECT r.rn, r.day, r.n_events, r.n_risk,
           km.survival
               * (1.0 - CAST(r.n_events AS DOUBLE) / CAST(r.n_risk AS DOUBLE))
    FROM km JOIN r ON r.rn = km.rn + 1
)
SELECT day, n_risk, n_events, survival FROM km
"""


@register("events_survival_km", _KM_SQL)
def q_events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for view→purchase conversion: per
    day-since-first-view, the risk set, conversion events, and the KM
    estimate S(k) = Π_{j≤k} (1 − e_j/n_j), censoring users with no
    qualifying purchase at the 30-day horizon — the time-to-event lens
    funnels can't give (a funnel says IF users convert; KM says WHEN,
    with censoring handled correctly).

    Scale shape: ONE events pass — first-view arrives as a per-user
    window min on the same partitioning the per-user aggregate then
    reuses (a build-tv-then-join-twice form executes the upstream scan
    three times: no CSE across join branches), then the curve lives on
    ≤ horizon+1 rows — the risk-set window and the KM product run on
    that bounded table (same bounded-global-window budget as
    ``events_top_paths``). Determinism: the product is a strict
    day-ordered left-to-right fold — Spark folds a sorted collected
    array, the oracle walks a recursive CTE in the same order, so
    every intermediate double is identical (a SUM-of-logs rewrite
    would be order-free but transcendental — last-ulp ln differences
    across engines)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    t_view = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(wu)
    u0 = e.select(
        "user_id", "ts", "event_type", t_view.alias("t_view")
    ).filter(F.col("t_view").isNotNull())
    per_user = u0.groupBy("user_id").agg(
        F.min("t_view").alias("t_view"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("t_view")),
                F.col("ts"),
            )
        ).alias("t_purch"),
    )
    dd = F.datediff(
        F.col("t_purch").cast("date"), F.col("t_view").cast("date")
    )
    converted = F.col("t_purch").isNotNull() & (dd <= _KM_HORIZON)
    u = per_user.select(
        F.when(converted, dd).otherwise(F.lit(_KM_HORIZON)).alias("t"),
        F.when(converted, 1).otherwise(0).alias("converted"),
    )
    d = u.groupBy(F.col("t").alias("day")).agg(
        F.sum("converted").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_leaving"),
    )
    w = Window.orderBy(F.desc("day")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = d.select(
        "day",
        "n_events",
        F.sum("n_leaving").over(w).cast("bigint").alias("n_risk"),
    )
    # strict day-ordered KM fold: collect the bounded curve table into
    # one sorted array and build the running product left-to-right
    arr = r.agg(
        F.sort_array(
            F.collect_list(F.struct("day", "n_events", "n_risk"))
        ).alias("a")
    )
    km = arr.select(
        F.expr(
            "aggregate(a,"
            " CAST(array() AS ARRAY<STRUCT<day: BIGINT, n_risk: BIGINT,"
            "   n_events: BIGINT, survival: DOUBLE>>),"
            " (acc, x) -> array_append(acc, struct("
            "   CAST(x.day AS BIGINT) AS day,"
            "   x.n_risk AS n_risk,"
            "   x.n_events AS n_events,"
            "   coalesce(try_element_at(acc, -1).survival,"
            "     CAST(1.0 AS DOUBLE))"
            "     * (1.0 - CAST(x.n_events AS DOUBLE)"
            "         / CAST(x.n_risk AS DOUBLE)) AS survival)))"
        ).alias("curve")
    )
    return km.select(F.explode("curve").alias("p")).select(
        "p.day", "p.n_risk", "p.n_events", "p.survival"
    )


# --- bot / automation detection ----------------------------------------------

_BOT_MIN_EVENTS = 20
_BOT_RATE_PER_MIN = 2.0
_BOT_CV_MAX = 0.3

_BOT_SQL = f"""
WITH x AS (
    SELECT user_id, ts, event_type,
           date_diff('second',
                     LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id),
                     ts) AS gap_s
    FROM events
),
u AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS span_s,
           CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_s) AS BIGINT) AS sum_gap,
           CAST(SUM(gap_s * gap_s) AS BIGINT) AS sum_gap2,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM x GROUP BY user_id
),
m AS (
    SELECT u.user_id, u.n_events, u.span_s, u.n_types,
           CASE WHEN u.span_s > 0
                THEN CAST(u.n_events AS DOUBLE) / u.span_s * 60.0 END
               AS events_per_min,
           CASE WHEN u.n_gaps > 1 AND u.sum_gap > 0
                THEN sqrt((CAST(u.sum_gap2 AS DOUBLE)
                           - CAST(u.sum_gap AS DOUBLE)
                             * CAST(u.sum_gap AS DOUBLE) / u.n_gaps)
                          / (CAST(u.n_gaps AS DOUBLE) - 1.0))
                     / (CAST(u.sum_gap AS DOUBLE) / u.n_gaps) END AS gap_cv
    FROM u
)
SELECT user_id, n_events, span_s, n_types, events_per_min, gap_cv,
       (n_events >= {_BOT_MIN_EVENTS}
        AND (COALESCE(events_per_min, 0.0) > {_BOT_RATE_PER_MIN}
             OR COALESCE(gap_cv, 1e18) < {_BOT_CV_MAX})) AS bot_flag
FROM m
"""


@register("events_bot_detection", _BOT_SQL)
def q_events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic bot/automation screen per user: event volume, active
    span, sustained rate (events/min over the span), and the
    coefficient of variation of inter-arrival gaps — metronome-regular
    traffic (low CV) or inhuman sustained rates flag as bots. The
    cleaning pass every telemetry-derived training set runs before
    sessionization or funnel metrics trust the data.

    Scale shape: ONE per-user window pass produces the gaps, and the
    per-user aggregate reuses that partitioning (no second exchange);
    moments of the gap distribution come from exact BIGINT Σgap/Σgap²
    (integer seconds), so CV is a fixed double-op sequence — the same
    sufficient-statistics discipline as ``stats_moments``."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    x = e.select("user_id", "ts", "event_type", gap.alias("gap_s"))
    u = x.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
        .cast("bigint")
        .alias("span_s"),
        F.count("gap_s").cast("bigint").alias("n_gaps"),
        F.sum("gap_s").cast("bigint").alias("sum_gap"),
        F.sum(F.col("gap_s") * F.col("gap_s")).cast("bigint").alias(
            "sum_gap2"
        ),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
    )
    nd = F.col("n_gaps").cast("double")
    sg = F.col("sum_gap").cast("double")
    sg2 = F.col("sum_gap2").cast("double")
    rate = F.when(
        F.col("span_s") > 0,
        F.col("n_events").cast("double") / F.col("span_s") * 60.0,
    )
    cv = F.when(
        (F.col("n_gaps") > 1) & (F.col("sum_gap") > 0),
        F.sqrt((sg2 - sg * sg / F.col("n_gaps")) / (nd - 1.0))
        / (sg / F.col("n_gaps")),
    )
    m = u.select(
        "user_id",
        "n_events",
        "span_s",
        "n_types",
        rate.alias("events_per_min"),
        cv.alias("gap_cv"),
    )
    flag = (F.col("n_events") >= _BOT_MIN_EVENTS) & (
        (F.coalesce(F.col("events_per_min"), F.lit(0.0)) > _BOT_RATE_PER_MIN)
        | (F.coalesce(F.col("gap_cv"), F.lit(1e18)) < _BOT_CV_MAX)
    )
    return m.select(
        "user_id",
        "n_events",
        "span_s",
        "n_types",
        "events_per_min",
        "gap_cv",
        flag.alias("bot_flag"),
    )


# --- cohort LTV curves --------------------------------------------------------

_LTV_EPOCH = "2024-01-01"

_LTV_SQL = f"""
WITH w AS (
    SELECT user_id, event_type,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           date_diff('day', DATE '{_LTV_EPOCH}', CAST(ts AS DATE)) // 7
               AS week,
           MIN(date_diff('day', DATE '{_LTV_EPOCH}', CAST(ts AS DATE)) // 7)
               OVER (PARTITION BY user_id) AS cohort_week
    FROM events
),
uw AS (
    SELECT cohort_week, week - cohort_week AS week_offset,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents
                         ELSE 0 END) AS BIGINT) AS cents,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users
    FROM w GROUP BY 1, 2
),
cum AS (
    SELECT cohort_week, week_offset, n_active_users, cents,
           CAST(SUM(cents) OVER (PARTITION BY cohort_week
                ORDER BY week_offset) AS BIGINT) AS cum_cents,
           CAST(FIRST_VALUE(n_active_users) OVER (PARTITION BY cohort_week
                ORDER BY week_offset) AS BIGINT) AS n_cohort
    FROM uw
)
SELECT cohort_week, week_offset, n_cohort, n_active_users,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       CAST(cum_cents AS DOUBLE) / n_cohort / 100.0 AS cum_ltv_per_user
FROM cum
"""


@register("events_cohort_ltv", _LTV_SQL)
def q_events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: users cohorted by first-activity week, and per
    (cohort, weeks-since-acquisition) the active users, purchase
    revenue, and CUMULATIVE lifetime value per cohort user — the curve
    family behind every payback-period decision, and the monetized
    extension of ``events_retention_cohorts`` (retention counts who
    comes back; LTV weighs what they're worth).

    Scale shape: the cohort label is a per-user window min on the raw
    scan (same single-pass discipline as ``events_survival_km``), the
    matrix collapses to ≤ weeks² rows in one agg, and BOTH the running
    revenue and the cohort size (= active users at offset 0 — every
    user is active in their own first week) come from windows over that
    tiny matrix, so the scan is read exactly once; money is exact
    BIGINT cents until the final division."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(
            F.col("ts").cast("date"), F.lit(_LTV_EPOCH).cast("date")
        )
        / 7
    ).cast("bigint")
    wu = Window.partitionBy("user_id")
    w = e.select(
        "user_id",
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        week.alias("week"),
        F.min(week).over(wu).alias("cohort_week"),
    )
    uw = w.groupBy(
        "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("cents"),
        F.countDistinct("user_id").cast("bigint").alias("n_active_users"),
    )
    wc = Window.partitionBy("cohort_week").orderBy("week_offset")
    # cohort size == active users at offset 0: every user is active in
    # their own first week, so no second pass over the scan is needed
    cum = uw.select(
        "cohort_week",
        "week_offset",
        F.first("n_active_users").over(wc).cast("bigint").alias("n_cohort"),
        "n_active_users",
        "cents",
        F.sum("cents").over(wc).cast("bigint").alias("cum_cents"),
    )
    return cum.select(
        "cohort_week",
        "week_offset",
        "n_cohort",
        "n_active_users",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        (
            F.col("cum_cents").cast("double") / F.col("n_cohort") / 100.0
        ).alias("cum_ltv_per_user"),
    )


# ---------------------------------------------------------------------------
# Marketing attribution: first-touch vs last-touch revenue credit
# ---------------------------------------------------------------------------

_ATTR_SQL = """
WITH e AS (
    SELECT user_id, ts, event_id, event_type, value,
           CASE WHEN event_type IN ('view', 'click', 'signup')
                THEN event_type END AS touch
    FROM events
),
w AS (
    SELECT event_type, value,
           FIRST_VALUE(touch IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS first_touch,
           LAST_VALUE(touch IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS last_touch
    FROM e
),
p AS (
    SELECT COALESCE(first_touch, 'direct') AS ft,
           COALESCE(last_touch, 'direct') AS lt,
           value
    FROM w WHERE event_type = 'purchase'
)
SELECT 'first_touch' AS model, ft AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_revenue
FROM p GROUP BY 2
UNION ALL
SELECT 'last_touch', lt,
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
FROM p GROUP BY 2
"""


@register("events_attribution_first_last", _ATTR_SQL)
def q_attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue attribution: every purchase credits its value to the
    user's FIRST and LAST touch channel (view/click/signup) strictly
    before it; touchless purchases credit 'direct'.  One window pass
    (running first/last ignorenulls over the per-user event order), and
    the two models come from ONE purchase frame via an in-row explode —
    not a second branch, which would re-run the window pipeline (no CSE
    across union branches).  Money through DECIMAL(18,2) as everywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    touch = F.when(
        F.col("event_type").isin("view", "click", "signup"),
        F.col("event_type"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    enriched = (
        ev.select("user_id", "ts", "event_id", "event_type", "value")
        .withColumn("touch", touch)
        .withColumn("first_touch", F.first("touch", ignorenulls=True).over(w))
        .withColumn("last_touch", F.last("touch", ignorenulls=True).over(w))
    )
    p = enriched.filter(F.col("event_type") == "purchase").select(
        F.coalesce("first_touch", F.lit("direct")).alias("ft"),
        F.coalesce("last_touch", F.lit("direct")).alias("lt"),
        "value",
    )
    melted = p.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("first_touch").alias("model"),
                    F.col("ft").alias("channel"),
                ),
                F.struct(
                    F.lit("last_touch").alias("model"),
                    F.col("lt").alias("channel"),
                ),
            )
        ).alias("m"),
        "value",
    )
    return melted.groupBy(
        F.col("m.model").alias("model"), F.col("m.channel").alias("channel")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        money_sum("value").alias("attributed_revenue"),
    )


# --- sequential testing (SPRT) ----------------------------------------------

import math as _math

# SPRT on the purchase rate: H0 p=0.25 vs H1 p=0.375 (both binary-exact
# literals), alpha = beta = 0.05.  The log-likelihood-ratio increments
# and the Wald boundaries are computed ONCE here in Python and inlined
# as pre-quantized FLOOR(x * 2^20) INTEGER literals in BOTH engines —
# no engine evaluates a transcendental, so the entire test is integer
# arithmetic end-to-end (the strongest form of the drift family's
# quantization discipline).
_SPRT_P0, _SPRT_P1 = 0.25, 0.375
_SPRT_SCALE = 1 << 20
_SPRT_Q1 = _math.floor(_math.log(_SPRT_P1 / _SPRT_P0) * _SPRT_SCALE)
_SPRT_Q0 = _math.floor(
    _math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0)) * _SPRT_SCALE
)
_SPRT_QA = _math.floor(_math.log(0.95 / 0.05) * _SPRT_SCALE)  # accept H1
_SPRT_QB = _math.floor(_math.log(0.05 / 0.95) * _SPRT_SCALE)  # accept H0

_SPRT_SQL = f"""
WITH terms AS (
    SELECT event_id,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x,
           CASE WHEN event_type = 'purchase'
                THEN {_SPRT_Q1} ELSE {_SPRT_Q0} END AS term_q
    FROM events
),
cum AS (
    SELECT event_id, x,
           CAST(SUM(term_q) OVER (ORDER BY event_id) AS BIGINT) AS cum_q,
           CAST(ROW_NUMBER() OVER (ORDER BY event_id) AS BIGINT) AS idx
    FROM terms
),
crossing AS (
    SELECT idx, cum_q,
           CASE WHEN cum_q >= {_SPRT_QA} THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision
    FROM cum
    WHERE cum_q >= {_SPRT_QA} OR cum_q <= {_SPRT_QB}
    ORDER BY idx LIMIT 1
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(x) AS BIGINT) AS n_purchases
    FROM terms
)
SELECT t.n_events, t.n_purchases,
       COALESCE(c.decision, 'continue') AS decision,
       CAST(COALESCE(c.idx, -1) AS BIGINT) AS crossing_idx,
       CAST(COALESCE(c.cum_q, 0) AS BIGINT) AS crossing_cum_q
FROM tot t LEFT JOIN crossing c ON TRUE
"""


@register("events_sprt_sequential", _SPRT_SQL)
def q_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT on the purchase rate, scanned in arrival order
    (event_id) — the SEQUENTIAL rung of the experimentation family
    (SRM/CUPED/DiD test fixed samples; SPRT answers "when could we have
    stopped?").  Pre-quantized integer LLR increments make the whole
    test order-free integer arithmetic; the cumulative sum runs through
    the two-phase prefix machinery (equal-width buckets + broadcast
    offsets — no global sort-to-one-partition), and the first boundary
    crossing is a bounded 1-row reduce."""
    from ..functions.prefix import two_phase_cumsum

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    terms = ev.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("x"),
        F.when(F.col("event_type") == "purchase", F.lit(_SPRT_Q1))
        .otherwise(F.lit(_SPRT_Q0))
        .alias("term_q"),
    )
    cum = two_phase_cumsum(
        terms, "event_id", {"cum_q": "term_q", "idx": F.lit(1)}
    ).select(
        F.col("idx").cast("bigint").alias("idx"),
        "x",
        F.col("cum_q").cast("bigint").alias("cum_q"),
    )
    crossing = (
        cum.filter(
            (F.col("cum_q") >= _SPRT_QA) | (F.col("cum_q") <= _SPRT_QB)
        )
        .orderBy("idx")
        .limit(1)
        .select(
            "idx",
            "cum_q",
            F.when(F.col("cum_q") >= _SPRT_QA, F.lit("accept_h1"))
            .otherwise(F.lit("accept_h0"))
            .alias("decision"),
        )
    )
    tot = cum.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("x").cast("bigint").alias("n_purchases"),
    )
    # LEFT join on TRUE (not crossJoin): a never-crossing log must still
    # yield the totals row with decision='continue'
    return tot.join(F.broadcast(crossing), F.lit(True), "left").select(
        "n_events",
        "n_purchases",
        F.coalesce(F.col("decision"), F.lit("continue")).alias("decision"),
        F.coalesce(F.col("idx"), F.lit(-1)).cast("bigint").alias(
            "crossing_idx"
        ),
        F.coalesce(F.col("cum_q"), F.lit(0)).cast("bigint").alias(
            "crossing_cum_q"
        ),
    )


# --- sequential change detection #2: Page's CUSUM ---------------------------

# Wald's SPRT (above) tests a fixed pair of hypotheses; Page's CUSUM
# detects a PERSISTENT upward shift in a rate — the other classic
# sequential monitor.  All-integer form: deviation x_h = n_h·H − N per
# gap-filled hour (H spine hours, N total events per type — Σx = 0 by
# construction, no mean division anywhere), S_h = Σx prefix,
# C_h = S_h − min(0, min-prefix S) — the cumsum+running-min identity
# for the max(0, C+x) fold (the capped-balance rewrite), so the whole
# detector is two windows over a tiny per-type hourly series.
_CUSUM_T = 40  # alarm at ≥ 40 events of accumulated excess (C ≥ 40·H)

_CUSUM_SQL = f"""
WITH h AS (
    SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT event_type, MIN(hr) AS t0, (SELECT MAX(hr) FROM h) AS t1
    FROM h GROUP BY event_type
),
spine AS (
    SELECT event_type, unnest(generate_series(t0, t1, INTERVAL '1 hour')) AS hr
    FROM bounds
),
filled AS (
    SELECT s.event_type, s.hr, COALESCE(h.n_events, 0) AS n_events
    FROM spine s LEFT JOIN h ON h.event_type = s.event_type AND h.hr = s.hr
),
tot AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS hh,
           CAST(SUM(n_events) AS BIGINT) AS nn
    FROM filled GROUP BY event_type
),
cum AS (
    SELECT f.event_type, f.hr, f.n_events, t.hh,
           CAST(SUM(f.n_events * t.hh - t.nn) OVER (
               PARTITION BY f.event_type ORDER BY f.hr) AS BIGINT) AS s
    FROM filled f JOIN tot t USING (event_type)
),
cc AS (
    SELECT event_type, hr, n_events, hh, s,
           CAST(s - LEAST(0, MIN(s) OVER (
               PARTITION BY event_type ORDER BY hr)) AS BIGINT) AS cusum_q
    FROM cum
)
SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour_ts, n_events,
       cusum_q, cusum_q >= {_CUSUM_T} * hh AS alarm
FROM cc
"""


@register("events_cusum_hourly", _CUSUM_SQL)
def q_cusum_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's CUSUM over hourly event volume per type — the
    persistent-shift twin of the SPRT (which answers a fixed
    hypothesis test; CUSUM flags WHEN a rate drifted up and stays up,
    the drift-family's sequential rung).  Exactness: the deviation is
    the integer n_h·H − N (no mean division — it sums to zero over the
    series by construction), and the max(0, C+x) fold is rewritten as
    cumsum − running-min (the ``capped_running_balance`` identity), so
    the detector is TWO window passes over the gap-filled per-type
    hourly spine — tiny series, no iterative fold, bit-exact
    cross-engine.  Alarm = ≥ {_CUSUM_T} events of accumulated excess;
    measured at sf0.01 four of five types alarm (max excess ≈ 42-49
    events) — the synthetic corpus genuinely rate-drifts."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    t1 = h.agg(F.max("hr").alias("t1"))
    bounds = (
        h.groupBy("event_type")
        .agg(F.min("hr").alias("t0"))
        .crossJoin(F.broadcast(t1))
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("t0", "t1", F.expr("interval 1 hour"))
        ).alias("hr"),
    )
    filled = spine.join(h, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
    )
    tot = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("hh"),
        F.sum("n_events").cast("bigint").alias("nn"),
    )
    wo = W.partitionBy("event_type").orderBy("hr")
    cum = filled.join(F.broadcast(tot), "event_type").withColumn(
        "s",
        F.sum(
            F.col("n_events") * F.col("hh") - F.col("nn")
        ).over(wo).cast("bigint"),
    )
    cc = cum.withColumn(
        "cusum_q",
        (
            F.col("s")
            - F.least(F.lit(0).cast("bigint"), F.min("s").over(wo))
        ).cast("bigint"),
    )
    return cc.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
        "n_events",
        "cusum_q",
        (F.col("cusum_q") >= F.lit(_CUSUM_T) * F.col("hh")).alias("alarm"),
    )


# --- next-event prediction eval (round 8) -----------------------------------

_NE_SQL = """
WITH seq AS (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY user_id) AS n
    FROM events
),
pairs AS (
    SELECT a.user_id, a.event_type AS prior_type, b.event_type AS next_type,
           b.rn = b.n AS is_test
    FROM seq a JOIN seq b ON b.user_id = a.user_id AND b.rn = a.rn + 1
),
matrix AS (
    SELECT prior_type, next_type, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs WHERE NOT is_test GROUP BY 1, 2
),
pred AS (
    SELECT prior_type, next_type AS predicted FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY prior_type ORDER BY cnt DESC, next_type) AS rk
        FROM matrix
    ) WHERE rk = 1
),
test AS (
    SELECT user_id, prior_type, next_type FROM pairs WHERE is_test
),
evald AS (
    SELECT t.prior_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN p.predicted = t.next_type THEN 1 ELSE 0 END)
               AS BIGINT) AS n_correct
    FROM test t JOIN pred p ON p.prior_type = t.prior_type
    GROUP BY t.prior_type
)
SELECT prior_type, n_users, n_correct,
       CAST(n_correct AS DOUBLE) / n_users AS accuracy
FROM evald
"""


@register("events_next_event_eval", _NE_SQL)
def q_next_event_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-event prediction, leave-LAST-event-out:
    the transition matrix trains on every per-user transition except
    the final one, predicts argmax(next | prior) (count ties to the
    lexicographically smaller type), and scores accuracy against each
    user's held-out last event, grouped by prior type.  The sequence
    sibling of ``reco_cooccur_hitrate`` — the eval a session-based
    model is baselined against; the transition machinery is
    ``events_transition_matrix``'s (timed per-user window pass), all
    counts integer, one double division per row."""
    e = load_table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.row_number().over(wu).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("n"),
    )
    a = seq.select(
        "user_id", F.col("event_type").alias("prior_type"),
        F.col("rn").alias("ra"),
    )
    b = seq.select(
        "user_id", F.col("event_type").alias("next_type"),
        F.col("rn").alias("rb"), "n",
    )
    pairs = a.join(
        b, (a["user_id"] == b["user_id"]) & (F.col("rb") == F.col("ra") + 1)
    ).select(
        a["user_id"], "prior_type", "next_type",
        (F.col("rb") == F.col("n")).alias("is_test"),
    )
    matrix = (
        pairs.filter(~F.col("is_test"))
        .groupBy("prior_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    wp = W.partitionBy("prior_type").orderBy(F.desc("cnt"), F.asc("next_type"))
    pred = (
        matrix.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .select("prior_type", F.col("next_type").alias("predicted"))
    )
    test = pairs.filter(F.col("is_test")).select("prior_type", "next_type")
    return (
        test.join(F.broadcast(pred), "prior_type")
        .groupBy("prior_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(
                F.when(F.col("predicted") == F.col("next_type"), 1).otherwise(0)
            ).cast("bigint").alias("n_correct"),
        )
        .select(
            "prior_type",
            "n_users",
            "n_correct",
            (F.col("n_correct").cast("double") / F.col("n_users")).alias(
                "accuracy"
            ),
        )
    )
