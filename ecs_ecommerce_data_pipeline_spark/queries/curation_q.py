"""Training-corpus curation queries over ``documents`` / ``embeddings``:
chunking, scalar quantization, per-source quotas, pattern redaction, and
dataset manifests.

These extend the LLM-data-pipeline surface (dedup / sampling / text
quality already live in their own modules).  Everything here is map-only
or a single hash aggregation — the shapes that survive a 100 TB corpus:

* chunking is a per-row ``sequence``+``explode`` (no shuffle at all
  until the optional summary agg);
* int8 quantization is a per-row ``transform`` fold — each scalar step
  is ONE IEEE double op on both engines, so codes and reconstruction
  errors are bit-identical in Spark and DuckDB;
* quotas are a single row_number window per stratum (one shuffle, then
  map-side filtered);
* manifests are one hash agg with an order-independent fingerprint
  (sorted-id md5), the thing a dataset card pins.

Cross-engine determinism notes mirror ``catalog`` module docs: md5 (not
murmur) for anything hashed on both sides; BIGINT casts on integer sums
(DuckDB SUM(int) is HUGEINT); identical expression trees for float math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import register
from ..operators.curation import (
    chunk_documents,
    dataset_manifest,
    quantize_embeddings,
    quota_cap,
    redaction_stats,
)
from ..sources.testdata import load_table

_CHUNK = 200
_STRIDE = 150

_CHUNK_SQL = f"""
WITH starts AS (
    SELECT doc_id, text, n_chars,
           unnest(generate_series(0, greatest(n_chars - 1, 0), {_STRIDE}))
               AS chunk_start
    FROM documents
)
SELECT doc_id,
       CAST(chunk_start / {_STRIDE} AS BIGINT) AS chunk_id,
       CAST(chunk_start AS BIGINT) AS chunk_start,
       CAST(length(substring(text, chunk_start + 1, {_CHUNK})) AS BIGINT)
           AS chunk_len,
       md5(substring(text, chunk_start + 1, {_CHUNK})) AS chunk_md5
FROM starts
"""


@register("chunk_documents", _CHUNK_SQL)
def q_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking (200-char window, 150 stride):
    per-row sequence+explode, zero shuffle — the map that precedes
    tokenize-and-pack in a training pipeline."""
    doc = load_table(spark, sf_dir, "documents")
    return chunk_documents(doc, chunk=_CHUNK, stride=_STRIDE)


_QUANT_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
mm AS (
    SELECT vec_id, v,
           list_aggregate(v, 'min') AS vmin,
           list_aggregate(v, 'max') AS vmax
    FROM e
),
q AS (
    SELECT vec_id, v, vmin, vmax,
           list_transform(v, x -> CAST(floor(((x - vmin) / (vmax - vmin))
                                             * 254.0 + 0.5) AS INT) - 127)
               AS codes
    FROM mm
)
SELECT vec_id, vmin, vmax,
       array_to_string(codes, ',') AS codes_csv,
       list_aggregate(
           list_transform(range(1, len(v) + 1),
               i -> abs(v[i] - (vmin + (CAST(codes[i] + 127 AS DOUBLE)
                                        / 254.0) * (vmax - vmin)))),
           'max') AS max_abs_err
FROM q
"""


@register("quantize_embeddings", _QUANT_SQL)
def q_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization (min/max affine codes) with
    the max reconstruction error — map-only; every scalar step is a
    single IEEE double op, so codes match DuckDB bit-for-bit.

    The codes array is serialized to a CSV string (``codes_csv``) for
    the registered output: the driver canonicalizes results via pandas
    ``sort_values``, which cannot hash list cells, so no registered
    query may emit ArrayType columns (enforced repo-wide by
    tests/test_catalog_contract.py)."""
    q = quantize_embeddings(load_table(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        "vmin",
        "vmax",
        F.concat_ws(",", F.col("codes").cast("array<string>")).alias(
            "codes_csv"
        ),
        "max_abs_err",
    )


_QUOTA = 20

_QUOTA_SQL = f"""
WITH r AS (
    SELECT source, doc_id, n_chars,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM r
WHERE rk <= {_QUOTA}
GROUP BY source
"""


@register("quota_cap_per_source", _QUOTA_SQL)
def q_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source quota (keep the md5-first N docs of each
    source): the anti-domination cap a web-crawl corpus applies so no
    single domain swamps training."""
    doc = load_table(spark, sf_dir, "documents")
    return (
        quota_cap(doc, "source", "doc_id", _QUOTA)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


# Same literal patterns on both engines (Java regex ∩ RE2 subset: char
# classes, \\b word boundaries, bounded repeats — no lookaround).
_EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_TERM_PAT = "\\b(key|hash|table)\\b"

_REDACT_SQL = f"""
WITH m AS (
    SELECT lang,
           len(regexp_extract_all(text, '{_EMAIL_PAT}')) AS n_email,
           len(regexp_extract_all(text, '{_TERM_PAT}')) AS n_term,
           length(text)
             - length(regexp_replace(regexp_replace(text, '{_EMAIL_PAT}',
                                                    '<EMAIL>', 'g'),
                                     '{_TERM_PAT}', '<TERM>', 'g'))
               AS chars_delta
    FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_with_email,
       CAST(SUM(n_email) AS BIGINT) AS email_matches,
       CAST(SUM(n_term) AS BIGINT) AS term_matches,
       CAST(SUM(chars_delta) AS BIGINT) AS chars_redacted_delta
FROM m
GROUP BY lang
"""


@register("redaction_stats", _REDACT_SQL)
def q_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/pattern redaction audit per language: match counts and the
    net character delta of replacing emails and flagged terms — the
    scrubbing pass a corpus runs before training.  (This corpus has no
    emails; the email path is proven on injected data in
    tests/test_curation.py.)"""
    doc = load_table(spark, sf_dir, "documents")
    return redaction_stats(doc, email_pat=_EMAIL_PAT, term_pat=_TERM_PAT)


_MANIFEST_SQL = """
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
           AS membership_md5
FROM documents
GROUP BY source, lang
"""


@register("dataset_manifest", _MANIFEST_SQL)
def q_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card manifest per (source, lang): counts, char volume,
    id range, and an order-independent membership fingerprint (md5 of
    the sorted id list) — what a reproducible data release pins."""
    return dataset_manifest(load_table(spark, sf_dir, "documents"))


# --- per-source quantile normalization (cross-domain score calibration) ----

_QN_B = 32  # global equi-depth bins the per-source percentiles map onto

_QN_SQL = f"""
WITH cnts AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
              FROM documents GROUP BY 1),
cum AS (
    SELECT v, c,
           CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS hi,
           CAST(SUM(c) OVER (ORDER BY v) - c AS BIGINT) AS lo
    FROM cnts
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
bs AS (SELECT unnest(range(0, {_QN_B})) AS bin),
bounds AS (
    SELECT bin,
           CAST(bin + 1 AS DOUBLE) / {_QN_B} * (n - 1) AS pos,
           CAST(FLOOR(CAST(bin + 1 AS DOUBLE) / {_QN_B} * (n - 1)) AS BIGINT)
               AS fl,
           CAST(CEIL(CAST(bin + 1 AS DOUBLE) / {_QN_B} * (n - 1)) AS BIGINT)
               AS ce
    FROM bs CROSS JOIN tot
),
edges AS (
    SELECT b.bin,
           CAST(MIN(CASE WHEN b.fl >= c.lo AND b.fl < c.hi THEN c.v END)
               AS DOUBLE)
         + (MIN(CASE WHEN b.ce >= c.lo AND b.ce < c.hi THEN c.v END)
            - MIN(CASE WHEN b.fl >= c.lo AND b.fl < c.hi THEN c.v END))
           * (ANY_VALUE(b.pos) - ANY_VALUE(b.fl)) AS edge
    FROM bounds b JOIN cum c
      ON (b.fl >= c.lo AND b.fl < c.hi) OR (b.ce >= c.lo AND b.ce < c.hi)
    GROUP BY b.bin
),
ranked AS (
    SELECT doc_id, source, n_chars,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_chars, doc_id) - 1 AS BIGINT)
               AS rk,
           CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ns
    FROM documents
),
scored AS (
    SELECT doc_id, source, n_chars,
           CAST(rk AS DOUBLE) / GREATEST(1, ns - 1) AS src_pctl
    FROM ranked
)
SELECT s.doc_id, s.source, s.n_chars, s.src_pctl,
       CAST(LEAST({_QN_B} - 1, CAST(FLOOR(s.src_pctl * {_QN_B}) AS BIGINT))
           AS BIGINT) AS bin,
       e.edge AS norm_score
FROM scored s
JOIN edges e
  ON e.bin = LEAST({_QN_B} - 1, CAST(FLOOR(s.src_pctl * {_QN_B}) AS BIGINT))
"""


@register("quality_quantile_normalize", _QN_SQL)
def q_quality_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile normalization of a document score (the length
    proxy ``n_chars``) onto the GLOBAL score distribution — the standard
    calibration step before cross-domain quality filtering: a quality
    classifier's scores are not comparable across domains, so each doc's
    within-source percentile is mapped to the global distribution's
    value at that percentile (bucketed to 32 global equi-depth edges).

    Determinism: within-source percentiles are rank-based with a doc_id
    tiebreak (integers → one double division); global edges use the
    exact ``quantile_cont`` interpolation over order statistics, derived
    from BIGINT cumulative positions.

    Scale shape: the global edges reuse the two-phase prefix-sum order
    statistics of ``histogram_equidepth_scalable`` (no global sort —
    plan-gated there); the per-source rank is a partitioned window; the
    32-row edge table broadcasts into the final join. The corpus
    shuffles twice (value-count agg, source window) — both map-side
    bounded."""
    from ..functions.prefix import two_phase_cumsum

    docs = load_table(spark, sf_dir, "documents")
    vals = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cum = (
        two_phase_cumsum(vals, "v", {"hi": "c"})
        .withColumn("hi", F.col("hi").cast("bigint"))
        .withColumn("lo", (F.col("hi") - F.col("c")).cast("bigint"))
        .select("v", "c", "lo", "hi")
    )
    tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    bins = spark.range(_QN_B).select(F.col("id").alias("bin"))
    pos = (F.col("bin") + 1).cast("double") / _QN_B * (F.col("n") - 1)
    bounds = (
        bins.crossJoin(F.broadcast(tot))
        .select("bin", pos.alias("pos"))
        .withColumn("fl", F.floor("pos").cast("bigint"))
        .withColumn("ce", F.ceil("pos").cast("bigint"))
    )
    in_fl = (F.col("fl") >= F.col("lo")) & (F.col("fl") < F.col("hi"))
    in_ce = (F.col("ce") >= F.col("lo")) & (F.col("ce") < F.col("hi"))
    edges = (
        cum.crossJoin(F.broadcast(bounds))
        .filter(in_fl | in_ce)
        .groupBy("bin")
        .agg(
            F.min(F.when(in_fl, F.col("v"))).alias("vfl"),
            F.min(F.when(in_ce, F.col("v"))).alias("vce"),
            F.first("pos").alias("pos"),
            F.first("fl").alias("fl"),
        )
        .select(
            "bin",
            (
                F.col("vfl").cast("double")
                + (F.col("vce") - F.col("vfl"))
                * (F.col("pos") - F.col("fl"))
            ).alias("edge"),
        )
    )
    w = W.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "doc_id",
        "source",
        "n_chars",
        (F.row_number().over(w) - 1).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("source")).cast("bigint").alias("ns"),
    )
    scored = ranked.select(
        "doc_id",
        "source",
        "n_chars",
        (
            F.col("rk").cast("double")
            / F.greatest(F.lit(1).cast("bigint"), F.col("ns") - 1)
        ).alias("src_pctl"),
    )
    bin_expr = F.least(
        F.lit(_QN_B - 1).cast("bigint"),
        F.floor(F.col("src_pctl") * _QN_B).cast("bigint"),
    )
    return (
        scored.withColumn("bin", bin_expr)
        .join(F.broadcast(edges), "bin")
        .select(
            "doc_id", "source", "n_chars", "src_pctl", "bin",
            F.col("edge").alias("norm_score"),
        )
    )


# ---------------------------------------------------------------------------
# Label-noise audit (round 8): k-NN majority-vote disagreement
# ---------------------------------------------------------------------------
# Training-data label QA (confident-learning-lite): a point whose
# nearest neighbors overwhelmingly carry a DIFFERENT label is a
# mislabel candidate.  All-pairs k-NN is n²; round 8 blocked it on ONE
# 8-plane bucket (n²/256 — the quadratic-with-small-constant shape the
# image family outgrew, the round-8 weak grade); round 9 re-registers
# the audit on the image family's OR-amplified banding — 4 bands × 16
# planes (``operators.similarity.multiband_bucket_rows``): candidates
# are pairs sharing ANY 16-bit band, cutting the random-collision floor
# 256× (n²/2¹⁶ per band) while the band union keeps neighbor recall
# (a close pair only needs one intact band).  Exact cosine ranks the
# candidates; votes/flag semantics unchanged.

_LN_K = 10
_LN_MIN_NEIGH = 5
_LN_BANDS = 4
_LN_BITS = 16

_LN_PROJ = ",\n       ".join(
    "list_sum(list_transform(range(1, 65),"
    f" i -> CAST(FLOOR((v[i] * "
    f"(('0x' || substr(md5({p} || ':' || (i - 1)), 1, 15))::BIGINT"
    f" / 1152921504606846976.0 * 2.0 - 1.0)"
    f") * 1099511627776.0) AS BIGINT))) AS proj_{p}"
    for p in range(_LN_BANDS * _LN_BITS)
)


def _ln_band_bucket(b: int) -> str:
    return " + ".join(
        f"(CASE WHEN proj_{b * _LN_BITS + j} > 0"
        f" THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"
        for j in range(_LN_BITS)
    )


_LN_BANDS_UNION = "\n    UNION ALL ".join(
    f"SELECT vec_id, {b} AS band_idx,"
    f" CAST({_ln_band_bucket(b)} AS BIGINT) AS bucket FROM proj"
    for b in range(_LN_BANDS)
)

_LABEL_NOISE_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
proj AS (
    SELECT vec_id, v,
       {_LN_PROJ}
    FROM e
),
bnd AS (
    {_LN_BANDS_UNION}
),
feats AS (
    SELECT vec_id, v, label, sqrt(list_dot_product(v, v)) AS nrm FROM e
),
cand AS (
    SELECT DISTINCT a.vec_id AS aid, b.vec_id AS bid
    FROM bnd a JOIN bnd b
      ON b.band_idx = a.band_idx AND b.bucket = a.bucket
     AND b.vec_id <> a.vec_id
),
nn AS (
    SELECT aid AS vec_id, nlabel FROM (
        SELECT c.aid, fb.label AS nlabel,
               ROW_NUMBER() OVER (PARTITION BY c.aid ORDER BY
                   list_dot_product(fa.v, fb.v) / (fa.nrm * fb.nrm) DESC,
                   c.bid) AS rk
        FROM cand c
        JOIN feats fa ON fa.vec_id = c.aid
        JOIN feats fb ON fb.vec_id = c.bid
    ) WHERE rk <= {_LN_K}
),
votes AS (
    SELECT vec_id, nlabel, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM nn GROUP BY 1, 2
),
verdict AS (
    SELECT vec_id,
           CAST(SUM(cnt) AS BIGINT) AS n_neighbors,
           CAST(MAX(cnt) AS BIGINT) AS n_majority,
           CAST(-(MAX(struct_pack(c := cnt, n := -nlabel))).n AS BIGINT) AS majority_label
    FROM votes GROUP BY vec_id
)
SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
       v.n_neighbors, v.majority_label, v.n_majority,
       v.n_neighbors >= {_LN_MIN_NEIGH}
       AND v.majority_label <> e.label
       AND v.n_majority * 2 > v.n_neighbors AS flagged
FROM e JOIN verdict v ON v.vec_id = e.vec_id
"""


@register("curation_label_noise", _LABEL_NOISE_SQL)
def q_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabel candidates by k-NN majority vote, blocked scale-safe:
    candidates are pairs sharing ANY of 4 sixteen-plane LSH bands
    (``multiband_bucket_rows`` — the image family's OR-amplified
    banding on raw vectors, n²/2¹⁶ random-collision floor per band vs
    the retired single-bucket n²/2⁸), ranked by EXACT cosine, then the
    neighbor-label majority (smallest-label ties via the struct-max
    idiom) and a flag when a strict majority of ≥ {_LN_MIN_NEIGH}
    neighbors disagrees with the point's own label.  On the
    near-uniform testdata labels are ~independent of geometry, so flags
    are the calibration floor a real corpus is compared against; on the
    clustered fixture the banded audit reproduces the EXACT all-pairs
    audit flag-for-flag (tests/test_label_noise_banded.py).  Shape: the
    band self-join shuffles 2-integer rows, the distinct pair set joins
    the corpus features twice by id (no vector payload rides the
    blocking), one window per point over its bounded candidate list —
    every count integer, the flag pure integer arithmetic."""
    from ..operators.curation import knn_label_noise_audit

    return knn_label_noise_audit(
        load_table(spark, sf_dir, "embeddings"),
        k=_LN_K,
        min_neighbors=_LN_MIN_NEIGH,
        n_bands=_LN_BANDS,
        band_bits=_LN_BITS,
    )
