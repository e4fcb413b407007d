"""Corpus-curation operators: chunking, int8 quantization, per-source
quotas, pattern redaction, dataset manifests.

Reference context: the reference pipeline's transform stage
(``ecs/transformation/transform_task.py``) stops at KPI tables; these
operators extend the same engine surface to what a training-data
pipeline needs before tokenization.  All shapes are chosen for the
100 TB posture:

* ``chunk_documents`` — per-row ``sequence``+``explode``; no shuffle.
  Chunk count scales with document length, not corpus size, so the op
  is embarrassingly parallel and the output partitioning inherits the
  input's.
* ``quantize_embeddings`` — per-row higher-order-function folds
  (``transform``/``zip_with``/``array_min``); no shuffle, no UDF.
  Each scalar step is a single IEEE double operation with an identical
  expression tree in the DuckDB oracle, so outputs are bit-reproducible
  across engines and partitionings.
* ``quota_cap`` — one row_number window per stratum (single shuffle on
  the stratum key), then a map-side filter.  The md5 sort key makes the
  kept set a pure function of ids — rerun-stable, layout-independent.
* ``redaction_stats`` — map-only regexp passes (Java regex ∩ RE2
  subset so the oracle matches), one small hash agg.
* ``dataset_manifest`` — one hash agg; the membership fingerprint uses
  ``sort_array`` over a collected id list, which is bounded by group
  size (fine for per-(source,lang) cards; do not point it at a
  single-group corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    doc: DataFrame,
    chunk: int = 200,
    stride: int = 150,
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: str = "n_chars",
) -> DataFrame:
    """Overlapping fixed-window chunks: one output row per (doc, start).

    Start offsets are ``0, stride, 2*stride, ...`` while ``< n_chars``
    (a doc shorter than one stride still yields its single chunk).
    Emits the chunk's md5 rather than its text so the output stays
    narrow; callers that need the text re-derive it from (doc_id,
    chunk_start) against the source — cheaper than shuffling text
    bytes twice.
    """
    if stride <= 0 or chunk <= 0:
        raise ValueError("chunk and stride must be positive")
    starts = F.sequence(
        F.lit(0), F.greatest(F.col(len_col) - 1, F.lit(0)), F.lit(stride)
    )
    piece = F.col(text_col).substr(F.col("chunk_start") + 1, F.lit(chunk))
    return (
        doc.select(id_col, text_col, F.explode(starts).alias("chunk_start"))
        .select(
            id_col,
            (F.col("chunk_start") / stride).cast("bigint").alias("chunk_id"),
            F.col("chunk_start").cast("bigint").alias("chunk_start"),
            F.length(piece).cast("bigint").alias("chunk_len"),
            F.md5(piece).alias("chunk_md5"),
        )
    )


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Int8 scalar quantization with per-vector min/max calibration.

    ``code_i = floor((x_i - vmin)/(vmax - vmin) * 254 + 0.5) - 127`` —
    codes span [-127, 127] and reconstruct as
    ``vmin + (code+127)/254 * (vmax - vmin)``.  Also returns the max
    absolute reconstruction error per vector.  Degenerate constant
    vectors (vmax == vmin) would divide by zero; the synthetic corpus
    has none and a production caller should filter them first.
    """
    v = F.col(vec_col).cast("array<double>")
    df = emb.select(
        F.col(id_col),
        v.alias("v"),
        F.array_min(v).alias("vmin"),
        F.array_max(v).alias("vmax"),
    )
    vmin, vmax = F.col("vmin"), F.col("vmax")
    codes = F.transform(
        F.col("v"),
        lambda x: (
            F.floor(((x - vmin) / (vmax - vmin)) * F.lit(254.0) + F.lit(0.5))
        ).cast("int")
        - F.lit(127),
    )
    recon_err = F.zip_with(
        F.col("v"),
        F.col("codes"),
        lambda x, c: F.abs(
            x - (vmin + ((c + F.lit(127)).cast("double") / F.lit(254.0)) * (vmax - vmin))
        ),
    )
    return (
        df.withColumn("codes", codes)
        .withColumn("max_abs_err", F.array_max(recon_err))
        .select(id_col, "vmin", "vmax", "codes", "max_abs_err")
    )


def quota_cap(
    df: DataFrame, stratum_col: str, id_col: str, cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum, chosen by md5(id) order —
    a deterministic anti-domination cap (no ``rand()``, so reruns and
    repartitions keep the same rows)."""
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .drop("rk")
    )


def redaction_stats(
    doc: DataFrame,
    email_pat: str,
    term_pat: str,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Per-group audit of a two-pass regexp redaction (emails →
    ``<EMAIL>``, flagged terms → ``<TERM>``): match counts and the net
    character delta.  Patterns must stay in the Java-regex ∩ RE2 subset
    (char classes, ``\\b``, bounded repeats) for oracle parity."""
    text = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(text, F.lit(email_pat), 0))
    n_term = F.size(F.regexp_extract_all(text, F.lit(term_pat), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(text, email_pat, "<EMAIL>"), term_pat, "<TERM>"
    )
    m = doc.select(
        F.col(group_col),
        n_email.alias("n_email"),
        n_term.alias("n_term"),
        (F.length(text) - F.length(redacted)).alias("chars_delta"),
    )
    return m.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_email") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_with_email"),
        F.sum("n_email").cast("bigint").alias("email_matches"),
        F.sum("n_term").cast("bigint").alias("term_matches"),
        F.sum("chars_delta").cast("bigint").alias("chars_redacted_delta"),
    )


def redact(
    doc: DataFrame, email_pat: str, term_pat: str, text_col: str = "text"
) -> DataFrame:
    """The redaction itself (same passes ``redaction_stats`` audits):
    replaces ``text_col`` in place."""
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), email_pat, "<EMAIL>"),
        term_pat,
        "<TERM>",
    )
    return doc.withColumn(text_col, redacted)


def dataset_manifest(
    doc: DataFrame,
    group_cols: tuple[str, str] = ("source", "lang"),
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Per-group dataset card: counts, byte volume, id range, and an
    order-independent membership fingerprint (md5 of the sorted id
    list, comma-joined) — two manifests match iff the groups hold
    exactly the same ids."""
    ids_sorted = F.sort_array(F.collect_list(F.col(id_col)))
    fingerprint = F.md5(
        F.array_join(F.transform(ids_sorted, lambda x: x.cast("string")), ",")
    )
    return doc.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(size_col).cast("bigint").alias("total_chars"),
        F.min(id_col).cast("bigint").alias("min_doc_id"),
        F.max(id_col).cast("bigint").alias("max_doc_id"),
        fingerprint.alias("membership_md5"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
) -> DataFrame:
    """Clip a metric to its per-group [p_lo, p_hi] exact interpolated
    quantiles — the robust-statistics guard against pathological outliers
    (a 2 GB "document", a 10^6-item order) distorting downstream
    normalization or training-mix math.

    Adds ``<value_col>_winsorized`` (clipped, DOUBLE) and ``clipped``
    (was the row altered). Shape: one per-group quantile aggregation
    (grouping-bound memory — the exact/approx trade-off documented on
    ``stats_quantiles_exact`` applies), broadcast of the tiny threshold
    table, then a map-only clip of the fact side: the big table is
    scanned once and never shuffled.
    """
    thr = df.groupBy(group_col).agg(
        F.percentile(F.col(value_col), F.lit(p_lo)).alias("_lo"),
        F.percentile(F.col(value_col), F.lit(p_hi)).alias("_hi"),
    )
    v = F.col(value_col).cast("double")
    return (
        df.join(F.broadcast(thr), group_col)
        .withColumn(
            f"{value_col}_winsorized",
            F.least(F.greatest(v, F.col("_lo")), F.col("_hi")),
        )
        .withColumn("clipped", (v < F.col("_lo")) | (v > F.col("_hi")))
        .drop("_lo", "_hi")
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD robust outlier flags per group.

    Z-scores (``stats_outliers``) break down exactly when outliers are
    present — the outliers inflate the stddev that is supposed to expose
    them.  Median absolute deviation is 50%-breakdown robust: flag rows
    with |x − median| > k·MAD.

    Shape: two quantile aggregations (median, then median of
    deviations — inherently sequential), each followed by a broadcast of
    the tiny per-group threshold table; the fact side is scanned twice
    but never shuffled.  Adds ``dev`` and ``is_outlier``.
    """
    med = df.groupBy(group_col).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("_med")
    )
    dev = (
        df.join(F.broadcast(med), group_col)
        .withColumn("dev", F.abs(F.col(value_col).cast("double") - F.col("_med")))
        .drop("_med")
    )
    mad = dev.groupBy(group_col).agg(
        F.percentile(F.col("dev"), F.lit(0.5)).alias("_mad")
    )
    return (
        dev.join(F.broadcast(mad), group_col)
        .withColumn("is_outlier", F.col("dev") > F.lit(k) * F.col("_mad"))
        .drop("_mad")
    )


def knn_label_noise_audit(
    embeddings: DataFrame,
    k: int = 10,
    min_neighbors: int = 5,
    n_bands: int = 4,
    band_bits: int = 16,
    exact: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote label audit (confident-learning-lite): per
    point, rank its candidate neighbors by exact cosine, take the top
    ``k``, and flag the point when ≥ ``min_neighbors`` neighbors exist
    AND a strict majority of them carries a different label.  Returns
    (vec_id, label, n_neighbors, majority_label, n_majority, flagged).

    Candidate generation is the scale knob: the default blocks on
    ``n_bands`` × ``band_bits``-plane OR-amplified LSH bands
    (:func:`operators.similarity.multiband_bucket_rows` — candidates
    are pairs sharing ANY band, n²/2^band_bits collision floor per
    band), so no all-pairs stage exists anywhere; ``exact=True`` ranks
    ALL pairs instead — the quadratic reference the regression test
    compares the banded audit against on clustered fixtures (where
    true neighbors are genuinely close and band recall is ~1).

    Shape: the band self-join shuffles 2-integer rows; the distinct
    (aid, bid) set joins the feature frame twice BY ID (vector payload
    never rides the blocking join); one per-point window over the
    bounded candidate list; integer votes throughout."""
    from pyspark.sql.window import Window as W

    from .similarity import as_double_array, dot, multiband_bucket_rows, norm

    feats = embeddings.select(
        F.col(id_col).alias("_vid"),
        as_double_array(vec_col).alias("v"),
        F.col(label_col).alias("_label"),
    ).withColumn("nrm", norm(F.col("v")))
    if exact:
        cand = (
            feats.select(F.col("_vid").alias("aid"))
            .crossJoin(feats.select(F.col("_vid").alias("bid")))
            .filter(F.col("aid") != F.col("bid"))
        )
    else:
        # round 11 (guide §2.4): the n_bands×band_bits projection sweep
        # is the expensive map stage (64 quantized 64-dim dots per row at
        # the defaults) and BOTH sides of the band self-join need it —
        # materialize the (id, band_idx, bucket) rows once (3 integers
        # per band row) instead of projecting the corpus twice
        bnd = multiband_bucket_rows(
            embeddings, n_bands=n_bands, band_bits=band_bits,
            id_col=id_col, vec_col=vec_col,
        ).localCheckpoint(eager=False)
        cand = (
            bnd.select(F.col(id_col).alias("aid"), "band_idx", "bucket")
            .join(
                bnd.select(F.col(id_col).alias("bid"), "band_idx", "bucket"),
                ["band_idx", "bucket"],
            )
            .filter(F.col("aid") != F.col("bid"))
            .select("aid", "bid")
            .distinct()
        )
    fa = feats.select(
        F.col("_vid").alias("aid"), F.col("v").alias("av"),
        F.col("nrm").alias("anrm"),
    )
    fb = feats.select(
        F.col("_vid").alias("bid"), F.col("v").alias("bv"),
        F.col("nrm").alias("bnrm"), F.col("_label").alias("nlabel"),
    )
    w = W.partitionBy("aid").orderBy(F.desc("cos"), F.asc("bid"))
    nn = (
        cand.join(fa, "aid")
        .join(fb, "bid")
        .select(
            "aid",
            "bid",
            "nlabel",
            (dot(F.col("av"), F.col("bv")) / (F.col("anrm") * F.col("bnrm")))
            .alias("cos"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
    votes = nn.groupBy("aid", "nlabel").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    verdict = votes.groupBy("aid").agg(
        F.sum("cnt").cast("bigint").alias("n_neighbors"),
        F.max("cnt").cast("bigint").alias("n_majority"),
        (
            -F.max(F.struct(F.col("cnt"), (-F.col("nlabel")).alias("nl")))
            .getField("nl")
        ).cast("bigint").alias("majority_label"),
    )
    return (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(label_col).cast("bigint").alias("label"),
        )
        .join(verdict, F.col("vec_id") == F.col("aid"))
        .select(
            "vec_id",
            "label",
            "n_neighbors",
            "majority_label",
            "n_majority",
            (
                (F.col("n_neighbors") >= min_neighbors)
                & (F.col("majority_label") != F.col("label"))
                & (F.col("n_majority") * 2 > F.col("n_neighbors"))
            ).alias("flagged"),
        )
    )
