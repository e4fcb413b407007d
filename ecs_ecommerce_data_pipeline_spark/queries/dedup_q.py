"""Deduplication queries over ``documents`` (LLM-pipeline extension
surface). Spark side: ``operators.dedup``. Oracle side: the same
md5-based signature algebra in DuckDB SQL — every hash, band key and
Jaccard value is reproduced bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators import dedup
from ..operators.sampling import assign_split
from ..sources.testdata import cached_count, load_table

_NUM_HASHES = 8
_BAND_SIZE = 2
_MAX_BUCKET = 50
_SHINGLE_K = 3
_JACCARD_T = 0.5

_EXACT_SQL = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS text_hash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS canonical_doc_id
FROM documents
GROUP BY 1
"""


@register("dedup_exact", _EXACT_SQL)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(normalized text) — shuffles
    16-byte hashes, never full texts."""
    return dedup.exact_duplicates(load_table(spark, sf_dir, "documents"))


# Shared CTEs: tokens -> distinct k-word shingles -> exploded pairs ->
# per-seed md5 -> per-doc signature.
_SHINGLE_CTES = f"""
toks AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
    FROM documents
),
sh AS (
    SELECT doc_id,
           CASE WHEN len(t) < {_SHINGLE_K}
                THEN [array_to_string(t, ' ')]
                ELSE list_distinct(list_transform(
                         range(1, len(t) - {_SHINGLE_K} + 2),
                         i -> array_to_string(t[i : i + {_SHINGLE_K} - 1], ' ')))
                END AS shingles
    FROM toks
),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh)
"""

# Kirsch-Mitzenmacher double hashing: one md5 per shingle, two 60-bit
# halves, hash_i = h1 + i*h2 (matches operators.dedup.minhash_signatures).
_sig_aggs = ",\n       ".join(
    f"MIN(h1 + {i} * h2) AS sig_{i}" for i in range(_NUM_HASHES)
)

_SIG_CTES = f"""{_SHINGLE_CTES},
hashed AS (
    SELECT doc_id,
           ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h1,
           ('0x' || substr(md5(shingle), 16, 15))::BIGINT AS h2
    FROM ex
),
sigs AS (
    SELECT doc_id,
       {_sig_aggs}
    FROM hashed GROUP BY doc_id
)
"""

_MINHASH_SIG_SQL = f"""
WITH {_SIG_CTES}
SELECT * FROM sigs
"""


@register("dedup_minhash_signatures", _MINHASH_SIG_SQL)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature (8 seeds, min-md5-hex). One explode +
    one groupBy(doc_id)."""
    doc = load_table(spark, sf_dir, "documents")
    return dedup.minhash_signatures(
        dedup.shingle_docs(doc, k=_SHINGLE_K), num_hashes=_NUM_HASHES
    )


_band_selects = "\n    UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, "
    f"md5(sig_{b * _BAND_SIZE} || '|' || sig_{b * _BAND_SIZE + 1}) AS band_key FROM sigs"
    for b in range(_NUM_HASHES // _BAND_SIZE)
)

_CANDIDATES_CTES = f"""{_SIG_CTES},
bands AS (
    {_band_selects}
),
bucket_counts AS (
    SELECT band_idx, band_key, COUNT(*) AS n FROM bands GROUP BY 1, 2
),
kept AS (
    SELECT b.doc_id, b.band_idx, b.band_key
    FROM bands b JOIN bucket_counts c USING (band_idx, band_key)
    WHERE c.n <= {_MAX_BUCKET}
),
candidates AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM kept a JOIN kept b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
)
"""

# --- scale-adaptive MinHash banding (round 11) -------------------------------
#
# minhash_band_policy (operators.dedup) picks rows-per-band r from the
# corpus count; the candidate generator and the precision gate register
# the POLICY pick (round-10 verdict task 2), with the oracle re-deriving
# the ladder in SQL and banding at RUNTIME r — signatures unpivot to
# long format so the band key md5(slot_{b·r} || '|' || … ) is computable
# for any r without static enumeration.  The picked r is pinned as an
# output column, so the policy itself is hash-checked cross-engine
# (r = 2 at ≤512 docs, 4 to ~2M, 8 beyond — the defaults' ladder).
# Fixed-width variants stay where the oracle contract pins a sweep or
# recall number: dedup_lsh_tuning_curve IS the r-sweep experiment,
# dedup_recall_lsh_pairs prices recall at the documented (4×2, cap 50)
# config, and the verify-stage families (ngram_jaccard / fuzzy_verify /
# cc_clusters / incremental) pin verification semantics downstream of a
# fixed candidate set.

_MH_TARGET = "8.0"       # identical literal both engines
_MH_SLOT_BITS = 4

_MH_POLICY_CTE = f"""rq AS (
    SELECT CASE
        WHEN {_NUM_HASHES // 2}.0 * COUNT(*) / {1 << (_MH_SLOT_BITS * 2)}.0
             <= {_MH_TARGET} THEN 2
        WHEN {_NUM_HASHES // 4}.0 * COUNT(*) / {1 << (_MH_SLOT_BITS * 4)}.0
             <= {_MH_TARGET} THEN 4
        ELSE 8 END AS r
    FROM documents
)"""

_sigl_selects = "\n    UNION ALL ".join(
    f"SELECT doc_id, {i} AS i, sig_{i} AS sig FROM sigs"
    for i in range(_NUM_HASHES)
)

_CAND_AUTO_CTES = f"""{_SIG_CTES},
{_MH_POLICY_CTE},
sigl AS (
    {_sigl_selects}
),
abands AS (
    SELECT doc_id, i // r AS band_idx,
           md5(string_agg(CAST(sig AS VARCHAR), '|' ORDER BY i)) AS band_key
    FROM sigl CROSS JOIN rq
    GROUP BY doc_id, i // r
),
abucket_counts AS (
    SELECT band_idx, band_key, COUNT(*) AS n FROM abands GROUP BY 1, 2
),
akept AS (
    SELECT b.doc_id, b.band_idx, b.band_key
    FROM abands b JOIN abucket_counts c USING (band_idx, band_key)
    WHERE c.n <= {_MAX_BUCKET}
),
candidates_auto AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM akept a JOIN akept b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
)
"""

_MINHASH_CAND_SQL = f"""
WITH {_CAND_AUTO_CTES}
SELECT doc_a, doc_b,
       CAST((SELECT r FROM rq) AS BIGINT) AS band_size
FROM candidates_auto
"""


@register("dedup_minhash_candidates", _MINHASH_CAND_SQL)
def q_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding candidates at the POLICY-picked rows-per-band
    (``minhash_band_policy``: smallest r on the {2,4,8} ladder whose
    modeled random floor (8/r)·n·2^(-4r) fits 8 candidates/point —
    round-11 migration from the fixed 4×2 registration), bucket cap 50:
    the near-dup pair generator whose cost is Σ|bucket|² and whose
    RANDOM component stays linear in corpus size by construction.  The
    picked r is pinned as the ``band_size`` output column on every row,
    so the policy evaluates identically cross-engine (2 at sf0.001/
    sf0.01's 500 docs, 4 at sf0.1's 5000)."""
    doc = load_table(spark, sf_dir, "documents")
    r = dedup.minhash_band_policy(
        cached_count(spark, sf_dir, "documents"),
        num_hashes=_NUM_HASHES,
        target_candidates_per_point=float(_MH_TARGET),
        slot_match_bits=_MH_SLOT_BITS,
    )
    sigs = dedup.minhash_signatures(
        dedup.shingle_docs(doc, k=_SHINGLE_K), num_hashes=_NUM_HASHES
    )
    return dedup.lsh_candidate_pairs(
        sigs, num_hashes=_NUM_HASHES, band_size=r, max_bucket=_MAX_BUCKET
    ).withColumn("band_size", F.lit(r).cast("bigint"))


_JACCARD_SQL = f"""
WITH {_CANDIDATES_CTES},
exh AS (
    SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS sh_h FROM ex
),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM exh GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
    FROM candidates c
    JOIN exh ea ON ea.doc_id = c.doc_a
    JOIN exh eb ON eb.doc_id = c.doc_b AND eb.sh_h = ea.sh_h
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i.n_common)
           AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i.n_common)
      >= {_JACCARD_T}
"""


@register("dedup_ngram_jaccard", _JACCARD_SQL)
def q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard verification over the LSH candidates
    (LSH blocks, Jaccard verifies — the standard two-stage near-dup
    pipeline). Set arithmetic on exploded shingles; int/int division."""
    doc = load_table(spark, sf_dir, "documents")
    shingles = dedup.shingle_docs(doc, k=_SHINGLE_K)
    # round 11: tokenize+shingle+md5 runs ONCE — the checkpointed
    # (doc, h1, h2) frame feeds the signature build AND the verify
    # (md5_bigint's key is exactly h1)
    hashes = dedup.shingle_hashes(shingles).localCheckpoint(eager=False)
    sigs = dedup.minhash_signatures_from_hashes(hashes, num_hashes=_NUM_HASHES)
    cands = dedup.lsh_candidate_pairs(
        sigs, num_hashes=_NUM_HASHES, band_size=_BAND_SIZE, max_bucket=_MAX_BUCKET
    )
    return dedup.jaccard_pairs(shingles, cands, threshold=_JACCARD_T, hashes=hashes)


_SIMHASH_SQL = """
WITH toks AS (
    SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t
    FROM documents
),
ex AS (SELECT doc_id, unnest(t) AS tok FROM toks),
h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM ex),
bits AS (
    SELECT doc_id, b,
           SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
    FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS b)
    GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0::BIGINT END) AS BIGINT)
           AS simhash
FROM bits GROUP BY doc_id
"""


@register("dedup_simhash", _SIMHASH_SQL)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (sign-aggregated token hashes);
    near-dups land at small Hamming distance. Integer-exact."""
    return dedup.simhash(load_table(spark, sf_dir, "documents"), bits=32)


_PREFIX_LEN = 80

_FUZZY_SQL = f"""
WITH {_CANDIDATES_CTES},
nt AS (
    SELECT doc_id,
           substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                  1, {_PREFIX_LEN}) AS prefix
    FROM documents
)
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_distance,
       1.0 - CAST(levenshtein(a.prefix, b.prefix) AS DOUBLE)
             / greatest(length(a.prefix), length(b.prefix), 1)
           AS prefix_similarity
FROM candidates c
JOIN nt a ON c.doc_a = a.doc_id
JOIN nt b ON c.doc_b = b.doc_id
"""


@register("dedup_fuzzy_verify", _FUZZY_SQL)
def q_fuzzy_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein verification over LSH candidates — the character-level
    verify stage (vs ``dedup_ngram_jaccard``'s set-level one). Cost is
    bounded at |candidates|·prefix², never n²·len²."""
    doc = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(
        dedup.shingle_docs(doc, k=_SHINGLE_K), num_hashes=_NUM_HASHES
    )
    cands = dedup.lsh_candidate_pairs(
        sigs, num_hashes=_NUM_HASHES, band_size=_BAND_SIZE, max_bucket=_MAX_BUCKET
    )
    return dedup.fuzzy_verify_pairs(doc, cands, prefix_len=_PREFIX_LEN)


_CC_SQL = f"""
WITH RECURSIVE {_CANDIDATES_CTES},
und AS (
    SELECT doc_a AS u, doc_b AS v FROM candidates
    UNION ALL
    SELECT doc_b, doc_a FROM candidates
),
cc_nodes AS (SELECT DISTINCT u AS node FROM und),
reach(node, r) AS (
    SELECT node, node FROM cc_nodes
    UNION
    SELECT e.v, r.r FROM reach r JOIN und e ON e.u = r.node
),
labeled AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT component,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(node) AS BIGINT) AS sum_members
FROM labeled
GROUP BY component
"""


@register("dedup_cc_clusters", _CC_SQL)
def q_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS from candidate PAIRS: iterative min-label
    connected components (the step that turns pairwise LSH output into
    keep-one-per-cluster decisions). Oracle is a recursive-CTE
    transitive closure — the Spark side must reach the identical
    fixpoint. Component id = min doc_id (the canonical survivor)."""
    doc = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(
        dedup.shingle_docs(doc, k=_SHINGLE_K), num_hashes=_NUM_HASHES
    )
    cands = dedup.lsh_candidate_pairs(
        sigs, num_hashes=_NUM_HASHES, band_size=_BAND_SIZE, max_bucket=_MAX_BUCKET
    )
    cc = dedup.connected_components(cands)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("node").cast("bigint").alias("sum_members"),
    )


_DEDUP_SUMMARY_SQL = f"""
WITH RECURSIVE {_CANDIDATES_CTES},
und AS (
    SELECT doc_a AS u, doc_b AS v FROM candidates
    UNION ALL
    SELECT doc_b, doc_a FROM candidates
),
cc_nodes AS (SELECT DISTINCT u AS node FROM und),
reach(node, r) AS (
    SELECT node, node FROM cc_nodes
    UNION
    SELECT e.v, r.r FROM reach r JOIN und e ON e.u = r.node
),
labeled AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
clusters AS (SELECT component, COUNT(*) AS n_members FROM labeled GROUP BY 1),
tot AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT CAST(tot.n_docs AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(c.n_members), 0) AS BIGINT) AS n_docs_in_clusters,
       CAST(COUNT(c.component) AS BIGINT) AS n_clusters,
       CAST(COALESCE(SUM(c.n_members - 1), 0) AS BIGINT) AS n_removable,
       CAST(COALESCE(SUM(c.n_members - 1), 0) AS DOUBLE)
           / CAST(tot.n_docs AS DOUBLE) AS dedup_ratio
FROM tot LEFT JOIN clusters c ON TRUE
GROUP BY tot.n_docs
"""


@register("dedup_summary", _DEDUP_SUMMARY_SQL)
def q_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level dedup report: how many docs sit in near-dup clusters
    and what fraction of the corpus keep-one-per-cluster would remove —
    the number a curation run actually reports. Built on the CC
    clustering; total-docs side is a 1-row broadcast."""
    doc = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(
        dedup.shingle_docs(doc, k=_SHINGLE_K), num_hashes=_NUM_HASHES
    )
    cands = dedup.lsh_candidate_pairs(
        sigs, num_hashes=_NUM_HASHES, band_size=_BAND_SIZE, max_bucket=_MAX_BUCKET
    )
    clusters = (
        dedup.connected_components(cands)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )
    tot = doc.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        F.broadcast(tot)
        .crossJoin(
            clusters.agg(
                F.coalesce(F.sum("n_members"), F.lit(0)).alias("n_in"),
                F.count(F.lit(1)).alias("n_clusters"),
                F.coalesce(F.sum(F.col("n_members") - 1), F.lit(0)).alias("n_rm"),
            )
        )
        .select(
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_in").cast("bigint").alias("n_docs_in_clusters"),
            F.col("n_clusters").cast("bigint").alias("n_clusters"),
            F.col("n_rm").cast("bigint").alias("n_removable"),
            (F.col("n_rm").cast("double") / F.col("n_docs").cast("double"))
            .alias("dedup_ratio"),
        )
    )


# --- incremental dedup: new batch vs existing corpus -----------------------

_KEPT_CTES = _CANDIDATES_CTES.split(",\ncandidates AS")[0]

_INCR_CAND_SQL = f"""
WITH {_KEPT_CTES},
flagged AS (
    SELECT doc_id, band_idx, band_key,
           CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS is_new
    FROM kept
),
candidates AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM flagged a JOIN flagged b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    WHERE a.is_new = 1 OR b.is_new = 1
)
SELECT doc_a, doc_b FROM candidates
"""


@register("dedup_incremental_candidates", _INCR_CAND_SQL)
def q_incremental_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup candidates: documents with doc_id % 5 = 0
    play the newly-ingested batch, the rest the existing corpus. Only
    buckets containing a batch doc reach the pair explode, and only
    new×old / new×new pairs emit — the O(batch), not O(corpus), dedup
    path a daily-ingest pipeline runs (``operators.dedup.
    incremental_lsh_candidates``)."""
    doc = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(
        dedup.shingle_docs(doc, k=_SHINGLE_K), num_hashes=_NUM_HASHES
    ).withColumn("is_new", (F.col("doc_id") % 5 == 0).cast("int"))
    return dedup.incremental_lsh_candidates(
        sigs,
        num_hashes=_NUM_HASHES,
        band_size=_BAND_SIZE,
        max_bucket=_MAX_BUCKET,
    )


# --- survivor selection: keep the best-quality doc per cluster -------------

_KEEP_BEST_SQL = f"""
WITH RECURSIVE {_CANDIDATES_CTES},
und AS (
    SELECT doc_a AS u, doc_b AS v FROM candidates
    UNION ALL
    SELECT doc_b, doc_a FROM candidates
),
cc_nodes AS (SELECT DISTINCT u AS node FROM und),
reach(node, r) AS (
    SELECT node, node FROM cc_nodes
    UNION
    SELECT e.v, r.r FROM reach r JOIN und e ON e.u = r.node
),
labeled AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
enriched AS (
    SELECT l.node, l.component, d.n_chars
    FROM labeled l JOIN documents d ON d.doc_id = l.node
)
SELECT component,
       CAST(n_members AS BIGINT) AS n_members,
       CAST(node AS BIGINT) AS kept_doc_id,
       CAST(n_chars AS BIGINT) AS kept_n_chars
FROM (
    SELECT *,
           COUNT(*) OVER (PARTITION BY component) AS n_members,
           ROW_NUMBER() OVER (
               PARTITION BY component ORDER BY n_chars DESC, node) AS rn
    FROM enriched
)
WHERE rn = 1
"""


@register("dedup_keep_best_quality", _KEEP_BEST_SQL)
def q_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor SELECTION policy: near-dup clusters keep their
    best-quality member (longest text, ties to the smallest doc_id) —
    the policy step after clustering that production dedup actually
    ships (min-id canonical is a label, not a keep decision).

    Scale shape: the per-cluster window is bounded by cluster size
    (near-cliques from LSH), never corpus-sized; the quality join is an
    equi-join on doc_id."""
    from pyspark.sql import Window

    doc = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(
        dedup.shingle_docs(doc, k=_SHINGLE_K), num_hashes=_NUM_HASHES
    )
    cands = dedup.lsh_candidate_pairs(
        sigs, num_hashes=_NUM_HASHES, band_size=_BAND_SIZE, max_bucket=_MAX_BUCKET
    )
    labels = dedup.connected_components(cands)
    enriched = labels.join(
        doc.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    w = Window.partitionBy("component")
    ranked = enriched.select(
        "component",
        "node",
        "n_chars",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_members"),
        F.row_number()
        .over(w.orderBy(F.desc("n_chars"), F.asc("node")))
        .alias("rn"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "component",
        "n_members",
        F.col("node").cast("bigint").alias("kept_doc_id"),
        F.col("n_chars").cast("bigint").alias("kept_n_chars"),
    )


# --- dedup QUALITY gates: LSH recall + cross-source overlap ----------------

_RECALL_MAX_ID = 500

_LSH_RECALL_SQL = f"""
WITH {_CANDIDATES_CTES},
sub AS (SELECT * FROM ex WHERE doc_id < {_RECALL_MAX_ID}),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sub GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(*) AS BIGINT) AS i
    FROM sub a JOIN sub b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
truth AS (
    SELECT i.da, i.db
    FROM inter i JOIN sizes sa ON sa.doc_id = i.da
                 JOIN sizes sb ON sb.doc_id = i.db
    WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= {_JACCARD_T}
),
cand AS (
    SELECT doc_a, doc_b FROM candidates
    WHERE doc_a < {_RECALL_MAX_ID} AND doc_b < {_RECALL_MAX_ID}
),
caught AS (
    SELECT t.da FROM truth t JOIN cand c ON t.da = c.doc_a AND t.db = c.doc_b
)
SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
       CAST((SELECT COUNT(*) FROM caught) AS BIGINT) AS n_caught,
       CASE WHEN (SELECT COUNT(*) FROM truth) > 0
            THEN CAST((SELECT COUNT(*) FROM caught) AS DOUBLE)
                 / (SELECT COUNT(*) FROM truth)
       END AS recall
"""


@register("dedup_recall_lsh_pairs", _LSH_RECALL_SQL)
def q_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH dedup RECALL gate: exact all-pairs Jaccard ground truth on a
    deterministic audit slice (doc_id < 500) vs the production LSH
    candidate set restricted to the same slice — the fraction of true
    ≥-threshold pairs the banding actually catches. The gold standard
    is quadratic, which is exactly why it runs on a bounded slice; the
    candidates come from the FULL-corpus banding (deployed config), so
    the number grades what production would ship."""
    doc = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_docs(doc, k=_SHINGLE_K)
    # round 11 (guide §2.4): the audit slice feeds the self-join's BOTH
    # sides plus the size agg — cut the bounded (doc_id < max) shingle
    # rows once instead of re-tokenizing the slice three times
    sub = sh.filter(F.col("doc_id") < _RECALL_MAX_ID).localCheckpoint(
        eager=False
    )
    sizes = sub.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = sub.select(F.col("doc_id").alias("da"), "shingle")
    b = sub.select(F.col("doc_id").alias("db"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    truth = (
        inter.join(sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na")), "da")
        .join(sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb")), "db")
        .filter(
            F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
            >= _JACCARD_T
        )
        .select("da", "db")
        # feeds both the semi-join and the truth count — one cut
        .localCheckpoint(eager=False)
    )
    sigs = dedup.minhash_signatures(sh, num_hashes=_NUM_HASHES)
    cand = dedup.lsh_candidate_pairs(
        sigs, num_hashes=_NUM_HASHES, band_size=_BAND_SIZE, max_bucket=_MAX_BUCKET
    ).filter(
        (F.col("doc_a") < _RECALL_MAX_ID) & (F.col("doc_b") < _RECALL_MAX_ID)
    )
    caught = truth.join(
        cand,
        (F.col("da") == F.col("doc_a")) & (F.col("db") == F.col("doc_b")),
        "left_semi",
    )
    nt = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    nc = caught.agg(F.count(F.lit(1)).cast("bigint").alias("n_caught"))
    return nt.crossJoin(nc).select(
        "n_truth",
        "n_caught",
        F.when(
            F.col("n_truth") > 0,
            F.col("n_caught").cast("double") / F.col("n_truth").cast("double"),
        ).alias("recall"),
    )


# --- LSH banding tuning curve (the (b, r) analogue of the nprobe sweep) ------

# (n_bands, rows_per_band) over the SAME 8-hash signatures: the S-curve
# trade — more rows per band = sharper threshold (fewer candidates,
# lower recall below t); more bands = higher recall, more candidates.
_TUNE_CONFIGS = [(8, 1), (4, 2), (2, 4), (1, 8)]


def _tuning_sql() -> str:
    band_selects = []
    for cfg, (n_bands, r) in enumerate(_TUNE_CONFIGS):
        for b in range(n_bands):
            key = " || '|' || ".join(
                f"CAST(sig_{b * r + j} AS VARCHAR)" for j in range(r)
            )
            band_selects.append(
                f"SELECT doc_id, {cfg} AS cfg, {b} AS band_idx,"
                f" md5({key}) AS band_key FROM ssig"
            )
    allbands = "\n    UNION ALL ".join(band_selects)
    cfg_rows = "\n    UNION ALL ".join(
        f"SELECT {cfg} AS cfg, {nb} AS n_bands, {r} AS rows_per_band"
        for cfg, (nb, r) in enumerate(_TUNE_CONFIGS)
    )
    return f"""
WITH {_SIG_CTES},
ssig AS (SELECT * FROM sigs WHERE doc_id < {_RECALL_MAX_ID}),
sub AS (SELECT * FROM ex WHERE doc_id < {_RECALL_MAX_ID}),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sub GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(*) AS BIGINT) AS i
    FROM sub a JOIN sub b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
truth AS (
    SELECT i.da, i.db
    FROM inter i JOIN sizes sa ON sa.doc_id = i.da
                 JOIN sizes sb ON sb.doc_id = i.db
    WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= {_JACCARD_T}
),
allbands AS (
    {allbands}
),
cand AS (
    SELECT DISTINCT a.cfg, a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM allbands a JOIN allbands b
      ON a.cfg = b.cfg AND a.band_idx = b.band_idx
     AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
ncand AS (SELECT cfg, COUNT(*) AS n_candidates FROM cand GROUP BY cfg),
ncaught AS (
    SELECT c.cfg, COUNT(*) AS n_caught
    FROM cand c JOIN truth t ON t.da = c.doc_a AND t.db = c.doc_b
    GROUP BY c.cfg
),
cfgs AS (
    {cfg_rows}
)
SELECT CAST(cfgs.n_bands AS BIGINT) AS n_bands,
       CAST(cfgs.rows_per_band AS BIGINT) AS rows_per_band,
       CAST(COALESCE(nc.n_candidates, 0) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true_pairs,
       CAST(COALESCE(ng.n_caught, 0) AS BIGINT) AS n_caught
FROM cfgs
LEFT JOIN ncand nc ON nc.cfg = cfgs.cfg
LEFT JOIN ncaught ng ON ng.cfg = cfgs.cfg
"""


@register("dedup_lsh_tuning_curve", _tuning_sql())
def q_lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding S-curve measured, not guessed: from ONE 8-hash signature
    build, every (bands × rows-per-band) factorization — (8,1), (4,2),
    (2,4), (1,8) — scored for candidate volume and true-pair recall
    against the exact all-pairs Jaccard truth.  The nprobe-sweep
    methodology applied to the dedup side: the table an operator reads
    before picking the production banding.

    Shape: the gold standard is quadratic, so (like the recall gate) it
    runs on the bounded audit slice (doc_id < {max_id}); all four
    bandings ride one config-tagged explode over the SAME signature
    frame — one scan, one bucket agg keyed (cfg, band, key), one pair
    explode — so the sweep costs one banding pass, not four pipelines.
    Candidates are uncapped here (the cap is a production guard, not
    part of the S-curve being measured).  All outputs integers.
    """
    doc = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _RECALL_MAX_ID
    )
    # round 11 (guide §2.4): the slice's shingles feed the signature
    # build, the size agg and both truth self-join sides — cut once
    sh = dedup.shingle_docs(doc, k=_SHINGLE_K).localCheckpoint(eager=False)
    sigs = dedup.minhash_signatures(sh, num_hashes=_NUM_HASHES)

    band_structs = []
    for cfg, (n_bands, r) in enumerate(_TUNE_CONFIGS):
        for b in range(n_bands):
            slots = [F.col(f"sig_{b * r + j}") for j in range(r)]
            band_structs.append(
                F.struct(
                    F.lit(cfg).alias("cfg"),
                    F.lit(b).alias("band_idx"),
                    F.md5(F.concat_ws("|", *slots)).alias("band_key"),
                )
            )
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bd")
    ).select("doc_id", "bd.cfg", "bd.band_idx", "bd.band_key")
    buckets = banded.groupBy("cfg", "band_idx", "band_key").agg(
        F.sort_array(F.collect_list("doc_id")).alias("docs")
    )
    pairs = (
        buckets.filter(F.size("docs") >= 2)
        .select("cfg", F.posexplode("docs").alias("pos", "doc_a"), "docs")
        .select(
            "cfg",
            "doc_a",
            F.explode(
                F.slice("docs", F.col("pos") + 2, F.size("docs"))
            ).alias("doc_b"),
        )
        .distinct()
        # feeds the candidate count AND the caught join — one cut
        .localCheckpoint(eager=False)
    )

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = sh.select(F.col("doc_id").alias("da"), "shingle")
    b = sh.select(F.col("doc_id").alias("db"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    truth = (
        inter.join(
            sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na")), "da"
        )
        .join(
            sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb")), "db"
        )
        .filter(
            F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
            >= _JACCARD_T
        )
        .select("da", "db")
        # the quadratic gold standard feeds the caught join AND the
        # truth count — never run it twice
        .localCheckpoint(eager=False)
    )

    ncand = pairs.groupBy("cfg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    ncaught = (
        pairs.join(
            truth,
            (F.col("doc_a") == F.col("da")) & (F.col("doc_b") == F.col("db")),
        )
        .groupBy("cfg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_caught"))
    )
    ntrue = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_true_pairs"))
    cfg_meta = spark.createDataFrame(
        [(cfg, nb, r) for cfg, (nb, r) in enumerate(_TUNE_CONFIGS)],
        "cfg INT, n_bands BIGINT, rows_per_band BIGINT",
    )
    return (
        cfg_meta.join(ncand, "cfg", "left")
        .join(ncaught, "cfg", "left")
        .crossJoin(F.broadcast(ntrue))
        .select(
            "n_bands",
            "rows_per_band",
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias("n_candidates"),
            "n_true_pairs",
            F.coalesce("n_caught", F.lit(0)).cast("bigint").alias("n_caught"),
        )
    )


q_lsh_tuning_curve.__doc__ = q_lsh_tuning_curve.__doc__.format(
    max_id=_RECALL_MAX_ID
)


_OVERLAP_SQL = """
WITH h AS (
    SELECT DISTINCT source,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS th
    FROM documents
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM h GROUP BY source)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared,
       ANY_VALUE(sa.n) AS n_a, ANY_VALUE(sb.n) AS n_b,
       CAST(COUNT(*) AS DOUBLE)
           / (ANY_VALUE(sa.n) + ANY_VALUE(sb.n) - COUNT(*)) AS jaccard
FROM h a JOIN h b ON a.th = b.th AND a.source < b.source
JOIN sizes sa ON sa.source = a.source
JOIN sizes sb ON sb.source = b.source
GROUP BY 1, 2
"""


@register("source_overlap_matrix", _OVERLAP_SQL)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: for every source pair, how many
    distinct normalized-text fingerprints they share (+ Jaccard of the
    fingerprint sets) — the dedup-planning signal that tells you which
    ingest feeds are re-crawls of each other. Shuffles 16-byte hashes
    keyed by fingerprint; |sources|² output."""
    doc = load_table(spark, sf_dir, "documents")
    h = doc.select(
        "source",
        F.md5(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
        ).alias("th"),
    ).distinct()
    sizes = h.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = h.select(F.col("source").alias("source_a"), "th")
    b = h.select(F.col("source").alias("source_b"), "th")
    pairs = (
        a.join(b, "th")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double")
            ).alias("jaccard"),
        )
    )


# --- incremental cluster maintenance ---------------------------------------

_INCR_CC_SQL = f"""
WITH RECURSIVE {_CANDIDATES_CTES},
und AS (
    SELECT doc_a AS u, doc_b AS v FROM candidates
    UNION ALL
    SELECT doc_b, doc_a FROM candidates
),
cc_nodes AS (SELECT DISTINCT u AS node FROM und),
reach(node, r) AS (
    SELECT node, node FROM cc_nodes
    UNION
    SELECT e.v, r.r FROM reach r JOIN und e ON e.u = r.node
),
labeled AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT component,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(node) AS BIGINT) AS sum_members
FROM labeled
GROUP BY component
"""


@register("dedup_incremental_clusters", _INCR_CC_SQL)
def q_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CLUSTER maintenance: yesterday's labeling (CC over
    pairs among old docs, doc_id % 5 != 0) is folded with today's batch
    pairs (from ``incremental_lsh_candidates``) via star contraction —
    historical connectivity enters as node→component edges, so per-batch
    cost is O(labeled nodes + batch pairs), never O(historical pairs).

    The ORACLE is the full-recompute transitive closure over ALL
    candidate pairs: hash equality IS the proof that the incremental
    fold reaches the identical fixpoint (bridges that merge two old
    components included).

    Honest caveat on the equivalence: the ``max_bucket`` cap is applied
    to yesterday's old-only buckets on the incremental side but to the
    full (old+new) buckets in the oracle's recompute, so a bucket whose
    size straddles the cap only when the batch lands (old ≤ cap <
    old+new) would diverge — the same run-to-run nondeterminism every
    capped production dedup has. No such straddling bucket exists in
    the fixed testdata at any SF (verified by the hash gate itself)."""
    doc = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(
        dedup.shingle_docs(doc, k=_SHINGLE_K), num_hashes=_NUM_HASHES
    )
    is_new = (F.col("doc_id") % 5 == 0).cast("int")
    # yesterday: clusters among OLD docs only
    old_pairs = dedup.lsh_candidate_pairs(
        sigs.filter(is_new == 0),
        num_hashes=_NUM_HASHES,
        band_size=_BAND_SIZE,
        max_bucket=_MAX_BUCKET,
    )
    labels_old = dedup.connected_components(old_pairs)
    # today: the batch's candidates against the corpus (new×old, new×new)
    batch_pairs = dedup.incremental_lsh_candidates(
        sigs.withColumn("is_new", is_new),
        num_hashes=_NUM_HASHES,
        band_size=_BAND_SIZE,
        max_bucket=_MAX_BUCKET,
    )
    merged = dedup.incremental_components(labels_old, batch_pairs)
    return merged.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("node").cast("bigint").alias("sum_members"),
    )


# --- exact repeated-substring spans (suffix-array-style signal) ------------

_SS_K = 20
_SS_MIN = 50
_SS_DF = 20

_SUBSTR_SPANS_SQL = f"""
WITH g AS (
    SELECT d, pos,
           ('0x' || substr(md5(substring(text, pos + 1, {_SS_K})), 1, 15))::BIGINT AS h
    FROM (
        SELECT doc_id AS d, text,
               unnest(range(0, length(text) - {_SS_K} + 1)) AS pos
        FROM documents WHERE length(text) >= {_SS_K}
    )
),
keep AS (
    SELECT h FROM (
        SELECT h, COUNT(DISTINCT d) AS c FROM g GROUP BY h
    ) WHERE c <= {_SS_DF}
),
gk AS (SELECT g.* FROM g JOIN keep USING (h)),
m AS (
    SELECT a.d AS doc_a, b.d AS doc_b, a.pos AS pa, b.pos AS pb
    FROM gk a JOIN gk b ON a.h = b.h AND a.d < b.d
),
isl AS (
    SELECT doc_a, doc_b, pa - pb AS diag, pa,
           pa - ROW_NUMBER() OVER (
               PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS island
    FROM m
),
runs AS (
    SELECT doc_a, doc_b, CAST(COUNT(*) + {_SS_K} - 1 AS BIGINT) AS span
    FROM isl GROUP BY doc_a, doc_b, diag, island
    HAVING COUNT(*) + {_SS_K} - 1 >= {_SS_MIN}
)
SELECT doc_a, doc_b,
       CAST(MAX(span) AS BIGINT) AS max_span_chars,
       CAST(COUNT(*) AS BIGINT) AS n_runs
FROM runs GROUP BY doc_a, doc_b
"""


@register("dedup_exact_substring_spans", _SUBSTR_SPANS_SQL)
def q_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-document repeated substrings ≥ 50 chars — the signal
    suffix-array dedup (Lee et al.) removes, Spark-shaped: every-position
    hashed 20-grams (linear in corpus chars), a df-cap dropping
    boilerplate hub grams, gram-key equi-join, and gaps-and-islands per
    (pair, diagonal) turning consecutive matches into runs
    (``operators.dedup.exact_substring_spans``).  Windows are bounded by
    a single pair's overlap — never corpus-sized."""
    return dedup.exact_substring_spans(
        load_table(spark, sf_dir, "documents"),
        k=_SS_K,
        min_span=_SS_MIN,
        max_df=_SS_DF,
    )


# --- fuzzy entity resolution on the product dimension -----------------------

_FUZZ_MAX_DIST = 3

_FUZZ_SQL = f"""
WITH names AS (
    SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM part GROUP BY p_name
),
blocked AS (
    SELECT name, n_parts,
           string_split(name, ' ')[len(string_split(name, ' '))] AS block
    FROM names
)
SELECT a.name AS name_a, b.name AS name_b, a.block,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM blocked a JOIN blocked b
  ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {_FUZZ_MAX_DIST}
"""


@register("entity_fuzzy_parts", _FUZZ_SQL)
def q_entity_fuzzy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution over product names: candidate variant
    pairs (typos, brand respellings) = names sharing a blocking key
    (their last token — the head noun) within Levenshtein distance 3.

    The scale discipline is DISTINCT-FIRST: the edit-distance join runs
    on the distinct-name dimension (vocabulary-sized — grows with the
    entity universe, not the fact table), never on part rows; per-name
    row counts ride along so a consumer can weigh merges. Blocking
    bounds the quadratic term to within-block pairs — the same
    candidates-not-all-pairs rule as the MinHash LSH family
    (``dedup_minhash_candidates``), with levenshtein as the verifier
    instead of Jaccard. Both engines implement classic
    Wagner-Fischer edit distance on identical strings ⇒ identical
    integer distances."""
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )
    toks = F.split(F.col("name"), " ")
    blocked = names.select(
        "name",
        "n_parts",
        F.element_at(toks, F.size(toks)).alias("block"),
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .filter(dist <= _FUZZ_MAX_DIST)
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("a.block").alias("block"),
            dist.cast("bigint").alias("edit_dist"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
    )


# --- LSH precision gate (companion to dedup_recall_lsh_pairs) ----------------

_PRECISION_SQL = f"""
WITH {_CAND_AUTO_CTES},
exh AS (
    SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS sh_h FROM ex
),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM exh GROUP BY doc_id),
common AS (
    SELECT c.doc_a, c.doc_b,
           COUNT(eb.sh_h) AS n_common
    FROM candidates_auto c
    JOIN exh ea ON ea.doc_id = c.doc_a
    LEFT JOIN exh eb ON eb.doc_id = c.doc_b AND eb.sh_h = ea.sh_h
    GROUP BY 1, 2
),
scored AS (
    SELECT m.doc_a, m.doc_b,
           CAST(m.n_common AS DOUBLE)
               / (sa.n_shingles + sb.n_shingles - m.n_common) AS jaccard
    FROM common m
    JOIN sizes sa ON sa.doc_id = m.doc_a
    JOIN sizes sb ON sb.doc_id = m.doc_b
)
SELECT CAST((SELECT r FROM rq) AS BIGINT) AS band_size,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN jaccard >= {_JACCARD_T} THEN 1 ELSE 0 END)
           AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN jaccard >= {_JACCARD_T} THEN 1 ELSE 0 END)
           AS DOUBLE) / COUNT(*) AS precision
FROM scored
"""


@register("dedup_lsh_precision_gate", _PRECISION_SQL)
def q_dedup_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision of the LSH banding stage: the share of emitted
    candidate pairs whose exact shingle-Jaccard clears the 0.5 verify
    threshold — the companion number to ``dedup_recall_lsh_pairs``
    (recall says what banding MISSES; precision says how much verify
    work it WASTES — together they price a band/row configuration).
    Round 11: the candidate stage runs at the POLICY-picked rows-per-
    band (``minhash_band_policy`` — the registration default of the
    banded family), pinned in the ``band_size`` output column; the
    recall companion keeps the documented fixed config (its contract
    pins a recall number at 4×2).

    Scale shape: the candidate pipeline executes ONCE — every candidate
    flows through one a-side shingle join, one LEFT b-side match join
    (so zero-overlap candidates keep a row with n_common = 0 instead of
    silently dropping out of the denominator), and one fold to a single
    row. Verify joins move 60-bit hashed shingle keys only."""
    from ..functions.textfn import md5_bigint

    doc = load_table(spark, sf_dir, "documents")
    r = dedup.minhash_band_policy(
        cached_count(spark, sf_dir, "documents"),
        num_hashes=_NUM_HASHES,
        target_candidates_per_point=float(_MH_TARGET),
        slot_match_bits=_MH_SLOT_BITS,
    )
    sh = dedup.shingle_docs(doc, k=_SHINGLE_K)
    # round 11: hash the token stream ONCE — the checkpointed
    # (doc, h1, h2) frame feeds the signature build, the verify's two
    # join sides and the size agg (md5_bigint's key IS h1)
    hashes = dedup.shingle_hashes(sh).localCheckpoint(eager=False)
    sigs = dedup.minhash_signatures_from_hashes(hashes, num_hashes=_NUM_HASHES)
    cands = dedup.lsh_candidate_pairs(
        sigs,
        num_hashes=_NUM_HASHES,
        band_size=r,
        max_bucket=_MAX_BUCKET,
    )
    exh = hashes.select("doc_id", F.col("h1").alias("sh_h"))
    sizes = exh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    common = (
        cands.join(
            exh.select(F.col("doc_id").alias("doc_a"), "sh_h"), "doc_a"
        )
        .join(
            exh.select(
                F.col("doc_id").alias("_db"),
                F.col("sh_h").alias("sh_b"),
            ),
            (F.col("doc_b") == F.col("_db"))
            & (F.col("sh_h") == F.col("sh_b")),
            "left",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("sh_b").alias("n_common"))
    )
    scored = (
        common.join(
            sizes.withColumnsRenamed(
                {"doc_id": "doc_a", "n_shingles": "size_a"}
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnsRenamed(
                {"doc_id": "doc_b", "n_shingles": "size_b"}
            ),
            "doc_b",
        )
        .select(
            (
                F.col("n_common").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ).alias("jaccard")
        )
    )
    true_cnt = F.sum(
        F.when(F.col("jaccard") >= _JACCARD_T, 1).otherwise(0)
    ).cast("bigint")
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        true_cnt.alias("n_true"),
        (true_cnt.cast("double") / F.count(F.lit(1))).alias("precision"),
    ).select(
        F.lit(r).cast("bigint").alias("band_size"),
        "n_candidates",
        "n_true",
        "precision",
    )


# --- exact set-similarity join via prefix filtering --------------------------

_PPJOIN_SQL = f"""
WITH {_SHINGLE_CTES},
exh AS (
    SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS sh_h FROM ex
),
dfc AS (SELECT sh_h, CAST(COUNT(*) AS BIGINT) AS df FROM exh GROUP BY sh_h),
per_doc AS (
    SELECT e.doc_id,
           list(struct_pack(df := d.df, h := e.sh_h) ORDER BY d.df, e.sh_h)
               AS ordered,
           CAST(COUNT(*) AS BIGINT) AS set_size
    FROM exh e JOIN dfc d ON d.sh_h = e.sh_h
    GROUP BY e.doc_id
),
pfx AS (
    SELECT doc_id, set_size,
           unnest(list_transform(
               ordered[1 : CAST(set_size - ceil({_JACCARD_T} * set_size) + 1
                                AS BIGINT)],
               x -> x.h)) AS tok
    FROM per_doc
),
cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM pfx a JOIN pfx b ON a.tok = b.tok AND a.doc_id < b.doc_id
    WHERE a.set_size * 1.0 >= {_JACCARD_T} * b.set_size
      AND b.set_size * 1.0 >= {_JACCARD_T} * a.set_size
),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM exh GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
    FROM cands c
    JOIN exh ea ON ea.doc_id = c.doc_a
    JOIN exh eb ON eb.doc_id = c.doc_b AND eb.sh_h = ea.sh_h
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i.n_common)
           AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i.n_common)
      >= {_JACCARD_T}
"""


@register("dedup_prefix_filter_join", _PPJOIN_SQL)
def q_dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup pairs (shingle-Jaccard ≥ 0.5) via prefix filtering
    — the AllPairs/PPJoin algorithm: order each doc's shingle hashes by
    corpus rarity, keep only the first s − ⌈t·s⌉ + 1 as its prefix; any
    qualifying pair must collide on a prefix token, so the prefix
    self-join is a NO-FALSE-NEGATIVE candidate generator (unlike the
    MinHash/LSH path, which misses pairs and needs
    ``dedup_recall_lsh_pairs`` to price the miss). Size filters prune
    pairs whose cardinalities alone cap Jaccard below t; the exact
    hashed-key verify finishes.

    This completes the dedup family's design space: LSH (probabilistic,
    bucket-bounded) for web scale, prefix filtering (exact,
    rarity-bounded) when the duplicate report must be complete —
    pairs here ⊇ the LSH-verified pairs by construction
    (tests/test_round5_invariants.py pins both that superset and
    brute-force equality on a slice).

    Measured exactness price (SCALING.json ppjoin_decomposition): on
    the 10× replica corpus — where every replica is a near-dup of its
    original, so duplication density itself scales — the exact
    candidate set grows 99.7× (310k → 31M pairs) and wall time 47×;
    per-candidate work is SUBLINEAR (0.47×), so the growth is corpus
    duplication, not plan shape. Bounded-duplication corpora stay
    near-linear; duplicate-dense web corpora should take the LSH path
    and pay with the recall gate instead."""
    doc = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_docs(doc, k=_SHINGLE_K)
    return dedup.prefix_filter_join(sh, threshold=_JACCARD_T)


# ---------------------------------------------------------------------------
# Dedup-aware train/val/test split: clusters never straddle splits
# ---------------------------------------------------------------------------

_DEDUP_SPLIT_SQL = f"""
WITH RECURSIVE {_CANDIDATES_CTES},
und AS (
    SELECT doc_a AS u, doc_b AS v FROM candidates
    UNION ALL
    SELECT doc_b, doc_a FROM candidates
),
cc_nodes AS (SELECT DISTINCT u AS node FROM und),
reach(node, r) AS (
    SELECT node, node FROM cc_nodes
    UNION
    SELECT e.v, r.r FROM reach r JOIN und e ON e.u = r.node
),
labeled AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
comp AS (
    SELECT d.doc_id, COALESCE(l.component, d.doc_id) AS component
    FROM documents d LEFT JOIN labeled l ON l.node = d.doc_id
),
b AS (
    SELECT doc_id, component,
           ('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 15))::BIGINT
               % 100 AS bucket
    FROM comp
)
SELECT CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT component) AS BIGINT) AS n_clusters,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM b
GROUP BY 1
"""


@register("dedup_aware_split", _DEDUP_SPLIT_SQL)
def q_dedup_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: membership is a pure
    function of the document's NEAR-DUP CLUSTER id (LSH candidate graph
    → connected components; singletons are their own cluster), so two
    near-duplicate documents can never straddle train and eval — the
    split-level twin of eval decontamination.  Hashing the component id
    through the same md5-bucket rule as ``split_train_val_test`` keeps
    every stability property (rerun-, layout-, growth-stable) while
    adding the cluster-atomicity guarantee, pinned by an invariant
    test.  Reports per split: docs, clusters, membership checksum."""
    doc = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(
        dedup.shingle_docs(doc, k=_SHINGLE_K), num_hashes=_NUM_HASHES
    )
    cands = dedup.lsh_candidate_pairs(
        sigs, num_hashes=_NUM_HASHES, band_size=_BAND_SIZE, max_bucket=_MAX_BUCKET
    )
    labels = dedup.connected_components(cands)
    comp = doc.select("doc_id").join(
        labels, doc["doc_id"] == labels["node"], "left"
    ).select(
        "doc_id",
        F.coalesce("component", F.col("doc_id")).alias("component"),
    )
    split = assign_split(comp, key="component")
    return split.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct("component").cast("bigint").alias("n_clusters"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
    )


_DEGREE_SQL = f"""
WITH {_CANDIDATES_CTES},
und AS (
    SELECT doc_a AS node FROM candidates
    UNION ALL
    SELECT doc_b FROM candidates
),
deg AS (
    SELECT d.doc_id, CAST(COUNT(u.node) AS BIGINT) AS degree
    FROM documents d LEFT JOIN und u ON u.node = d.doc_id
    GROUP BY d.doc_id
)
SELECT degree,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM deg
GROUP BY degree
"""


@register("dedup_degree_histogram", _DEGREE_SQL)
def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-dup candidate graph — the
    diagnostic that distinguishes boilerplate hubs (fat tail → bucket
    caps and salting matter) from pairwise-duplicate corpora (mass at
    degree 1-2), and the measured basis for the CC star-contraction
    choice.  Docs in no candidate pair report degree 0.  Two hash
    aggregations over 8-byte ids; the pair explode is the same
    candidate pipeline every dedup query shares."""
    doc = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(
        dedup.shingle_docs(doc, k=_SHINGLE_K), num_hashes=_NUM_HASHES
    )
    cands = dedup.lsh_candidate_pairs(
        sigs, num_hashes=_NUM_HASHES, band_size=_BAND_SIZE, max_bucket=_MAX_BUCKET
    )
    # round 11 (the graph.py union lesson): Spark has no CSE across
    # union branches, so the two selects re-ran the whole candidate
    # pipeline — ONE explode emits both endpoints in one pass
    und = cands.select(
        F.explode(F.array(F.col("doc_a"), F.col("doc_b"))).alias("node")
    )
    deg = (
        doc.select("doc_id")
        .join(und, F.col("doc_id") == F.col("node"), "left")
        .groupBy("doc_id")
        .agg(F.count("node").cast("bigint").alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


# ---------------------------------------------------------------------------
# SimHash near-dup pairs — the bit-vector dedup rung (round 8)
# ---------------------------------------------------------------------------
# MinHash blocks on Jaccard, PPJoin verifies set overlap exactly;
# SimHash is the third classic web-crawl rung: cosine-ish similarity of
# term-frequency vectors folded into a 64-bit signature, near-dups at
# small Hamming distance.  Blocking + verify DELEGATE to the image
# family's band machinery (operators.multimodal.image_neardup_pairs) —
# the plan, the pigeonhole exactness argument, and the measured scaling
# (SCALING image_neardup_decomposition) transfer verbatim.

_SIMHAM = 6

_SIMHASH_BANDS_CTES = """stoks AS (
    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
    FROM documents
),
sh2 AS (
    SELECT doc_id,
           ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h1,
           ('0x' || substr(md5(tok), 16, 1))::BIGINT AS h2
    FROM stoks
),
sbit AS (
    SELECT doc_id, b,
           SUM(CASE WHEN (CASE WHEN b < 60 THEN (h1 >> b) & 1
                               ELSE (h2 >> (b - 60)) & 1 END) = 1
                    THEN 1 ELSE -1 END) AS s
    FROM sh2 CROSS JOIN (SELECT unnest(range(0, 64)) AS b)
    GROUP BY 1, 2
),
sbands AS (
    SELECT doc_id, b // 8 AS band_idx,
           CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << (b % 8)
                         ELSE 0::BIGINT END) AS BIGINT) AS band_val
    FROM sbit GROUP BY 1, 2
),
swide AS (
    SELECT doc_id, band_idx // 2 AS blk,
           CAST(SUM(band_val * CASE WHEN band_idx % 2 = 1 THEN 256 ELSE 1 END)
               AS BIGINT) AS band_val
    FROM sbands GROUP BY 1, 2
),
scand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM swide a JOIN swide b
      ON a.blk = b.blk AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)"""

# Ladder-policy blocking CTEs (round 11): the 64-bit fingerprint fuses
# its 8-bit band rows at the width ``dhash_band_policy`` picks from the
# corpus count — (8×8) → (4×16) → (2×32), narrowest width whose random
# floor n_bands·n/2^w fits 8 candidates/point.  The oracle re-derives
# the ladder in a CTE and fuses at RUNTIME k = w/8 (256^(band_idx % k)
# weights via CASE), so no static width is registered anywhere in the
# auto family and the pick itself is hash-checked via the pinned
# ``band_bits`` column.  The recall gate and threshold curve keep the
# documented fixed 16-bit contract (they PRICE a specific width).
_SIMHASH_AUTO_CTES = f"""swq AS (
    SELECT CASE WHEN 8.0 * COUNT(*) / 256.0 <= 8.0 THEN 8
                WHEN 4.0 * COUNT(*) / 65536.0 <= 8.0 THEN 16
                ELSE 32 END AS w
    FROM documents
),
sauto AS (
    SELECT doc_id, band_idx // (w // 8) AS blk,
           CAST(SUM(band_val *
                CASE WHEN band_idx % (w // 8) = 1 THEN 256
                     WHEN band_idx % (w // 8) = 2 THEN 65536
                     WHEN band_idx % (w // 8) = 3 THEN 16777216
                     ELSE 1 END) AS BIGINT) AS band_val
    FROM sbands CROSS JOIN swq GROUP BY doc_id, blk
),
scand_auto AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sauto a JOIN sauto b
      ON a.blk = b.blk AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)"""

_SIMHASH_PAIRS_SQL = f"""
WITH {_SIMHASH_BANDS_CTES},
{_SIMHASH_AUTO_CTES}
SELECT c.doc_a, c.doc_b,
       CAST(SUM(bit_count(xor(ba.band_val, bb.band_val))) AS BIGINT) AS hamming,
       CAST((SELECT w FROM swq) AS BIGINT) AS band_bits
FROM scand_auto c
JOIN sbands ba ON ba.doc_id = c.doc_a
JOIN sbands bb ON bb.doc_id = c.doc_b AND bb.band_idx = ba.band_idx
GROUP BY 1, 2
HAVING CAST(SUM(bit_count(xor(ba.band_val, bb.band_val))) AS BIGINT) <= {_SIMHAM}
"""


@register("dedup_simhash_pairs", _SIMHASH_PAIRS_SQL)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text near-dup pairs by 64-bit weighted SimHash at the
    POLICY-picked band width (round 11: ``dhash_band_policy`` replaces
    the fixed 16-bit registration — same 16 at the 500-5000-doc test
    scales, 32 beyond ~2M docs, with the pick pinned cross-engine in
    the ``band_bits`` column): candidates share a fused band,
    verification is exact Hamming over the full signature (the trade
    ``dedup_simhash_recall`` prices at the fixed documented width).
    Measured at sf0.01: 56 pairs at distance ≤ 6 vs 78 exact (recall
    0.72 past the pigeonhole radius); the signature build is one
    md5-per-token scan + one 64-sum hash aggregation — no shuffle
    grows with pair count."""
    from ..operators.multimodal import dhash_band_policy

    doc = load_table(spark, sf_dir, "documents")
    w = dhash_band_policy(cached_count(spark, sf_dir, "documents"))
    return dedup.simhash_neardup_pairs(
        doc, max_hamming=_SIMHAM, band_bits=w,
    ).withColumn("band_bits", F.lit(w).cast("bigint"))


_SIMHASH_RECALL_SQL = f"""
WITH {_SIMHASH_BANDS_CTES},
strue AS (
    SELECT ba.doc_id AS da, bb.doc_id AS db
    FROM sbands ba
    JOIN sbands bb ON bb.band_idx = ba.band_idx AND ba.doc_id < bb.doc_id
    WHERE ba.doc_id < {_RECALL_MAX_ID} AND bb.doc_id < {_RECALL_MAX_ID}
    GROUP BY 1, 2
    HAVING SUM(bit_count(xor(ba.band_val, bb.band_val))) <= {_SIMHAM}
),
scaught AS (
    SELECT t.da FROM strue t
    JOIN scand c ON c.doc_a = t.da AND c.doc_b = t.db
),
sblock AS (
    SELECT COUNT(*) AS n FROM scand
    WHERE doc_a < {_RECALL_MAX_ID} AND doc_b < {_RECALL_MAX_ID}
)
SELECT CAST((SELECT COUNT(*) FROM strue) AS BIGINT) AS n_truth,
       CAST((SELECT COUNT(*) FROM scaught) AS BIGINT) AS n_caught,
       CAST((SELECT n FROM sblock) AS BIGINT) AS n_block_candidates,
       CASE WHEN (SELECT COUNT(*) FROM strue) > 0
            THEN CAST((SELECT COUNT(*) FROM scaught) AS DOUBLE)
                 / (SELECT COUNT(*) FROM strue)
       END AS recall
"""


@register("dedup_simhash_recall", _SIMHASH_RECALL_SQL)
def q_simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banding QUALITY gate, the ``dedup_recall_lsh_pairs``
    twin: exact all-pairs Hamming ground truth on the bounded audit
    slice (doc_id < 500) vs the full-corpus wide-band candidate set
    restricted to the same slice — recall prices the banding loss past
    the pigeonhole radius, n_block_candidates prices the collision
    floor the banding pays for it (the candidate-volume/recall pair
    every blocking choice trades)."""
    doc = load_table(spark, sf_dir, "documents")
    bands = dedup.simhash_bands(doc).persist()
    # packed-signature exact truth over the bounded audit slice (round
    # 11 — see multimodal.image_neardup_pairs): a broadcast product of
    # the slice's two-half signatures replaces the band_idx-keyed join
    # (the same product, 8 rows wide) + pair-keyed agg
    from ..operators.multimodal import band_signature, hamming64

    ssub = band_signature(bands.filter(F.col("doc_id") < _RECALL_MAX_ID))
    ta = ssub.select(
        F.col("doc_id").alias("da"),
        F.col("sig_lo").alias("lo_a"), F.col("sig_hi").alias("hi_a"),
    )
    tb = ssub.select(
        F.col("doc_id").alias("db"),
        F.col("sig_lo").alias("lo_b"), F.col("sig_hi").alias("hi_b"),
    )
    truth = (
        ta.crossJoin(F.broadcast(tb))
        .filter(F.col("da") < F.col("db"))
        .filter(hamming64("lo_a", "lo_b", "hi_a", "hi_b") <= _SIMHAM)
        .select("da", "db")
        # feeds the truth count AND the caught semi-join — one cut
        .localCheckpoint(eager=False)
    )
    from ..operators.multimodal import fuse_bands

    blocks = fuse_bands(bands, 16)
    ca = blocks.select(
        F.col("doc_id").alias("doc_a"), "band_idx", "band_val"
    )
    cb = blocks.select(
        F.col("doc_id").alias("doc_b"), "band_idx", "band_val"
    )
    cand = (
        ca.join(cb, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .filter(
            (F.col("doc_a") < _RECALL_MAX_ID) & (F.col("doc_b") < _RECALL_MAX_ID)
        )
        .persist()
    )
    caught = truth.join(
        cand,
        (F.col("da") == F.col("doc_a")) & (F.col("db") == F.col("doc_b")),
        "left_semi",
    )
    out = (
        truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
        .crossJoin(
            caught.agg(F.count(F.lit(1)).cast("bigint").alias("n_caught"))
        )
        .crossJoin(
            cand.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_block_candidates")
            )
        )
        .select(
            "n_truth",
            "n_caught",
            "n_block_candidates",
            F.when(
                F.col("n_truth") > 0,
                F.col("n_caught").cast("double") / F.col("n_truth"),
            ).alias("recall"),
        )
    )
    # materialize the 1-row result, then RELEASE the pins (they used to
    # outlive the call and accumulate across bench invocations)
    out = out.localCheckpoint()
    cand.unpersist()
    bands.unpersist()
    return out


_SIMHASH_CLUSTERS_SQL = f"""
WITH RECURSIVE {_SIMHASH_BANDS_CTES},
{_SIMHASH_AUTO_CTES},
spairs AS (
    SELECT c.doc_a, c.doc_b
    FROM scand_auto c
    JOIN sbands ba ON ba.doc_id = c.doc_a
    JOIN sbands bb ON bb.doc_id = c.doc_b AND bb.band_idx = ba.band_idx
    GROUP BY 1, 2
    HAVING SUM(bit_count(xor(ba.band_val, bb.band_val))) <= {_SIMHAM}
),
sund AS (
    SELECT doc_a AS u, doc_b AS v FROM spairs
    UNION ALL
    SELECT doc_b, doc_a FROM spairs
),
snodes AS (SELECT DISTINCT u AS node FROM sund),
sreach(node, r) AS (
    SELECT node, node FROM snodes
    UNION
    SELECT ed.v, r.r FROM sreach r JOIN sund ed ON ed.u = r.node
),
slabeled AS (SELECT node, MIN(r) AS component FROM sreach GROUP BY node)
SELECT component,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(node) AS BIGINT) AS sum_members,
       CAST((SELECT w FROM swq) AS BIGINT) AS band_bits
FROM slabeled
GROUP BY component
"""


@register("dedup_simhash_clusters", _SIMHASH_CLUSTERS_SQL)
def q_simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash dedup SURVIVOR selection: near-dup pairs at the
    POLICY-picked band width (round 11 — see ``dedup_simhash_pairs``)
    fed through min-label connected components — component id = min
    doc_id, the canonical keep-one per near-dup cluster.  Completes the
    SimHash family (pairs → recall gate → clusters) exactly as the
    image family reads, sharing the star-contraction CC operator; the
    oracle states the same fixpoint as a recursive-CTE transitive
    closure, re-derives the width ladder, and the pick is pinned in
    ``band_bits``."""
    from ..operators.multimodal import dhash_band_policy

    doc = load_table(spark, sf_dir, "documents")
    w = dhash_band_policy(cached_count(spark, sf_dir, "documents"))
    pairs = dedup.simhash_neardup_pairs(
        doc, max_hamming=_SIMHAM, band_bits=w,
    )
    labels = dedup.connected_components(pairs, src="doc_a", dst="doc_b")
    return labels.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("node").cast("bigint").alias("sum_members"),
    ).withColumn("band_bits", F.lit(w).cast("bigint"))


_SIMHAM_SWEEP = [2, 4, 6, 8]

_SIMHASH_CURVE_SQL = f"""
WITH {_SIMHASH_BANDS_CTES},
sham AS (
    SELECT c.doc_a, c.doc_b,
           CAST(SUM(bit_count(xor(ba.band_val, bb.band_val))) AS BIGINT)
               AS hamming
    FROM scand c
    JOIN sbands ba ON ba.doc_id = c.doc_a
    JOIN sbands bb ON bb.doc_id = c.doc_b AND bb.band_idx = ba.band_idx
    GROUP BY 1, 2
),
strue AS (
    SELECT ba.doc_id AS da, bb.doc_id AS db,
           CAST(SUM(bit_count(xor(ba.band_val, bb.band_val))) AS BIGINT)
               AS hamming
    FROM sbands ba
    JOIN sbands bb ON bb.band_idx = ba.band_idx AND ba.doc_id < bb.doc_id
    WHERE ba.doc_id < {_RECALL_MAX_ID} AND bb.doc_id < {_RECALL_MAX_ID}
    GROUP BY 1, 2
)
{" UNION ALL ".join(f'''
SELECT {h} AS max_hamming,
       CAST((SELECT COUNT(*) FROM sham WHERE hamming <= {h}) AS BIGINT)
           AS n_pairs_wide,
       CAST((SELECT COUNT(*) FROM strue WHERE hamming <= {h}) AS BIGINT)
           AS n_truth,
       CAST((SELECT COUNT(*) FROM sham
             WHERE hamming <= {h}
               AND doc_a < {_RECALL_MAX_ID} AND doc_b < {_RECALL_MAX_ID})
            AS BIGINT) AS n_caught,
       CASE WHEN (SELECT COUNT(*) FROM strue WHERE hamming <= {h}) > 0
            THEN CAST((SELECT COUNT(*) FROM sham
                       WHERE hamming <= {h}
                         AND doc_a < {_RECALL_MAX_ID}
                         AND doc_b < {_RECALL_MAX_ID}) AS DOUBLE)
                 / (SELECT COUNT(*) FROM strue WHERE hamming <= {h})
       END AS recall''' for h in _SIMHAM_SWEEP)}
"""


@register("dedup_simhash_threshold_curve", _SIMHASH_CURVE_SQL)
def q_simhash_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash distance-threshold sweep — the family's parameter
    curve next to the LSH (bands × rows) tuning curve and the nprobe
    sweep: ONE banding + Hamming pass serves every threshold (the
    candidate set and the exact audit-slice truth are computed once at
    the widest radius; each rung is a COUNT at its cutoff).  Reads as
    the S-curve an operator consults before picking max_hamming: the
    pigeonhole radius (≤ 3 with 4 fused bands) is exact by
    construction, and recall decays measurably beyond it."""
    doc = load_table(spark, sf_dir, "documents")
    bands = dedup.simhash_bands(doc).persist()
    from ..operators.multimodal import fuse_bands

    blocks = fuse_bands(bands, 16)
    ca = blocks.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_val")
    cb = blocks.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_val")
    cand = (
        ca.join(cb, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # packed-signature verify (round 11 — see
    # multimodal.image_neardup_pairs): one doc-sized agg, then scalar
    # joins + row-local bit_count instead of 8 band rows per pair side
    from ..operators.multimodal import band_signature, hamming64

    sig = band_signature(bands).persist()
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sig_lo").alias("lo_a"), F.col("sig_hi").alias("hi_a"),
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sig_lo").alias("lo_b"), F.col("sig_hi").alias("hi_b"),
    )
    sham = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            hamming64("lo_a", "lo_b", "hi_a", "hi_b").alias("hamming"),
        )
        .persist()
    )
    # exact audit-slice truth: all pairs within the bounded slice
    # (doc_id < 500) — a broadcast product over the slice's signatures
    # (the old band_idx-keyed join was the same product, 8 rows wide)
    ssub = sig.filter(F.col("doc_id") < _RECALL_MAX_ID)
    ta = ssub.select(
        F.col("doc_id").alias("da"),
        F.col("sig_lo").alias("lo_a"), F.col("sig_hi").alias("hi_a"),
    )
    tb = ssub.select(
        F.col("doc_id").alias("db"),
        F.col("sig_lo").alias("lo_b"), F.col("sig_hi").alias("hi_b"),
    )
    strue = (
        ta.crossJoin(F.broadcast(tb))
        .filter(F.col("da") < F.col("db"))
        .select(
            "da", "db",
            hamming64("lo_a", "lo_b", "hi_a", "hi_b").alias("hamming"),
        )
        .persist()
    )
    # round 11 (guide §1.2 "don't compute things you throw away"): the
    # per-rung loop ran THREE one-row aggregates per threshold (12 scans
    # of the persisted frames unioned into one plan).  Every rung is a
    # conditional count over the SAME two frames — ONE aggregate over
    # each (count(when(...)) ≡ the old filtered count, 0 on empty) and
    # an explode emit the identical rows.
    in_slice = (F.col("doc_a") < _RECALL_MAX_ID) & (
        F.col("doc_b") < _RECALL_MAX_ID
    )
    wide_aggs = sham.agg(
        *[
            F.count(F.when(F.col("hamming") <= h, 1))
            .cast("bigint")
            .alias(f"_w{h}")
            for h in _SIMHAM_SWEEP
        ],
        *[
            F.count(F.when((F.col("hamming") <= h) & in_slice, 1))
            .cast("bigint")
            .alias(f"_c{h}")
            for h in _SIMHAM_SWEEP
        ],
    )
    true_aggs = strue.agg(
        *[
            F.count(F.when(F.col("hamming") <= h, 1))
            .cast("bigint")
            .alias(f"_t{h}")
            for h in _SIMHAM_SWEEP
        ]
    )
    res = (
        wide_aggs.crossJoin(true_aggs)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(h).cast("bigint").alias("max_hamming"),
                            F.col(f"_w{h}").alias("n_pairs_wide"),
                            F.col(f"_t{h}").alias("n_truth"),
                            F.col(f"_c{h}").alias("n_caught"),
                        )
                        for h in _SIMHAM_SWEEP
                    ]
                )
            ).alias("r")
        )
        .select(
            "r.max_hamming",
            "r.n_pairs_wide",
            "r.n_truth",
            "r.n_caught",
            F.when(
                F.col("r.n_truth") > 0,
                F.col("r.n_caught").cast("double") / F.col("r.n_truth"),
            ).alias("recall"),
        )
    )
    # materialize the 4-row result, then RELEASE the pins — they used to
    # outlive the call and accumulate across bench invocations
    res = res.localCheckpoint()
    for frame in (strue, sham, sig, bands):
        frame.unpersist()
    return res


# --- anchored first-pass substring dedup (round 10) --------------------------
#
# The every-position pass above is honest but pays one md5 per corpus
# CHARACTER (its own bench note: ~16 s at sf0.1 — production would
# stride-sample).  exact_substring_anchored is that production first
# pass: content-defined anchors (ascii of the gram's first char % 4 ==
# 0 — a property of the TEXT, so shared substrings select the SAME
# anchors in both copies; a fixed-stride pos % s sample would misalign
# the copies) cut the hash AND join volume ~4x, runs of >= 2 matched
# anchors within a 100-char gap on one diagonal report the candidate
# pair with a span estimate.  The exact pass is the verify rung.

_AN_K = 20
_AN_MOD = 4
_AN_DF = 20
_AN_GAP = 100
_AN_MIN = 2

_SUBSTR_ANCHORED_SQL = f"""
WITH anch AS (
    SELECT d, pos,
           ('0x' || substr(md5(substring(text, pos + 1, {_AN_K})), 1, 15))::BIGINT AS h
    FROM (
        SELECT doc_id AS d, text,
               unnest(range(0, length(text) - {_AN_K} + 1)) AS pos
        FROM documents WHERE length(text) >= {_AN_K}
    )
    WHERE ascii(substring(text, pos + 1, 1)) % {_AN_MOD} = 0
      AND ascii(substring(text, pos + 1, 1)) BETWEEN 1 AND 127
),
akeep AS (
    SELECT h FROM (
        SELECT h, COUNT(DISTINCT d) AS c FROM anch GROUP BY h
    ) WHERE c <= {_AN_DF}
),
ak AS (SELECT anch.* FROM anch JOIN akeep USING (h)),
am AS (
    SELECT a.d AS doc_a, b.d AS doc_b, a.pos AS pa, b.pos AS pb
    FROM ak a JOIN ak b ON a.h = b.h AND a.d < b.d
),
agaps AS (
    SELECT doc_a, doc_b, pa - pb AS diag, pa,
           CASE WHEN pa - LAG(pa) OVER (PARTITION BY doc_a, doc_b, pa - pb
                ORDER BY pa) > {_AN_GAP} THEN 1 ELSE 0 END AS new_run
    FROM am
),
arsrc AS (
    SELECT doc_a, doc_b, diag, pa,
           SUM(new_run) OVER (PARTITION BY doc_a, doc_b, diag
               ORDER BY pa) AS run_id
    FROM agaps
),
aruns AS (
    SELECT doc_a, doc_b,
           CAST(MAX(pa) - MIN(pa) + {_AN_K} AS BIGINT) AS span,
           CAST(COUNT(*) AS BIGINT) AS n_anch
    FROM arsrc GROUP BY doc_a, doc_b, diag, run_id
    HAVING COUNT(*) >= {_AN_MIN}
)
SELECT doc_a, doc_b,
       CAST(MAX(span) AS BIGINT) AS est_max_span,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(SUM(n_anch) AS BIGINT) AS n_anchors
FROM aruns GROUP BY doc_a, doc_b
"""


@register("dedup_substring_anchored", _SUBSTR_ANCHORED_SQL)
def q_substring_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchored first-pass repeated-substring candidates — the
    production shape the every-position pass's cost note promises
    (``operators.dedup.exact_substring_anchored``): content-defined
    anchors (offset-invariant, so copies align), md5 only at anchors
    (~1/4 of the full pass's dominant cost), df-capped gram join,
    anchor runs per (pair, diagonal) with span estimates.  A shared
    substring with ≥ 2 anchors within 100-char gaps is ALWAYS found;
    shorter spans are the recall trade the exact pass re-checks."""
    return dedup.exact_substring_anchored(
        load_table(spark, sf_dir, "documents"),
        k=_AN_K,
        anchor_mod=_AN_MOD,
        max_df=_AN_DF,
        max_gap=_AN_GAP,
        min_anchors=_AN_MIN,
    )
