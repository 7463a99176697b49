"""LLM-training-data pipeline queries — SURVEY.md §7 M5: dedup (exact,
MinHash-LSH, SimHash, n-gram Jaccard, embedding near-dup), similarity
search, text analysis (language-ID, quality, token stats, fingerprints).

Oracle notes:
- DuckDB's list_cosine_similarity computes in float32 — the oracles here
  use an explicit double fold instead (bit-compatible with
  functions.vector's zip_with/aggregate fold).
- Language-ID / quality metrics are expressed with portable primitives
  (length-replace occurrence counts, regexp counts) so the oracle SQL can
  mirror the exact arithmetic.
- Probabilistic operators (MinHash, SimHash, hyperplane LSH) register
  rows-only for the driver; their semantics are pinned by pytest with
  planted duplicates (tests/test_dedup.py, test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.functions import text as T
from pucminas_data_pipelines_spark.operators import dedup as D
from pucminas_data_pipelines_spark.operators import ordered as ORD
from pucminas_data_pipelines_spark.operators import similarity as S
from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.tables import load_table

# ---------------------------------------------------------------- dedup --

_NORM_SQL = "TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS representative_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    ORDER BY content_hash
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content-hash dedup (operators/dedup.exact_duplicates)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_duplicates(docs, "doc_id", "text", normalized=False).orderBy(
        "content_hash"
    )


@query(
    "dedup_incremental_batch",
    oracle=f"""
    WITH corpus AS (
      SELECT md5({_NORM_SQL}) AS h FROM documents WHERE doc_id < 400
    ),
    incoming AS (
      SELECT doc_id, md5({_NORM_SQL}) AS h FROM documents WHERE doc_id >= 400
      UNION ALL
      SELECT doc_id + 10000, md5({_NORM_SQL}) FROM documents WHERE doc_id < 20
    )
    SELECT i.doc_id,
           CASE WHEN i.h IS NULL THEN TRUE
                ELSE i.h NOT IN (SELECT h FROM corpus WHERE h IS NOT NULL)
           END AS is_new,
           CAST(COUNT(*) OVER (PARTITION BY i.h) AS BIGINT) AS copies_in_batch
    FROM incoming i
    ORDER BY doc_id
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup — the production shape for a corpus
    that grows batch by batch: the incoming batch (doc_id >= 400 here) is
    screened against the ALREADY-INGESTED corpus (doc_id < 400) by
    normalized content hash, flagging which incoming documents are new
    plus their within-batch copy count. Downstream, `is_new AND
    copies_in_batch handling` drives the actual append.

    Scale: the existing corpus contributes only its 16-byte hash column
    (in production: a stored hash index, not a rescan); the membership
    probe is a hash left-semi/anti shape on that key — broadcast when the
    day's batch is small, shuffle-on-hash otherwise, and a Bloom filter
    of corpus hashes replaces the exact probe when the corpus side
    outgrows memory (runtime bloom joins inject automatically at
    production scan sizes — see PERFORMANCE.md).

    NULL-text documents hash to NULL: a NULL join key never matches, so
    the engine flags them new; the oracle's CASE mirrors that (a bare
    NOT IN would yield NULL, a silent parity break)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(T.normalize_text(F.col("text")).cast("binary"))
    corpus_h = (
        docs.where(F.col("doc_id") < 400)
        .select(h.alias("h"))
        .distinct()
        .withColumn("_seen", F.lit(True))
    )
    # the incoming batch: genuinely new docs plus a planted re-crawl of 20
    # already-ingested documents (shifted ids), so the corpus probe has
    # real positives to catch — this corpus has no natural exact dups
    incoming = (
        docs.where(F.col("doc_id") >= 400)
        .select("doc_id", h.alias("h"))
        .unionByName(
            docs.where(F.col("doc_id") < 20).select(
                (F.col("doc_id") + 10000).alias("doc_id"), h.alias("h")
            )
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("h")
    return (
        incoming.join(corpus_h, "h", "left")
        .select(
            "doc_id",
            F.col("_seen").isNull().alias("is_new"),
            F.count(F.lit(1)).over(w).alias("copies_in_batch"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_exact_normalized",
    oracle=f"""
    SELECT md5({_NORM_SQL}) AS content_hash,
           MIN(doc_id) AS representative_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    ORDER BY content_hash
    """,
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on canonicalized text (lower/strip-punct/collapse-ws)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_duplicates(docs, "doc_id", "text", normalized=True).orderBy(
        "content_hash"
    )


# Exact token-3-gram Jaccard, all pairs — DuckDB mirror of
# functions.text.token_shingles (normalize → space-split → overlapping
# 3-grams with one partial tail gram when len < n → distinct) followed by
# |A∩B| / |A∪B| via unnest + equi-join (only co-shingled pairs surface,
# which is all a >= threshold filter can keep).
_JACCARD_CTE = f"""
    WITH toks AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id, list_distinct(list_transform(
        generate_series(1, greatest(len(w) - 2, 1)),
        i -> array_to_string(w[i:i+2], ' '))) AS shingles
      FROM toks
    ),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT id_a, id_b,
             ROUND(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) AS jaccard
      FROM inter
      JOIN cnt ca ON ca.doc_id = id_a
      JOIN cnt cb ON cb.doc_id = id_b
    )
"""


@query(
    "dedup_minhash_lsh",
    oracle=_JACCARD_CTE
    + """
    SELECT id_a, id_b FROM jac WHERE jaccard >= 0.3 ORDER BY id_a, id_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH near-dup pairs. The driver output is the pair set
    only: the operator's est_jaccard column is xxhash-based and
    engine-specific, but the PAIR SET is checkable against exact shingle
    Jaccard because this corpus has a wide margin (planted duplicates sit
    at jaccard >= 0.9, the next-closest pair below 0.15, so 64-hash
    estimation error cannot flip membership at threshold 0.3 — verified
    empirically at sf0.01). Recall bounds for the general case are pinned
    by tests/test_dedup.py planted duplicates."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        D.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.3
        )
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    )


@query(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
    ),
    th AS (
      SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM toks
    ),
    bitvals AS (
      SELECT doc_id, bb.b,
        CASE WHEN SUM(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) > 0
             THEN (1::BIGINT << bb.b) ELSE 0 END AS v
      FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) bb
      GROUP BY doc_id, bb.b
    ),
    sh AS (SELECT doc_id, SUM(v) AS s FROM bitvals GROUP BY doc_id)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 3
    ORDER BY id_a, id_b
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs in the pigeonhole-COMPLETE regime
    (max_hamming=3 < bands=4 ⇒ banding finds every qualifying pair), so
    the brute-force all-pairs SQL is an exact oracle. The md5-60bit token
    hash makes the signature itself engine-portable."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        D.simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=3)
        .withColumn("hamming", F.col("hamming").cast("int"))
        .orderBy("id_a", "id_b")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=_JACCARD_CTE
    + """
    SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.3 ORDER BY id_a, id_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates verified with exact n-gram Jaccard (find → verify,
    the canonical two-stage near-dup pipeline). Oracle: DuckDB computes the
    same distinct-3-gram sets and exact |A∩B|/|A∪B| over ALL pairs — equal
    to the two-stage result because LSH candidate recall is 1.0 on this
    corpus at threshold 0.3 (wide jaccard margin; see dedup_minhash_lsh)."""
    docs = load_table(spark, sf_dir, "documents")
    cands = D.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.2
    )
    return D.ngram_jaccard_pairs(cands, docs, "doc_id", "text", threshold=0.3).orderBy(
        "id_a", "id_b"
    )


# duplicated-8-gram span derivation, shared by the span listing and the
# span-coverage curation gate (mirrors operators/dedup.duplicated_spans)
_SPAN_CTE = f"""
    WITH toks AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+7], ' ') AS g
      FROM toks, LATERAL unnest(generate_series(1, len(w) - 7)) AS t(i)
      WHERE len(w) >= 8
    ),
    dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
    dp AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM dp
    ),
    spans AS (
      SELECT doc_id, MIN(pos) AS span_start,
             MAX(pos) - MIN(pos) + 8 AS span_len_tokens,
             COUNT(*) AS n_dup_grams
      FROM isl GROUP BY doc_id, grp
    )
"""


@query(
    "dedup_substring_spans",
    oracle=_SPAN_CTE
    + """
    SELECT doc_id, span_start, span_len_tokens, n_dup_grams
    FROM spans ORDER BY doc_id, span_start
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicated spans (Lee et al. 2022 style): maximal
    8-token spans shared verbatim across >= 2 documents, per document with
    token offsets (operators/dedup.duplicated_spans — shingle inverted
    index + gaps-and-islands; the distributed analogue of the paper's
    suffix array). Oracle recomputes the same grams/positions/islands on
    gram TEXT; the engine groups on xxhash64(gram) — identical up to
    64-bit collisions, absent at oracle scale."""
    docs = load_table(spark, sf_dir, "documents")
    return D.duplicated_spans(docs, "doc_id", "text", span_tokens=8).orderBy(
        "doc_id", "span_start"
    )


@query(
    "curation_span_coverage_gate",
    oracle=_SPAN_CTE
    + """
    , cov AS (
      SELECT doc_id, COUNT(DISTINCT tp) AS dup_tokens
      FROM (
        SELECT doc_id,
               unnest(generate_series(span_start,
                                      span_start + span_len_tokens - 1)) AS tp
        FROM spans
      ) GROUP BY doc_id
    ),
    base AS (
      SELECT doc_id,
             CAST(len(string_split({norm}, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT b.doc_id, b.n_tokens,
           COALESCE(c.dup_tokens, 0) AS dup_tokens,
           COALESCE(c.dup_tokens, 0) * 2 <= b.n_tokens AS kept
    FROM base b LEFT JOIN cov c USING (doc_id)
    ORDER BY doc_id
    """.format(norm=_NORM_SQL),
)
def curation_span_coverage_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation gate on duplicated-span coverage: a document is dropped
    when more than half of its tokens sit inside spans shared verbatim
    with other documents — the document-level removal policy layered on
    the Lee-et-al-style span index (dedup_substring_spans). Token
    coverage counts DISTINCT positions (adjacent islands' 8-token tails
    overlap, so summing span lengths would overcount); the keep rule is
    integer arithmetic (2*dup <= n) for engine-stable boundaries.

    Scale: reuses the span index (linear in corpus tokens); the coverage
    explode is bounded by duplicated-token count; the final join is
    doc-keyed."""
    docs = load_table(spark, sf_dir, "documents")
    spans = D.duplicated_spans(docs, "doc_id", "text", span_tokens=8)
    cov = (
        spans.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("span_start"),
                    F.col("span_start") + F.col("span_len_tokens") - 1,
                )
            ).alias("tp"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dup_tokens"))
    )
    base = docs.select(
        "doc_id",
        F.size(F.split(T.normalize_text(F.col("text")), " ")).cast("bigint").alias(
            "n_tokens"
        ),
    )
    return (
        base.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
            (F.coalesce(F.col("dup_tokens"), F.lit(0)) * 2 <= F.col("n_tokens")).alias(
                "kept"
            ),
        )
        .orderBy("doc_id")
    )


_DOT_SQL = (
    "list_aggregate(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"
)
_SQNORM_SQL = (
    "list_aggregate(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"
)
_COSINE_SQL = (
    f"({_DOT_SQL} / (sqrt({_SQNORM_SQL.format(v='{a}')}) * sqrt({_SQNORM_SQL.format(v='{b}')})))"
)


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_COSINE_SQL.format(a='a.embedding', b='b.embedding')}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND({_COSINE_SQL.format(a='a.embedding', b='b.embedding')}, 6) >= 0.4
    ORDER BY id_a, id_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine >= 0.4 on this corpus —
    random vectors top out at ~0.51)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.4).orderBy(
        "id_a", "id_b"
    )


@query(
    "dedup_cluster_collapse",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE ROUND({_COSINE_SQL.format(a='a.embedding', b='b.embedding')}, 6) >= 0.4
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.id
    )
    SELECT id AS member_id, MIN(r) AS cluster_rep
    FROM reach GROUP BY id ORDER BY member_id
    """,
)
def dedup_cluster_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the embedding near-dup pairs (iterative
    min-label propagation): every pair member mapped to its cluster's
    smallest id — the keep/drop decision a dedup pipeline actually needs
    (pairs alone don't say what to delete when dups chain a~b~c). Oracle:
    DuckDB recursive-CTE transitive closure.

    r13 measurement note: this graph chains ~15 deep (LPA runs 16
    rounds), so two_phase was A/B'd here — and LOST warm (4.08 s /
    83 jobs vs LPA 3.26 s / 70): its per-round extra exchanges cost
    more than LPA's extra rounds at this size. LPA kept; the two_phase
    escape hatch remains the documented choice for much deeper graphs."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = D.embedding_neardup_pairs(emb, "vec_id", "embedding", threshold=0.4)
    return D.dedup_clusters(pairs).orderBy("member_id")


# ----------------------------------------------------------- similarity --


_KNN_EXACT_ORACLE = f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND({_COSINE_SQL.format(a='q.embedding', b='c.embedding')}, 6) AS cosine
      FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """


@query("knn_cosine_topk", oracle=_KNN_EXACT_ORACLE)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for 10 query vectors (the ANN
    correctness baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    return (
        S.brute_force_topk(q, emb, "vec_id", "vec_id", "embedding", k=5)
        .withColumn("rank", F.col("rank").cast("int"))
        .orderBy("query_id", "rank")
    )


@query("knn_cosine_topk_pandas", oracle=_KNN_EXACT_ORACLE)
def knn_cosine_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same search as knn_cosine_topk through the Arrow/pandas_udf BLAS
    path — identical contract, so it reuses the exact-KNN oracle verbatim.
    numpy's pairwise summation and the expression fold agree after the
    6-decimal round (verified at sf0.01; pytest also asserts path
    agreement)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    return (
        S.brute_force_topk_pandas(q, emb, "vec_id", "vec_id", "embedding", k=5)
        .withColumn("rank", F.col("rank").cast("int"))
        .orderBy("query_id", "rank")
    )


@query("ann_lsh_topk")  # approximate → rows-only; pytest bounds recall
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH (4 tables × 8 planes) —
    the bucketed 100 TB path."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    return S.lsh_ann_topk(
        q, emb, "vec_id", "vec_id", "embedding", k=5, n_planes=4, n_tables=8
    ).orderBy("query_id", "rank")


@query("ann_ivf_topk")  # approximate → rows-only; pytest bounds recall
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via IVF-Flat (16 cells, 4 probes): spherical
    k-means coarse quantizer trained driver-side, BLAS cell assignment,
    exact re-rank within probed cells — the second ANN scale path."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    return S.ivf_topk(
        q, emb, "vec_id", "vec_id", "embedding", k=5, n_cells=16, n_probe=4
    ).orderBy("query_id", "rank")


_ANN_RECALL_ORACLE = """
    SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_results, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 10 ORDER BY query_id
    """


def _ann_recall(
    spark: SparkSession,
    sf_dir: str,
    ann,
    min_hits: int = 0,
    min_total_hits: int = 0,
) -> DataFrame:
    """Driver-checkable evidence for an approximate index: join its top-5
    against the exact top-5 (computed in-Spark) and emit, per query, the
    result count and a boolean asserting the recall bound holds. The
    oracle recomputes nothing approximate — it asserts the BOUND holds
    (hashes diverge if recall ever drops below the floor). Both engines
    are deterministic (seeded hyperplanes / hash-threshold k-means
    sample), so the bound is stable, not flaky.

    Two bound shapes, because not every index has a corpus-stable
    PER-QUERY floor (verified across sf0.001/0.01/0.1, whose embedding
    tables are distinct datasets): ``min_hits`` asserts every query
    retrieves >= that many true neighbors (LSH holds 2, IVF-Flat holds 1
    on all three corpora); ``min_total_hits`` asserts the AGGREGATE hit
    count over the 10 queries — the right claim for heavily-compressed
    indexes (IVF-PQ, Matryoshka truncation) where an individual query
    can legitimately lose all 5 neighbors on one corpus while aggregate
    recall stays flat. The boolean is constant across rows in that mode
    (total broadcast back), so the per-query output shape is unchanged."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    exact = S.brute_force_topk(q, emb, "vec_id", "vec_id", "embedding", k=5).select(
        "query_id", "neighbor_id"
    )
    approx = ann(q, emb).select("query_id", "neighbor_id")
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    per_query = (
        approx.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_results"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_results",
            F.coalesce(F.col("_hits"), F.lit(0)).alias("_hits"),
        )
    )
    if min_total_hits:
        total = per_query.agg(F.sum("_hits").alias("_total"))
        return (
            per_query.crossJoin(F.broadcast(total))
            .select(
                "query_id",
                "n_results",
                (F.col("_total") >= min_total_hits).alias("recall_ok"),
            )
            .orderBy("query_id")
        )
    return per_query.select(
        "query_id",
        "n_results",
        (F.col("_hits") >= min_hits).alias("recall_ok"),
    ).orderBy("query_id")


@query("ann_lsh_recall", oracle=_ANN_RECALL_ORACLE)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN quantified against the exact baseline: >= 2 of 5
    true neighbors per query (measured floor 2-4/5, mean recall 0.68 at
    4 planes × 8 tables; the per-query floor holds on all three shipped
    corpora, sf0.001/0.01/0.1 — verified by the second-SF parity suite)."""
    return _ann_recall(
        spark,
        sf_dir,
        lambda q, c: S.lsh_ann_topk(
            q, c, "vec_id", "vec_id", "embedding", k=5, n_planes=4, n_tables=8
        ),
        min_hits=2,
    )


@query("ann_ivf_recall", oracle=_ANN_RECALL_ORACLE)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN quantified against the exact baseline: >= 1 of 5 true
    neighbors per query (measured floor 1-4/5, mean recall 0.5 at 16
    cells / 4 probes — the 4x-cost-reduction operating point; n_probe=8
    reaches ~0.8; the per-query floor holds on all three shipped corpora,
    sf0.001/0.01/0.1)."""
    return _ann_recall(
        spark,
        sf_dir,
        lambda q, c: S.ivf_topk(
            q, c, "vec_id", "vec_id", "embedding", k=5, n_cells=16, n_probe=4
        ),
        min_hits=1,
    )


@query("ann_ivf_pq_recall", oracle=_ANN_RECALL_ORACLE)
def ann_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (m=8 subspaces x 16 codes = 32x vector compression,
    ADC shortlist + exact refine of the top 4k) quantified against the
    exact baseline via the AGGREGATE bound: >= 10 of 50 true neighbors
    across the 10 queries (measured total 17/17/18 at sf0.001/0.01/0.1 —
    ~0.35 mean recall at 16 cells / 4 probes, the operating point where
    the index is 32x smaller than IVF-Flat; recall recovers with n_probe
    and refine). A per-query floor is NOT corpus-stable for PQ: one
    query legitimately retrieves 0/5 on one of the three corpora while
    aggregate recall stays flat — caught by the second-SF parity suite."""
    return _ann_recall(
        spark,
        sf_dir,
        lambda q, c: S.ivf_pq_topk(
            q, c, "vec_id", "vec_id", "embedding",
            k=5, n_cells=16, n_probe=4, m=8, k_sub=16, refine=4,
        ),
        min_total_hits=10,
    )


# -------------------------------------------------------- text analysis --

_PAD = "(' ' || LOWER(text) || ' ')"


def _occ_sql(marker: str) -> str:
    escaped = marker.replace("'", "''")
    return (
        f"CAST((LENGTH({_PAD}) - LENGTH(REPLACE({_PAD}, '{escaped}', ''))) "
        f"/ {len(marker)} AS INTEGER)"
    )


def _lang_score_sql(lang: str) -> str:
    return " + ".join(_occ_sql(m) for m in T.LANG_MARKERS[lang])


@query(
    "text_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang AS labeled_lang,
        {_lang_score_sql('en')} AS score_en,
        {_lang_score_sql('es')} AS score_es,
        {_lang_score_sql('fr')} AS score_fr,
        {_lang_score_sql('de')} AS score_de
      FROM documents
    )
    SELECT doc_id, labeled_lang, score_en, score_es, score_fr, score_de,
      CASE
        WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_de
             AND score_en > 0 THEN 'en'
        WHEN score_es >= score_fr AND score_es >= score_de AND score_es > 0 THEN 'es'
        WHEN score_fr >= score_de AND score_fr > 0 THEN 'fr'
        WHEN score_de > 0 THEN 'de'
        ELSE 'unknown'
      END AS detected_lang
    FROM scored
    ORDER BY doc_id
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic marker-count language ID (n-gram/stopword heuristic);
    ties resolve in fixed priority order en>es>fr>de."""
    docs = load_table(spark, sf_dir, "documents")
    scores = {
        lang: T.lang_score(F.col("text"), lang) for lang in ("en", "es", "fr", "de")
    }
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[scores[lang].alias(f"score_{lang}") for lang in scores],
    )
    se, ss, sf_, sd = (F.col(f"score_{x}") for x in ("en", "es", "fr", "de"))
    detected = (
        F.when((se >= ss) & (se >= sf_) & (se >= sd) & (se > 0), "en")
        .when((ss >= sf_) & (ss >= sd) & (ss > 0), "es")
        .when((sf_ >= sd) & (sf_ > 0), "fr")
        .when(sd > 0, "de")
        .otherwise("unknown")
    )
    return scored.withColumn("detected_lang", detected).orderBy("doc_id")


@query(
    "text_quality_scores",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
        CAST(LENGTH(text) AS INTEGER) AS n_chars_measured,
        CAST(LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS INTEGER) AS n_tokens,
        CAST(LENGTH(REPLACE(text, ' ', '')) AS INTEGER) AS n_nonspace,
        {_occ_sql(' the ')} + {_occ_sql(' a ')} AS stopword_cnt
      FROM documents
    )
    SELECT doc_id, n_chars_measured, n_tokens,
      ROUND(CAST(n_nonspace AS DOUBLE) / n_tokens, 6) AS avg_token_len,
      ROUND(CAST(stopword_cnt AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
      CAST(((2000000 * CAST(8 * n_tokens * LEAST(n_tokens, 100)
                 + 600 * LEAST(5 * stopword_cnt, n_tokens)
                 + 75 * LEAST(n_nonspace, 8 * n_tokens) AS BIGINT)
             + 2000 * n_tokens) // (4000 * CAST(n_tokens AS BIGINT)))
           AS DOUBLE) / 1000000.0
        AS quality_score
    FROM m
    ORDER BY doc_id
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length, token stats, stopword density →
    a composite [0,1] score:
    0.4*min(tokens/100,1) + 0.3*min(5*stopword_ratio,1)
    + 0.3*min(avg_token_len/8,1).

    Cross-engine float discipline: the weighted sum is algebraically
    collapsed to ONE exact-integer numerator over the common denominator
    2000*n_tokens, and the 6-decimal HALF_UP round is computed in PURE
    INTEGER arithmetic — floor((2*num*10^6 + den) / (2*den)) — then
    divided by 10^6 once, so both engines emit the identical double.
    Float rounding alone cannot fix this case: a true value of exactly
    0.5006875 (sf0.001, caught by the second-SF parity suite) rounds UP
    in Spark (round() re-parses the double's shortest decimal string,
    HALF_UP) and DOWN in DuckDB (rounds the binary value, which sits
    just below the boundary) — the engines disagree BY DESIGN on
    boundary doubles, so the round must happen before any double
    exists."""
    docs = load_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    stop_cnt = (
        T.occurrence_count(padded, " the ") + T.occurrence_count(padded, " a ")
    )
    m = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        T.token_count(F.col("text")).alias("n_tokens"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias("n_nonspace"),
        stop_cnt.alias("stopword_cnt"),
    )
    nt = F.col("n_tokens")
    nns = F.col("n_nonspace")
    sc = F.col("stopword_cnt")
    numerator = (
        F.lit(8) * nt * F.least(nt, F.lit(100))
        + F.lit(600) * F.least(F.lit(5) * sc, nt)
        + F.lit(75) * F.least(nns, F.lit(8) * nt)
    ).cast("bigint")
    scored = m.withColumn(
        "_score_num", F.lit(2000000) * numerator + F.lit(2000) * nt
    ).withColumn("_score_den", (F.lit(4000) * nt).cast("bigint"))
    return scored.select(
        "doc_id",
        "n_chars_measured",
        "n_tokens",
        F.round(nns.cast("double") / nt, 6).alias("avg_token_len"),
        F.round(sc.cast("double") / nt, 6).alias("stopword_ratio"),
        (
            F.expr("_score_num div _score_den").cast("double")
            / F.lit(1000000.0)
        ).alias("quality_score"),
    ).orderBy("doc_id")


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
      CAST(LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS INTEGER) AS whitespace_tokens,
      CAST(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER)
        AS bpe_ish_tokens,
      n_chars AS n_chars_labeled,
      CAST(LENGTH(text) AS INTEGER) AS n_chars_measured
    FROM documents
    ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex piece count
    (token-budget estimation for LLM pipelines)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("whitespace_tokens"),
        T.bpe_ish_token_count(F.col("text")).alias("bpe_ish_tokens"),
        F.col("n_chars").alias("n_chars_labeled"),
        F.length("text").alias("n_chars_measured"),
    ).orderBy("doc_id")


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
      md5({_NORM_SQL}) AS fingerprint,
      SUBSTRING(md5({_NORM_SQL}), 1, 8) AS fingerprint_prefix
    FROM documents
    ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-text fingerprint (md5 over normalized content) — the
    join key for cross-corpus dedup."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(T.normalize_text(F.col("text")).cast("binary"))
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("fingerprint_prefix"),
    ).orderBy("doc_id")


@query(
    "doc_stats_by_lang_source",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def doc_stats_by_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "source")
    )


@query(
    "corpus_curation_pipeline",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id, lang,
        MD5(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9\s]', ' ', 'g'),
                                '\s+', ' ', 'g'))) AS content_hash,
        CAST(LEN(regexp_split_to_array(TRIM(text), '\s+')) AS INTEGER) AS n_tokens
      FROM documents
    ),
    rep AS (SELECT content_hash, MIN(doc_id) AS rep_id FROM norm GROUP BY content_hash),
    kept AS (
      SELECT n.* FROM norm n JOIN rep r ON n.doc_id = r.rep_id
      WHERE n.n_tokens >= 20
        AND (('0x' || SUBSTRING(MD5(CAST(n.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100) < 50
    )
    SELECT lang, COUNT(*) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      ROUND(AVG(CAST(n_tokens AS DOUBLE)), 6) AS avg_tokens
    FROM kept GROUP BY lang ORDER BY lang
    """,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline as ONE composed plan — the shape a real
    training-data job runs: exact dedup (keep min-id representative) →
    quality gate (>= 20 tokens) → deterministic 50% hash sample → corpus
    stats per language. Every stage is an engine operator; Catalyst fuses
    the whole chain so the corpus is scanned once, shuffled only by the
    dedup groupBy and the final stats groupBy."""
    from pucminas_data_pipelines_spark.operators.sampling import deterministic_sample

    docs = load_table(spark, sf_dir, "documents")
    reps = D.exact_duplicates(docs, "doc_id", "text", normalized=True).select(
        F.col("representative_id").alias("doc_id")
    )
    kept = (
        docs.join(reps, "doc_id", "left_semi")
        .withColumn("n_tokens", T.token_count(F.col("text")))
        .where(F.col("n_tokens") >= 20)
    )
    sampled = deterministic_sample(kept, "doc_id", percent=50)
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg(F.col("n_tokens").cast("double")), 6).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------------------- ranking --

_BM25_TERMS = ("join", "scan", "hash")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "text_bm25_rank",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.token
      FROM documents, UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS t(token)
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM tok WHERE token IN ('join', 'scan', 'hash')
      GROUP BY doc_id, token
    ),
    df AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY token),
    w AS (
      SELECT tf.doc_id, tf.token,
             LN((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
               * (tf.tf * (1.2 + 1))
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS w
      FROM tf
      JOIN df USING (token)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
    )
    SELECT doc_id,
           ROUND(COALESCE(MAX(CASE WHEN token = 'join' THEN w END), 0)
               + COALESCE(MAX(CASE WHEN token = 'scan' THEN w END), 0)
               + COALESCE(MAX(CASE WHEN token = 'hash' THEN w END), 0), 6) AS bm25
    FROM w
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 15
    """,
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword ranking over the corpus (k1=1.2, b=0.75), index-free:
    explode → tf/df/doclen aggregates → per-term weights → fixed-order
    summation → top-k. The per-term contributions are pivoted to columns
    and added in a FIXED order on both engines — double addition is not
    associative, so an arbitrary-order SUM could diverge at the last ulp
    and flip the top-k boundary.

    Scale: ONE tokenize+explode pass over the corpus (the tf leg, which
    filters to the query terms BEFORE its shuffle and carries the doc
    length through its groupBy), plus one narrow row-local scan for the
    corpus stats (size(split()) — no explode, no per-doc shuffle). The
    df leg re-plans tf's subtree (a second tokenize pass, but one AQE
    overlaps with the tf leg's build; checkpointing tf to share it was
    measured SLOWER because the eager checkpoint serializes legs that
    otherwise overlap — same lesson as the prefix-join dead end); df and
    the corpus stats are tiny broadcast scalars; top-k is TakeOrdered.
    An inverted index would
    beat this for point queries — this is the full-corpus scoring pass
    a training-data pipeline runs.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    # Corpus stats (n_docs, avgdl) from a ROW-LOCAL doc-length projection:
    # size(split(..)) is the same per-doc token count the old
    # explode→groupBy(doc_id) leg shuffled the whole corpus to compute
    # (split of non-null text is never empty, so explode emitted exactly
    # size(array) rows per doc; the isNotNull filter replicates explode
    # dropping null-text docs). One narrow scan, a 32-row partial
    # aggregate, zero exchanges on the corpus grain (guide §2.4).
    stats = (
        docs.where(F.col("text").isNotNull())
        .select(F.size(toks).alias("dl"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        )
    )
    # tf with dl CARRIED THROUGH the explode as a grouping key (dl is
    # functionally dependent on doc_id, so the extra key is free) — the
    # old shape re-joined the doc-length table onto tf afterwards. The
    # doc_id filter replicates the old inner join's null-key semantics.
    tf = (
        docs.where(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
        .select("doc_id", toks.alias("_toks"))
        .select(
            "doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("token")
        )
        .where(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1)
    )
    norm = F.col("tf") + F.lit(_BM25_K1) * (
        F.lit(1) - F.lit(_BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
    )
    w = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "token",
            (idf * (F.col("tf") * F.lit(_BM25_K1 + 1)) / norm).alias("w"),
        )
    )
    contrib = [
        F.coalesce(
            F.max(F.when(F.col("token") == t, F.col("w"))), F.lit(0.0)
        )
        for t in _BM25_TERMS
    ]
    return (
        w.groupBy("doc_id")
        .agg(F.round(contrib[0] + contrib[1] + contrib[2], 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(15)
    )


_RRF_K0 = 60  # the standard RRF damping constant (Cormack et al. 2009)
_RRF_TOPK = 5
_RRF_NQ = 3  # query documents: doc_id < 3


@query(
    "knn_hybrid_rrf",
    oracle=f"""
    WITH tokc AS (
      SELECT DISTINCT doc_id, t.token
      FROM documents,
           UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS t(token)
    ),
    tq AS (SELECT doc_id AS query_id, token FROM tokc WHERE doc_id < {_RRF_NQ}),
    toks_f AS (
      SELECT doc_id, token FROM tokc
      WHERE token IN (SELECT DISTINCT token FROM tq)
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    idf AS (
      SELECT token,
             CAST(ROUND(LN((n.n_docs + 1.0) / (COUNT(*) + 1.0)), 9)
               AS DECIMAL(18, 9)) AS idf
      FROM toks_f CROSS JOIN n
      GROUP BY token, n.n_docs
    ),
    lex AS (
      SELECT tq.query_id, tf.doc_id, SUM(idf.idf) AS lex_score
      FROM tq
      JOIN toks_f tf USING (token)
      JOIN idf USING (token)
      GROUP BY tq.query_id, tf.doc_id
    ),
    dense AS (
      SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
             ROUND({_COSINE_SQL.format(a='q.embedding', b='c.embedding')}, 6) AS cosine
      FROM embeddings q
      JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {_RRF_NQ}
    ),
    combined AS (
      SELECT d.query_id, d.doc_id, d.cosine,
             COALESCE(l.lex_score, CAST(0 AS DECIMAL(18, 9))) AS lex_score
      FROM dense d
      LEFT JOIN lex l ON d.query_id = l.query_id AND d.doc_id = l.doc_id
    ),
    ranked AS (
      SELECT query_id, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, doc_id) AS INT) AS dense_rank,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY lex_score DESC, doc_id) AS INT) AS lex_rank
      FROM combined
    ),
    fused AS (
      SELECT query_id, doc_id, dense_rank, lex_rank,
             ROUND(CAST(1 AS DOUBLE) / ({_RRF_K0} + dense_rank)
                 + CAST(1 AS DOUBLE) / ({_RRF_K0} + lex_rank), 6) AS rrf_score
      FROM ranked
    ),
    top AS (
      SELECT query_id, doc_id, rrf_score, dense_rank, lex_rank,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
      FROM fused
    )
    SELECT query_id, rank, doc_id, rrf_score, dense_rank, lex_rank
    FROM top WHERE rank <= {_RRF_TOPK} ORDER BY query_id, rank
    """,
)
def knn_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al.,
    SIGIR 2009): every corpus document is ranked per query by BOTH a
    dense leg (exact cosine over the embedding column; embeddings.vec_id
    is the embedding of documents.doc_id) and a lexical leg
    (IDF-weighted distinct-token overlap with the query document), then
    fused as rrf = 1/(60+r_dense) + 1/(60+r_lex) and cut to the top-5 —
    the standard RAG retrieval stack (BM25/SPLADE x dense bi-encoder ->
    RRF) expressed as joins + windows.

    Determinism: cosines are rounded to 6 decimals before ranking (the
    kNN idiom); per-token IDF is quantized to DECIMAL(18,9) so lexical
    scores are EXACT decimal sums; both rank columns are integers, so
    the fused score is the same pair of correctly-rounded IEEE divisions
    on both engines, summed in a fixed order; every window breaks ties
    by doc_id.

    Scale: the query-token set and per-term IDF table BROADCAST; the
    corpus token stream is semi-join-filtered to query terms BEFORE its
    one aggregation shuffle (an inverted-index probe, not a corpus
    scan); the dense leg broadcasts the query vectors so the corpus
    never shuffles (the ANN operators replace brute-force at 100 TB —
    swap ann_lsh/ivf_topk in for the dense leg; fusion is rank-based so
    nothing else changes); ranking windows are partitioned per query."""
    from pucminas_data_pipelines_spark.functions.vector import (
        cosine_from_norms,
        norm,
    )
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    tokc = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    ).distinct()
    tq = tokc.where(F.col("doc_id") < _RRF_NQ).select(
        F.col("doc_id").alias("query_id"), "token"
    )
    toks_f = tokc.join(
        F.broadcast(tq.select("token").distinct()), "token", "left_semi"
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    idf = (
        toks_f.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            F.round(
                F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                9,
            )
            .cast("decimal(18,9)")
            .alias("idf"),
        )
    )
    lex = (
        tq.join(toks_f, "token")
        .join(F.broadcast(idf), "token")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("idf").alias("lex_score"))
    )
    # side norms hoisted out of the query fan-out (once per vector row,
    # not per (query, doc) pair) — bit-identical via cosine_from_norms
    q = (
        emb.where(F.col("vec_id") < _RRF_NQ)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
        )
        .withColumn("_qn", norm(F.col("q_vec")))
    )
    dense = (
        emb.withColumn("_cn", norm(F.col("embedding")))
        .crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.round(
                cosine_from_norms(
                    F.col("q_vec"), F.col("embedding"), F.col("_qn"), F.col("_cn")
                ),
                6,
            ).alias("cosine"),
        )
    )
    both = dense.join(lex, ["query_id", "doc_id"], "left").select(
        "query_id",
        "doc_id",
        "cosine",
        F.coalesce(F.col("lex_score"), F.lit(0).cast("decimal(18,9)")).alias(
            "lex_score"
        ),
    )
    wd = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "doc_id")
    wl = Window.partitionBy("query_id").orderBy(F.desc("lex_score"), "doc_id")
    ranked = both.select(
        "query_id",
        "doc_id",
        F.row_number().over(wd).cast("int").alias("dense_rank"),
        F.row_number().over(wl).cast("int").alias("lex_rank"),
    )
    fused = ranked.withColumn(
        "rrf_score",
        F.round(
            F.lit(1.0) / (F.lit(_RRF_K0) + F.col("dense_rank"))
            + F.lit(1.0) / (F.lit(_RRF_K0) + F.col("lex_rank")),
            6,
        ),
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("int"))
        .where(F.col("rank") <= _RRF_TOPK)
        .select("query_id", "rank", "doc_id", "rrf_score", "dense_rank", "lex_rank")
        .orderBy("query_id", "rank")
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.token
      FROM documents, UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS t(token)
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM tok GROUP BY doc_id, token
    ),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM tok)
    SELECT doc_id, token,
           ROUND(tf * LN(n_docs / df), 6) AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    WHERE doc_id < 10
    ORDER BY doc_id, tfidf DESC, token
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF term weights (raw tf × ln(N/df)) — the feature
    primitive for keyword extraction and sparse retrieval.

    Scale: tf is the one explode-sized shuffle; df aggregates tf's
    (already deduped) output, not the raw tokens; N is a broadcast
    scalar. The doc_id<10 projection is display-side only — at 100 TB
    the same plan runs unfiltered into a sink, and the df side stays
    vocabulary-sized (≪ corpus-sized).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    tf.persist()
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = tok.agg(F.countDistinct("doc_id").cast("double").alias("n_docs"))
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .where(F.col("doc_id") < 10)
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
        .orderBy("doc_id", F.col("tfidf").desc(), "token")
    )


@query(
    "text_fuzzy_entity_match",
    oracle="""
    WITH probes AS (
      SELECT * FROM (VALUES
        ('Custmer#000000042'), ('Customer#00000013'),
        ('Customer#000000777x'), ('Kustomer#000000900')
      ) AS p(probe)
    ),
    scored AS (
      SELECT probe, c_name, levenshtein(probe, c_name) AS d
      FROM probes CROSS JOIN customer
    ),
    best AS (SELECT probe, MIN(d) AS best_distance FROM scored GROUP BY probe)
    SELECT s.probe, b.best_distance, MIN(s.c_name) AS best_match
    FROM scored s JOIN best b ON s.probe = b.probe AND s.d = b.best_distance
    WHERE b.best_distance <= 3
    GROUP BY s.probe, b.best_distance
    ORDER BY s.probe
    """,
)
def text_fuzzy_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution: each probe string matched to its nearest
    dimension name by Levenshtein edit distance (≤3), ties broken by
    lexicographic min so the answer is deterministic — the lookup step
    of a typo-tolerant entity-matching pipeline.

    Scale: the probe list broadcasts and the scoring is a map-side
    cross-product over the dim — O(|probes| × |dim|) edit distances,
    fine for probe batches; at large |probes| block first (shared
    prefix/length buckets or LSH over character n-grams, same machinery
    as dedup_minhash_lsh) so only candidate pairs are scored. min-dist
    selection is the q2/q15 aggregate-then-equality-join pattern.
    """
    probes = spark.createDataFrame(
        [
            ("Custmer#000000042",),
            ("Customer#00000013",),
            ("Customer#000000777x",),
            ("Kustomer#000000900",),
        ],
        "probe string",
    )
    c = load_table(spark, sf_dir, "customer").select("c_name")
    scored = (
        c.crossJoin(F.broadcast(probes))
        .select("probe", "c_name", F.levenshtein("probe", "c_name").alias("d"))
    )
    scored.persist()
    best = scored.groupBy(F.col("probe").alias("_p")).agg(
        F.min("d").alias("best_distance")
    )
    return (
        scored.join(
            F.broadcast(best),
            (F.col("probe") == F.col("_p")) & (F.col("d") == F.col("best_distance")),
        )
        .where(F.col("best_distance") <= 3)
        .groupBy("probe", "best_distance")
        .agg(F.min("c_name").alias("best_match"))
        .orderBy("probe")
    )


@query(
    "text_bigram_frequencies",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS arr
      FROM documents
    ),
    positioned AS (
      SELECT doc_id, g.i AS pos, arr[g.i] AS token
      FROM toks, UNNEST(generate_series(1, len(arr))) AS g(i)
    ),
    bigrams AS (
      SELECT token,
             LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos) AS next_token
      FROM positioned
    )
    SELECT token, next_token, COUNT(*) AS freq
    FROM bigrams
    WHERE next_token IS NOT NULL
    GROUP BY token, next_token
    ORDER BY freq DESC, token, next_token
    LIMIT 20
    """,
)
def text_bigram_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram (next-token) frequencies — the n-gram language-model
    counting primitive: position-preserving explode, a per-document LEAD
    window to pair each token with its successor, then a global count.

    Scale: the LEAD window partitions by doc_id (one shuffle, bounded
    partitions — a document's tokens, never the corpus); the bigram
    count is map-side combined to the (vocab²-bounded, Zipf-truncated)
    distinct-pair set; top-k is TakeOrdered. For trigrams+ the same plan
    adds LEAD offsets, not extra shuffles.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    positioned = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "token"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        positioned.select(
            "token", F.lead("token").over(w).alias("next_token")
        )
        .where(F.col("next_token").isNotNull())
        .groupBy("token", "next_token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"), F.col("next_token"))
        .limit(20)
    )


# ------------------------------------------- embedding quantization --


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
      FROM embeddings
    ),
    rng AS (
      SELECT vec_id, label, vd,
             list_min(vd) AS mn,
             (list_max(vd) - list_min(vd)) / 255.0 AS scale
      FROM v
    ),
    coded AS (
      SELECT vec_id, label, vd, mn, scale,
             list_transform(vd, x -> CASE WHEN scale = 0 THEN 0
               ELSE CAST(floor((x - mn) / scale + 0.5) AS INT) - 128 END) AS codes
      FROM rng
    )
    SELECT vec_id, label,
           round(scale, 6) AS scale,
           CAST(list_min(codes) AS INT) AS code_min,
           CAST(list_max(codes) AS INT) AS code_max,
           round(list_aggregate(list_transform(list_zip(codes, vd),
             z -> abs((CAST(z[1] AS DOUBLE) + 128) * scale + mn
                      - CAST(z[2] AS DOUBLE))), 'max'), 6) AS max_abs_err,
           round(list_aggregate(list_transform(list_zip(codes, vd),
             z -> ((CAST(z[1] AS DOUBLE) + 128) * scale + mn - CAST(z[2] AS DOUBLE))
                * ((CAST(z[1] AS DOUBLE) + 128) * scale + mn - CAST(z[2] AS DOUBLE))),
             'sum') / len(vd), 9) AS mse
    FROM coded
    ORDER BY vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization (min/max affine, the faiss
    SQ8 scheme): codes = floor((x - min)/scale + 0.5) - 128, plus the
    reconstruction-error audit (max abs error bounded by scale/2, MSE).
    4x memory cut for ANN candidate storage; the audit row is what a
    production pipeline materializes next to the codes.

    Pure per-row HOF expressions — no shuffle at all; quantizing 100 TB
    of embeddings is one map pass writing codes+scale+min per vector.
    floor(v + 0.5) instead of round() because Spark HALF_UP and engine
    round() tie-break rules differ; floor is bit-deterministic in both."""
    emb = load_table(spark, sf_dir, "embeddings")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    rng = emb.select(
        "vec_id",
        "label",
        vd.alias("vd"),
    ).select(
        "vec_id",
        "label",
        "vd",
        F.array_min("vd").alias("mn"),
        ((F.array_max("vd") - F.array_min("vd")) / F.lit(255.0)).alias("scale"),
    )
    codes = F.transform(
        F.col("vd"),
        lambda x: F.when(F.col("scale") == 0, F.lit(0)).otherwise(
            F.floor((x - F.col("mn")) / F.col("scale") + F.lit(0.5)).cast("int")
            - F.lit(128)
        ),
    )
    coded = rng.select("vec_id", "label", "vd", "mn", "scale", codes.alias("codes"))
    recon = F.zip_with(
        F.col("codes"),
        F.col("vd"),
        lambda c, x: (c.cast("double") + F.lit(128.0)) * F.col("scale")
        + F.col("mn")
        - x,
    )
    # metrics in their own projection: re-using the name "scale" for the
    # rounded output in the SAME select would let Spark's lateral-column-
    # alias resolution feed the ROUNDED scale back into the reconstruction
    # (observed: max_abs_err off by ~1e-6 vs the oracle)
    metrics = coded.select(
        "vec_id",
        "label",
        "scale",
        F.array_min("codes").cast("int").alias("code_min"),
        F.array_max("codes").cast("int").alias("code_max"),
        F.array_max(F.transform(recon, lambda d: F.abs(d))).alias("_max_err"),
        (
            F.aggregate(
                F.transform(recon, lambda d: d * d),
                F.lit(0.0),
                lambda acc, d: acc + d,
            )
            / F.size("vd")
        ).alias("_mse"),
    )
    return metrics.select(
        "vec_id",
        "label",
        F.round("scale", 6).alias("scale"),
        "code_min",
        "code_max",
        F.round("_max_err", 6).alias("max_abs_err"),
        F.round("_mse", 9).alias("mse"),
    ).orderBy("vec_id")


# ------------------------------------------------------ semantic dedup --


@query(
    "dedup_semantic_recall",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE {_COSINE_SQL.format(a='a.embedding', b='b.embedding')} >= 0.4
    )
    SELECT COUNT(*) AS n_true_pairs, TRUE AS recall_ok FROM pairs
    """,
)
def dedup_semantic_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup quantified against the exact
    cosine pair list: semantic_dup_pairs (IVF-cell bucketed + exact
    verify, operators/similarity.py) must retrieve >= 90% of all true
    pairs at threshold 0.4 (measured 59/59 = 1.0 at sf0.01 and 889/920 =
    0.966 at sf0.1 with 16 cells × 4 assigns — 3 assigns held at sf0.01
    but dipped to 0.857 at sf0.1; deterministic — seeded centroids,
    hash-threshold sample). The oracle computes the exact pair count in
    DuckDB and asserts the bound; precision needs no bound — it is 1.0
    by construction (every candidate is exact-cosine verified).

    The exact all-pairs baseline here is the verification harness, not
    the operator: at 100 TB only the cell-bucketed operator runs."""
    emb = load_table(spark, sf_dir, "embeddings")
    approx = S.semantic_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, n_cells=16, n_assign=4
    ).select("id_a", "id_b")
    exact = D.embedding_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.4
    ).select("id_a", "id_b")
    hits = exact.join(approx, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).alias("n_found")
    )
    return (
        exact.agg(F.count(F.lit(1)).alias("n_true_pairs"))
        .crossJoin(hits)
        .select(
            "n_true_pairs",
            (
                F.col("n_found").cast("double")
                / F.col("n_true_pairs").cast("double")
                >= 0.9
            ).alias("recall_ok"),
        )
    )


# ------------------------------------------- LM-quality (perplexity proxy) --


@query(
    "text_lm_quality_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS arr
      FROM documents
    ),
    positioned AS (
      SELECT doc_id, g.i AS pos, arr[g.i] AS token
      FROM toks, UNNEST(generate_series(1, len(arr))) AS g(i)
    ),
    bigr AS (
      SELECT doc_id, token AS w1,
             LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM positioned
    ),
    pairs AS (SELECT doc_id, w1, w2 FROM bigr WHERE w2 IS NOT NULL),
    lm12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
    lm1 AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1),
    vocab AS (SELECT COUNT(DISTINCT token) AS v FROM positioned),
    scored AS (
      SELECT p.doc_id,
             CAST(round(-ln((l12.c12 + 1.0) / (l1.c1 + vocab.v)), 9)
                  AS DECIMAL(18,9)) AS nll
      FROM pairs p
      JOIN lm12 l12 ON p.w1 = l12.w1 AND p.w2 = l12.w2
      JOIN lm1 l1 ON p.w1 = l1.w1
      CROSS JOIN vocab
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           round(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-based quality scoring (the CCNet/RefinedWeb filter, with the
    corpus itself as the LM): train add-1-smoothed bigram statistics over
    the corpus, then score each document by its average negative
    log-likelihood — gibberish and boilerplate sit in the tails of the
    avg_nll distribution, and a real pipeline thresholds on it.

    Shape at 100 TB: bigram extraction is one LEAD window per doc (one
    shuffle on doc_id); the LM tables are two zipfian-key group-bys that
    map-combine hard (the head of the bigram distribution collapses
    map-side); scoring re-joins the bigram stream to the LM on (w1, w2)
    — at web scale the LM head fits a broadcast, the tail join leans on
    AQE skew splitting. Per-bigram NLL is rounded then summed in DECIMAL
    so the per-doc mean is engine-exact (double summation order is not
    associative; this discipline is repo-wide)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    positioned = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "token"),
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    pairs = (
        positioned.select(
            "doc_id",
            F.col("token").alias("w1"),
            F.lead("token").over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )
    lm12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    lm1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = positioned.agg(F.countDistinct("token").alias("v"))
    scored = (
        pairs.join(lm12, ["w1", "w2"])
        .join(lm1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                -F.log(
                    (F.col("c12") + F.lit(1.0))
                    / (F.col("c1") + F.col("v"))
                ),
                9,
            )
            .cast("decimal(18,9)")
            .alias("nll"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("nll").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_nll"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "embedding_label_centroids",
    oracle="""
    WITH comps AS (
      SELECT label, g.i - 1 AS pos,
             CAST(SUM(CAST(embedding[g.i] AS DECIMAL(20,10))) AS DOUBLE)
               / COUNT(*) AS comp,
             COUNT(*) AS n_vecs
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
      GROUP BY label, g.i
    )
    SELECT label,
           CAST(MAX(n_vecs) AS BIGINT) AS n_vecs,
           CAST(COUNT(*) AS INT) AS dim,
           round(CAST(SUM(CAST(round(comp * comp, 12) AS DECIMAL(24,12)))
                      AS DOUBLE), 8) AS centroid_sq_norm
    FROM comps
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed per-group centroid: elementwise mean embedding per
    label — the aggregation primitive behind k-means refresh, SemDeDup
    cluster centers, and class prototypes. Summarized per label as
    (n_vecs, dim, squared centroid norm) for the driver check.

    Shape at 100 TB: posexplode keys the shuffle by (label, position) —
    |labels| × dim groups, each a map-combined decimal sum, so the
    shuffle moves one row per partition × group regardless of corpus
    size. No driver-side vectors at any point (contrast: the IVF
    quantizer trains on a SAMPLE driver-side; this is the full-data
    path). Component sums run in DECIMAL, and comp² is rounded before
    the final decimal sum, so both engine's results are bit-equal."""
    emb = load_table(spark, sf_dir, "embeddings")
    comps = (
        emb.select(
            "label", F.posexplode("embedding").alias("pos", "val")
        )
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("comp"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )
    return (
        comps.groupBy("label")
        .agg(
            F.max("n_vecs").cast("bigint").alias("n_vecs"),
            F.count(F.lit(1)).cast("int").alias("dim"),
            F.round(
                F.sum(
                    F.round(F.col("comp") * F.col("comp"), 12).cast(
                        "decimal(24,12)"
                    )
                ).cast("double"),
                8,
            ).alias("centroid_sq_norm"),
        )
        .orderBy("label")
    )


@query(
    "dedup_minhash_clusters",
    oracle=_JACCARD_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + """
    , pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.3),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT reach.id, edges.b FROM reach JOIN edges ON reach.r = edges.a
    ),
    lab AS (SELECT id AS member_id, MIN(r) AS cluster_rep FROM reach GROUP BY id),
    sz AS (SELECT cluster_rep, COUNT(*) AS cs FROM lab GROUP BY cluster_rep)
    SELECT l.member_id, l.cluster_rep, CAST(s.cs AS BIGINT) AS cluster_size
    FROM lab l JOIN sz s USING (cluster_rep)
    ORDER BY member_id
    """,
)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup pairs collapsed into duplicate CLUSTERS — the
    production end-state of text dedup: pairs alone don't say which copies
    to drop when duplicates chain a~b~c, so the pair graph is reduced to
    connected components (operators/dedup.dedup_clusters: iterative
    min-label propagation, localCheckpoint per round) and each member is
    tagged with its cluster representative (the row to KEEP) and cluster
    size. Oracle: DuckDB recursive transitive closure over the exact
    shingle-Jaccard pair set, valid because LSH pair recall is 1.0 on this
    corpus at threshold 0.3 (wide jaccard margin; see dedup_minhash_lsh).

    Scale: pair generation is the banded-LSH shuffle (never all-pairs);
    label propagation is one narrow (id, label) shuffle round per graph
    diameter — near-dup clusters are shallow stars, 3-5 rounds."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    pairs = D.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.3
    ).select("id_a", "id_b")
    labels = D.dedup_clusters(pairs)
    w = Window.partitionBy("cluster_rep")
    return (
        labels.withColumn(
            "cluster_size", F.count(F.lit(1)).over(w).cast("bigint")
        )
        .select("member_id", "cluster_rep", "cluster_size")
        .orderBy("member_id")
    )


@query(
    "dedup_cluster_keep_best",
    oracle=_JACCARD_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + """
    , pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.3),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT reach.id, edges.b FROM reach JOIN edges ON reach.r = edges.a
    ),
    lab AS (SELECT id AS member_id, MIN(r) AS cluster_rep FROM reach GROUP BY id),
    ranked AS (
      SELECT l.cluster_rep, l.member_id, d.n_chars,
             COUNT(*) OVER (PARTITION BY l.cluster_rep) AS cs,
             ROW_NUMBER() OVER (
               PARTITION BY l.cluster_rep
               ORDER BY d.n_chars DESC, l.member_id ASC
             ) AS rn
      FROM lab l JOIN documents d ON d.doc_id = l.member_id
    )
    SELECT cluster_rep, member_id AS keep_id, n_chars AS keep_chars,
           CAST(cs AS BIGINT) AS cluster_size
    FROM ranked WHERE rn = 1
    ORDER BY cluster_rep
    """,
)
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection after cluster collapse: per duplicate
    cluster, KEEP the highest-quality member (longest text here; ties to
    the smallest id) instead of an arbitrary one — what production dedup
    actually ships, since near-dup copies differ in truncation and
    boilerplate and dropping the wrong one loses content. Composition:
    MinHash pairs -> connected components -> join quality -> argmax per
    cluster.

    Scale: the quality join touches only cluster MEMBERS (a left-semi
    -sized slice of the corpus, joined by id); per-cluster argmax is one
    row_number window over clusters, whose total size is the duplicate
    count, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    pairs = D.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.3
    ).select("id_a", "id_b")
    labels = D.dedup_clusters(pairs)
    j = labels.join(
        docs.select(F.col("doc_id").alias("member_id"), "n_chars"),
        "member_id",
    )
    w_cs = Window.partitionBy("cluster_rep")
    w_rn = Window.partitionBy("cluster_rep").orderBy(
        F.col("n_chars").desc(), F.col("member_id").asc()
    )
    return (
        j.withColumn("cluster_size", F.count(F.lit(1)).over(w_cs).cast("bigint"))
        .withColumn("rn", F.row_number().over(w_rn))
        .where(F.col("rn") == 1)
        .select(
            "cluster_rep",
            F.col("member_id").alias("keep_id"),
            F.col("n_chars").alias("keep_chars"),
            "cluster_size",
        )
        .orderBy("cluster_rep")
    )


@query(
    "dedup_ngram_containment",
    oracle=_JACCARD_CTE
    + """
    , cont AS (
      SELECT j.id_a, j.id_b, j.jaccard,
             ROUND(CAST(i.i AS DOUBLE) / ca.n, 6) AS containment_a_in_b,
             ROUND(CAST(i.i AS DOUBLE) / cb.n, 6) AS containment_b_in_a
      FROM jac j
      JOIN inter i ON i.id_a = j.id_a AND i.id_b = j.id_b
      JOIN cnt ca ON ca.doc_id = j.id_a
      JOIN cnt cb ON cb.doc_id = j.id_b
    )
    SELECT id_a, id_b, jaccard, containment_a_in_b, containment_b_in_a
    FROM cont WHERE jaccard >= 0.3 ORDER BY id_a, id_b
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional CONTAINMENT scores (|A∩B|/|A| and |A∩B|/|B|) next to
    symmetric Jaccard for each near-dup pair — the metric that separates
    "these documents are copies" from "one quotes the other": a short doc
    embedded in a long one shows high containment at modest Jaccard, and
    the asymmetry says which side is the subset (drop the contained copy,
    keep the superset). Shingle sets and intersections are computed once
    and feed all three ratios.

    Scale: identical find->verify shape as dedup_ngram_jaccard — LSH
    candidates only, the intersection join carries (pair, shingle-hash),
    never document text."""
    docs = load_table(spark, sf_dir, "documents")
    cands = D.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.2
    )
    pairs = D.ngram_jaccard_pairs(
        cands, docs, "doc_id", "text", threshold=0.3, with_counts=True
    )
    return pairs.select(
        "id_a",
        "id_b",
        "jaccard",
        F.round(F.col("n_common") / F.col("n_a"), 6).alias(
            "containment_a_in_b"
        ),
        F.round(F.col("n_common") / F.col("n_b"), 6).alias(
            "containment_b_in_a"
        ),
    ).orderBy("id_a", "id_b")


@query(
    "dedup_span_redaction",
    oracle=_SPAN_CTE
    + """
    , tk AS (
      SELECT doc_id, i - 1 AS tpos, w[i] AS tok
      FROM toks, LATERAL unnest(generate_series(1, len(w))) AS t(i)
    ),
    keep AS (
      SELECT t.doc_id, t.tpos, t.tok
      FROM tk t
      WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.doc_id = t.doc_id
          AND t.tpos >= s.span_start
          AND t.tpos < s.span_start + s.span_len_tokens
      )
    ),
    agg AS (
      SELECT doc_id,
             COUNT(*) AS n_tokens_kept,
             md5(string_agg(tok, ' ' ORDER BY tpos)) AS redacted_md5
      FROM keep GROUP BY doc_id
    ),
    orig AS (SELECT doc_id, len(w) AS n_total FROM toks)
    SELECT o.doc_id,
           CAST(COALESCE(a.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
           CAST(o.n_total - COALESCE(a.n_tokens_kept, 0) AS BIGINT)
             AS n_tokens_dropped,
           COALESCE(a.redacted_md5, md5('')) AS redacted_md5
    FROM orig o LEFT JOIN agg a USING (doc_id)
    ORDER BY doc_id
    """,
)
def dedup_span_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span REDACTION (operators/dedup.redact_duplicated_spans): every
    duplicated 8-token span is cut from its document and the remainder
    re-assembled in order — the Lee-et-al corpus rewrite, end-to-end.
    The oracle rebuilds each redacted document independently in SQL and
    compares md5 of the result, so the check is byte-identical
    reconstruction, not just counts."""
    docs = load_table(spark, sf_dir, "documents")
    out = D.redact_duplicated_spans(docs, "doc_id", "text", span_tokens=8)
    return out.select(
        "doc_id",
        "n_tokens_kept",
        "n_tokens_dropped",
        F.md5(F.col("redacted_text").cast("binary")).alias("redacted_md5"),
    ).orderBy("doc_id")


@query(
    "text_bpe_merge_pairs",
    oracle="""
    WITH tok AS (
      SELECT regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS t
      FROM documents
    )
    SELECT p.pr[1] AS left_tok, p.pr[2] AS right_tok,
           CAST(COUNT(*) AS BIGINT) AS pair_count
    FROM tok, UNNEST(list_zip(t[:-2], t[2:])) AS p(pr)
    GROUP BY left_tok, right_tok
    ORDER BY pair_count DESC, left_tok, right_tok
    LIMIT 20
    """,
)
def text_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge iteration's statistics pass (Sennrich et al. 2016):
    count every adjacent token pair across the corpus and surface the 20
    most frequent — the pair a tokenizer trainer would merge next.

    Scale: pairs are formed INSIDE each document row with zip(arr, arr[1:])
    before the explode, so no self-join and no positional shuffle — the
    only shuffle is the map-side-combined pair-count aggregate, whose
    cardinality is the pair vocabulary (bounded), not the corpus size. The
    oracle forms the same pairs via a positional self-join, which is fine
    at sf0.01 but exactly the plan this query deliberately avoids."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("l"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("r"),
    )
    return (
        d.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.l").alias("left_tok"),
            F.col("p.r").alias("right_tok"),
        )
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left_tok", "right_tok")
        .limit(20)
    )


@query(
    "text_char_diversity",
    oracle="""
    WITH chars AS (
      SELECT d.doc_id, d.lang, c.ch
      FROM documents d,
           UNNEST(string_split(LOWER(d.text), '')) AS c(ch)
      WHERE c.ch BETWEEN 'a' AND 'z'
    ),
    hist AS (
      SELECT doc_id, lang, ch, CAST(COUNT(*) AS DOUBLE) AS c
      FROM chars GROUP BY doc_id, lang, ch
    ),
    per_doc AS (
      SELECT doc_id, lang,
             SUM(c) AS n,
             1.0 - SUM(c * c) / (SUM(c) * SUM(c)) AS gini,
             -SUM(c * LN(c)) / SUM(c) + LN(SUM(c)) AS entropy,
             CAST(COUNT(*) AS BIGINT) AS distinct_chars
      FROM hist GROUP BY doc_id, lang
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(gini), 6) AS avg_gini,
           ROUND(AVG(entropy), 4) AS avg_entropy,
           ROUND(AVG(distinct_chars), 6) AS avg_distinct_chars
    FROM per_doc
    GROUP BY lang ORDER BY lang
    """,
)
def text_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution quality signals per language: Gini impurity
    (rational arithmetic, cross-engine exact) and Shannon entropy of each
    document's a-z histogram, plus distinct-character count — low-entropy
    documents are boilerplate/repetition candidates, a standard pretraining
    quality filter alongside text_quality_scores' length/punct ratios.

    Scale: two map-side-combined aggregates — (doc, char) then (doc) — and
    one final tiny per-lang rollup; the (doc, char) cardinality is at most
    26x docs, and nothing is quadratic. Entropy terms are LN over identical
    doubles on both engines (same precedent as BM25/TF-IDF), rounded after
    the aggregate."""
    d = load_table(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.col("text")), "")).alias("ch"),
    ).where(F.col("ch").between("a", "z"))
    hist = chars.groupBy("doc_id", "lang", "ch").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    per_doc = hist.groupBy("doc_id", "lang").agg(
        F.sum("c").alias("n"),
        (
            F.lit(1.0) - F.sum(F.col("c") * F.col("c")) / (F.sum("c") * F.sum("c"))
        ).alias("gini"),
        (
            -F.sum(F.col("c") * F.log(F.col("c"))) / F.sum("c")
            + F.log(F.sum("c"))
        ).alias("entropy"),
        F.count(F.lit(1)).alias("distinct_chars"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("gini"), 6).alias("avg_gini"),
            F.round(F.avg("entropy"), 4).alias("avg_entropy"),
            F.round(F.avg("distinct_chars"), 6).alias("avg_distinct_chars"),
        )
        .orderBy("lang")
    )


@query(
    "embedding_norm_quality",
    oracle="""
    WITH normed AS (
      SELECT vec_id, label,
             sqrt(list_aggregate(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               'sum')) AS l2,
             len(embedding) AS dim,
             list_aggregate(list_transform(embedding,
               x -> CASE WHEN x = 0 THEN 1 ELSE 0 END), 'sum') AS n_zero_dims
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(MIN(dim) AS BIGINT) AS dim,
           ROUND(MIN(l2), 6) AS min_norm,
           ROUND(quantile_cont(l2, 0.5), 6) AS median_norm,
           ROUND(MAX(l2), 6) AS max_norm,
           CAST(SUM(CASE WHEN l2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_vectors,
           CAST(SUM(CASE WHEN n_zero_dims * 2 > dim THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mostly_zero
    FROM normed
    GROUP BY label ORDER BY label
    """,
)
def embedding_norm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column quality gate: per-label L2-norm distribution
    (min/median/max), zero-vector and mostly-zero-vector counts — the
    sanity scan you run before trusting 100 TB of embeddings for ANN or
    semantic dedup (zero/degenerate vectors poison cosine math; see
    ADVICE r4 on ivf_pq's norm guard).

    Cross-engine determinism without group float sums: the norm is a
    SEQUENTIAL in-row fold (same order both engines → identical doubles),
    and group statistics are order-free (min/max/count) or interpolated
    order statistics (median ≡ quantile_cont) — no Σfloat over an
    unordered group anywhere.

    Scale: one map-side pass computes norms in-row; the aggregate carries
    |labels| rows. No shuffle of vectors, only of 4 scalars per row."""
    emb = load_table(spark, sf_dir, "embeddings")
    normed = emb.select(
        "label",
        F.expr(
            "sqrt(aggregate(transform(embedding, "
            "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (a, x) -> a + x))"
        ).alias("l2"),
        F.size("embedding").alias("dim"),
        F.expr(
            "aggregate(transform(embedding, "
            "x -> CASE WHEN x = 0 THEN 1 ELSE 0 END), 0, (a, x) -> a + x)"
        ).alias("n_zero_dims"),
    )
    return (
        normed.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("dim").cast("bigint").alias("dim"),
            F.round(F.min("l2"), 6).alias("min_norm"),
            F.round(F.expr("percentile(l2, 0.5)"), 6).alias("median_norm"),
            F.round(F.max("l2"), 6).alias("max_norm"),
            F.sum(F.when(F.col("l2") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_zero_vectors"),
            F.sum(
                F.when(F.col("n_zero_dims") * 2 > F.col("dim"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_mostly_zero"),
        )
        .orderBy("label")
    )


@query(
    "dedup_prefix_filter_join",
    oracle=_JACCARD_CTE
    + """
    SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5
    ORDER BY id_a, id_b
    """,
)
def dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (PPJoin family)
    — the deterministic alternative to MinHash: candidates come from an
    inverted index over each document's RAREST shingles only (prefix
    length |S| - ceil(t|S|) + 1 under the global-frequency order), with
    guaranteed recall 1.0 at the threshold, then exact Jaccard verify.
    Oracle: all-pairs exact Jaccard at the same threshold — equality is a
    THEOREM here (prefix filtering is lossless), unlike the LSH queries
    where it relies on measured corpus recall.

    Scale: see operators/dedup.prefix_filter_pairs — the frequent-shingle
    join explosion is pruned by construction; verify touches candidates
    only (array_intersect on the two shingle sets)."""
    docs = load_table(spark, sf_dir, "documents")
    cands = D.prefix_filter_pairs(docs, "doc_id", "text", threshold=0.5)
    return D.ngram_jaccard_pairs(cands, docs, "doc_id", "text", threshold=0.5).orderBy(
        "id_a", "id_b"
    )


@query(
    "text_tokenizer_fertility",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
             CAST(LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS BIGINT)
               AS words,
             CAST(LEN(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS pieces
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS total_words,
           CAST(SUM(pieces) AS BIGINT) AS total_pieces,
           ROUND(CAST(SUM(pieces) AS DOUBLE) / SUM(words), 6) AS fertility
    FROM per_doc
    GROUP BY lang ORDER BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language (pieces emitted per whitespace
    word, under the BPE-ish piece rule functions/text.bpe_ish_token_count
    uses) — the standard tokenizer-equity metric for multilingual
    pretraining: languages with high fertility pay more sequence length
    per word, which budget planning (curation_token_budget_fill) and
    mixture weighting (curation_temperature_mixture) must correct for.

    Scale: per-row regexp counts (whole-stage codegen, no explode — the
    piece COUNT needs no materialized token array), one map-side-combined
    aggregate to |langs| rows. Integer counts, exact division at the
    end."""
    d = load_table(spark, sf_dir, "documents")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    pieces = F.size(
        F.expr(r"regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0)")
    ).cast("bigint")
    per_doc = d.select("lang", words.alias("words"), pieces.alias("pieces"))
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("words").alias("total_words"),
            F.sum("pieces").alias("total_pieces"),
            F.round(
                F.sum("pieces").cast("double") / F.sum("words"), 6
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


@query("embedding_matryoshka_recall", oracle=_ANN_RECALL_ORACLE)
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style PREFIX TRUNCATION evaluated as an index: search
    with only the first 32 of 64 dimensions (2x memory/FLOP cut, the MRL
    deployment trick) and quantify against full-dimension exact top-5
    via the AGGREGATE bound: >= 5 of 50 true neighbors across the 10
    queries (measured total 12/15/8 at sf0.001/0.01/0.1 — synthetic
    embeddings are weakly structured, so truncation recall here is the
    honest floor, not an advertisement; real MRL-trained vectors
    front-load variance and do far better). A per-query floor is NOT
    corpus-stable: truncation zeroes 2-3 individual queries on two of
    the three corpora — caught by the second-SF parity suite.

    Scale: truncation is a zero-shuffle F.slice projection — the index
    cost model is exactly brute-force/IVF at half the dimension; composes
    with ivf/pq (truncate, then cell-probe)."""
    return _ann_recall(
        spark,
        sf_dir,
        lambda q, c: S.brute_force_topk(
            q.withColumn("embedding", F.slice("embedding", 1, 32)),
            c.withColumn("embedding", F.slice("embedding", 1, 32)),
            "vec_id",
            "vec_id",
            "embedding",
            k=5,
        ),
        min_total_hits=5,
    )


@query(
    "sample_contrastive_pairs",
    oracle="""
    WITH anchors AS (
      SELECT vec_id AS anchor_id, label AS a_label, embedding AS a_vec
      FROM embeddings WHERE vec_id < 20
    ),
    scored AS (
      SELECT a.anchor_id, a.a_label, c.vec_id AS cand_id, c.label AS c_label,
             ROUND(
               list_aggregate(list_transform(list_zip(a.a_vec, c.embedding),
                 z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')
               / NULLIF(
                   sqrt(list_aggregate(list_transform(a.a_vec,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                   * sqrt(list_aggregate(list_transform(c.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')),
                   0.0),
               6) AS cosine
      FROM anchors a JOIN embeddings c ON c.vec_id != a.anchor_id
    ),
    ranked AS (
      SELECT anchor_id, a_label, cand_id, c_label, cosine,
             ROW_NUMBER() OVER (
               PARTITION BY anchor_id, (c_label = a_label)
               ORDER BY cosine DESC, cand_id
             ) AS rn
      FROM scored
    )
    SELECT anchor_id, a_label AS anchor_label,
           MAX(CASE WHEN c_label = a_label THEN cand_id END) AS positive_id,
           MAX(CASE WHEN c_label = a_label THEN cosine END) AS positive_cosine,
           MAX(CASE WHEN c_label != a_label THEN cand_id END)
             AS hard_negative_id,
           MAX(CASE WHEN c_label != a_label THEN cosine END)
             AS hard_negative_cosine,
           ROUND(MAX(CASE WHEN c_label = a_label THEN cosine END)
                 - MAX(CASE WHEN c_label != a_label THEN cosine END), 6)
             AS margin
    FROM ranked WHERE rn = 1
    GROUP BY anchor_id, a_label
    ORDER BY anchor_id
    """,
)
def sample_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining: per anchor, the nearest SAME-label
    vector (positive) and the nearest DIFFERENT-label vector (hard
    negative) with the positive-minus-negative margin — the batch that
    trains embedding models (InfoNCE/triplet); random negatives are easy,
    HARD negatives (closest impostors) are what moves the loss.

    Scale: anchors broadcast against the corpus (the corpus never
    shuffles — same plan as brute_force_topk); one window ranks per
    (anchor, same-label?) branch. For a 100 TB corpus the scored set
    comes from an ANN shortlist (ann_ivf_topk) instead of the exact cross
    product, then the same per-class argmax applies. Cosine is the
    sequential expression fold (functions/vector.py) rounded to 6 — both
    engines rank identical values with identical tie-breaks."""
    from pyspark.sql import Window

    from pucminas_data_pipelines_spark.functions.vector import (
        cosine_from_norms,
        norm,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # side norms hoisted out of the anchor fan-out (once per vector row,
    # not per (anchor, candidate) pair) — bit-identical
    anchors = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("a_vec"),
        norm(F.col("embedding")).alias("_an"),
    )
    scored = (
        emb.select(
            F.col("vec_id").alias("cand_id"),
            F.col("label").alias("c_label"),
            F.col("embedding").alias("c_vec"),
            norm(F.col("embedding")).alias("_cn"),
        )
        .crossJoin(F.broadcast(anchors))
        .where(F.col("cand_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "a_label",
            "cand_id",
            "c_label",
            F.round(
                cosine_from_norms(
                    F.col("a_vec"), F.col("c_vec"), F.col("_an"), F.col("_cn")
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(
        "anchor_id", F.col("c_label") == F.col("a_label")
    ).orderBy(F.col("cosine").desc(), F.col("cand_id"))
    best = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    same = F.col("c_label") == F.col("a_label")
    return (
        best.groupBy("anchor_id", F.col("a_label").alias("anchor_label"))
        .agg(
            F.max(F.when(same, F.col("cand_id"))).alias("positive_id"),
            F.max(F.when(same, F.col("cosine"))).alias("positive_cosine"),
            F.max(F.when(~same, F.col("cand_id"))).alias("hard_negative_id"),
            F.max(F.when(~same, F.col("cosine"))).alias("hard_negative_cosine"),
            F.round(
                F.max(F.when(same, F.col("cosine")))
                - F.max(F.when(~same, F.col("cosine"))),
                6,
            ).alias("margin"),
        )
        .orderBy("anchor_id")
    )


@query(
    "text_zipf_exponent",
    oracle="""
    WITH tok AS (
      SELECT t.token
      FROM documents,
           UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\\s+')) AS t(token)
    ),
    freq AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS f FROM tok GROUP BY token),
    ranked AS (
      SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, token) AS r
      FROM freq
    ),
    pts AS (
      SELECT LN(CAST(r AS DOUBLE)) AS x, LN(f) AS y
      FROM ranked WHERE r <= 500
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
             AS intercept
    FROM s
    """,
)
def text_zipf_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law exponent of the corpus token distribution: least-squares
    slope of ln(frequency) on ln(rank) over the top 500 tokens — natural
    text sits near -1; a corpus that deviates hard (slope ~0: synthetic
    uniform junk; slope << -1: template spam) fails the distributional
    sanity check before training.

    Scale: token counting is the standard map-side-combined aggregate;
    the top 500 comes from orderBy+limit — physically TakeOrderedAndProject
    (per-partition top-500, driver merge), never a sort or a global
    window over the VOCABULARY (Heaps-law-unbounded at corpus scale);
    only the 500 surviving rows see the rank window (the plan-hygiene
    gate admits it because a GlobalLimit bounds its input). The
    regression is a single-row moment reduce. Log terms are
    IEEE-identical per value; sums agree to ~1e-13 relative, far inside
    the 4-decimal rounding."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
                "token"
            )
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("f"))
    )
    from pyspark.sql import Window

    top = freq.orderBy(F.col("f").desc(), F.col("token")).limit(500)
    w = Window.orderBy(F.col("f").desc(), F.col("token"))
    pts = (
        top.withColumn("r", F.row_number().over(w))
        .select(
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("f")).alias("y"),
        )
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_points"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
            "intercept"
        ),
    )


@query(
    "text_code_detection",
    oracle="""
    WITH feats AS (
      SELECT doc_id, lang,
             LENGTH(text) AS n_chars,
             LENGTH(text) - LENGTH(REPLACE(text, ';', ''))
               + LENGTH(text) - LENGTH(REPLACE(text, '{', ''))
               + LENGTH(text) - LENGTH(REPLACE(text, '=', ''))
               + LENGTH(text) - LENGTH(REPLACE(text, '(', '')) AS n_symbols,
             LEN(regexp_extract_all(LOWER(text),
               '\\b(def|class|return|import|void|int|function|var|const)\\b'))
               AS n_keywords
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang,
             ROUND(CAST(n_symbols AS DOUBLE) / GREATEST(n_chars, 1), 6)
               AS symbol_density,
             n_keywords,
             CAST(n_symbols AS DOUBLE) / GREATEST(n_chars, 1) > 0.02
               AND n_keywords >= 2 AS looks_like_code
      FROM feats
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN looks_like_code THEN 1 ELSE 0 END) AS BIGINT)
             AS n_code_like,
           ROUND(AVG(symbol_density), 6) AS avg_symbol_density,
           CAST(SUM(n_keywords) AS BIGINT) AS total_keyword_hits
    FROM scored
    GROUP BY lang ORDER BY lang
    """,
)
def text_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose heuristic classifier: programming-symbol density
    (;{=( per char) and reserved-word hits combine into a looks_like_code
    gate — the router that sends documents down the code-specific
    pipeline (different dedup spans, different quality rules) in mixed
    crawls; on this prose corpus the expected code-like count is ~0,
    which the oracle verifies rather than assumes.

    Scale: pure per-row string expressions (REPLACE-difference counting,
    one compiled regex) + one map-side-combined rollup — no explode, no
    UDF."""
    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    def _cnt(ch):
        return n_chars - F.length(F.replace(F.col("text"), F.lit(ch)))
    n_symbols = _cnt(";") + _cnt("{") + _cnt("=") + _cnt("(")
    n_keywords = F.size(
        F.expr(
            r"regexp_extract_all(lower(text), "
            r"'\\b(def|class|return|import|void|int|function|var|const)\\b', 0)"
        )
    )
    density = n_symbols.cast("double") / F.greatest(n_chars, F.lit(1))
    scored = d.select(
        "lang",
        F.round(density, 6).alias("symbol_density"),
        n_keywords.alias("n_keywords"),
        ((density > 0.02) & (n_keywords >= 2)).alias("looks_like_code"),
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("looks_like_code"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_code_like"),
            F.round(F.avg("symbol_density"), 6).alias("avg_symbol_density"),
            F.sum("n_keywords").cast("bigint").alias("total_keyword_hits"),
        )
        .orderBy("lang")
    )


@query(
    "text_readability_scores",
    oracle="""
    WITH feats AS (
      SELECT doc_id, lang,
             CAST(LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS DOUBLE)
               AS words,
             CAST(GREATEST(LEN(regexp_extract_all(text, '[.!?]+')), 1)
                  AS DOUBLE) AS sentences,
             CAST(GREATEST(LEN(regexp_extract_all(LOWER(text),
                  '[aeiouy]+')), 1) AS DOUBLE) AS vowel_groups
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, words, sentences,
             ROUND(206.835 - 1.015 * (words / sentences)
                   - 84.6 * (vowel_groups / words), 4) AS flesch_ease,
             ROUND(0.39 * (words / sentences)
                   + 11.8 * (vowel_groups / words) - 15.59, 4) AS fk_grade
      FROM feats WHERE words > 0
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(flesch_ease), 4) AS avg_flesch_ease,
           ROUND(AVG(fk_grade), 4) AS avg_fk_grade,
           ROUND(AVG(words / sentences), 4) AS avg_words_per_sentence
    FROM scored
    GROUP BY lang ORDER BY lang
    """,
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade level per language,
    with vowel-group runs as the standard syllable proxy — the
    readability axis of pretraining quality scoring (too-low grade =
    listicle spam, absurdly-high = OCR noise), complementing
    text_quality_scores' surface ratios and text_char_diversity's
    entropy.

    Determinism: counts are integers, the score arithmetic is fixed-order
    IEEE (+,x,/ only — no libm), and per-doc scores round at 4 before the
    per-lang average of in-range values (the averaged scores are exact
    4-decimal values, so the final AVG is a ratio of exact sums).

    Scale: per-row regexp counts, no explode, one rollup."""
    d = load_table(spark, sf_dir, "documents")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double")
    sentences = F.greatest(
        F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    ).cast("double")
    vowels = F.greatest(
        F.size(F.expr(r"regexp_extract_all(lower(text), '[aeiouy]+', 0)")),
        F.lit(1),
    ).cast("double")
    scored = d.select(
        "lang",
        words.alias("words"),
        sentences.alias("sentences"),
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (words / sentences)
            - F.lit(84.6) * (vowels / words),
            4,
        ).alias("flesch_ease"),
        F.round(
            F.lit(0.39) * (words / sentences)
            + F.lit(11.8) * (vowels / words)
            - F.lit(15.59),
            4,
        ).alias("fk_grade"),
    ).where(F.col("words") > 0)
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("flesch_ease"), 4).alias("avg_flesch_ease"),
            F.round(F.avg("fk_grade"), 4).alias("avg_fk_grade"),
            F.round(F.avg(F.col("words") / F.col("sentences")), 4).alias(
                "avg_words_per_sentence"
            ),
        )
        .orderBy("lang")
    )


@query(
    "text_heaps_vocab_growth",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.token
      FROM documents,
           UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\\s+'))
             AS t(token)
    ),
    doc_tokens AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok GROUP BY doc_id
    ),
    first_seen AS (
      SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY token
    ),
    per_doc AS (
      SELECT d.doc_id,
             SUM(d.n_tok) OVER (ORDER BY d.doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_tokens,
             SUM(COALESCE(f.new_types, 0))
               OVER (ORDER BY d.doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_vocab
      FROM doc_tokens d
      LEFT JOIN (SELECT first_doc, CAST(COUNT(*) AS BIGINT) AS new_types
                 FROM first_seen GROUP BY first_doc) f
        ON f.first_doc = d.doc_id
    )
    SELECT doc_id AS checkpoint_doc,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(cum_vocab AS BIGINT) AS cum_vocab,
           ROUND(CAST(cum_vocab AS DOUBLE) / cum_tokens, 6) AS type_token_ratio
    FROM per_doc
    WHERE doc_id % 50 = 0
    ORDER BY checkpoint_doc
    """,
)
def text_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct vocabulary
    vs cumulative tokens at every 50th document (in corpus order), plus
    the type-token ratio — Zipf's companion diagnostic (natural text grows
    vocabulary ~ n^0.5-0.8; a flattening curve means the crawl started
    repeating itself, a super-linear one means junk/IDs are flooding the
    vocabulary).

    Scale: each token's FIRST document (min over a map-side-combined
    group) attributes every vocabulary item exactly once, so the
    cumulative curve needs only per-doc token counts + per-doc new-type
    counts — a doc-grain table swept by the two-pass range-partitioned
    prefix sum (operators/ordered.py; no single-partition window at any
    corpus size); the corpus-sized explode feeds combiners, never the
    sweep."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "token"
        ),
    )
    doc_tokens = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    new_types = (
        tok.groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    per = doc_tokens.join(
        new_types, doc_tokens["doc_id"] == new_types["first_doc"], "left"
    ).select(
        "doc_id",
        "n_tok",
        F.coalesce(F.col("new_types"), F.lit(0)).alias("new_types"),
    )
    per_doc = ORD.range_prefix_sum(
        per, ["doc_id"], ["n_tok", "new_types"], "doc_id", materialize=True
    ).select(
        "doc_id",
        F.col("cum_n_tok").alias("cum_tokens"),
        F.col("cum_new_types").alias("cum_vocab"),
    )
    return (
        per_doc.where(F.col("doc_id") % 50 == 0)
        .select(
            F.col("doc_id").alias("checkpoint_doc"),
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
            F.col("cum_vocab").cast("bigint").alias("cum_vocab"),
            F.round(
                F.col("cum_vocab").cast("double") / F.col("cum_tokens"), 6
            ).alias("type_token_ratio"),
        )
        .orderBy("checkpoint_doc")
    )


@query(
    "text_pmi_collocations",
    oracle="""
    WITH tok AS (
      SELECT regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS t
      FROM documents
    ),
    unigrams AS (
      SELECT u.token, CAST(COUNT(*) AS BIGINT) AS uc
      FROM tok, UNNEST(t) AS u(token) GROUP BY u.token
    ),
    totals AS (
      SELECT CAST(SUM(uc) AS DOUBLE) AS n_uni FROM unigrams
    ),
    pairs AS (
      SELECT p.pr[1] AS w1, p.pr[2] AS w2,
             CAST(COUNT(*) AS BIGINT) AS pc
      FROM tok, UNNEST(list_zip(t[:-2], t[2:])) AS p(pr)
      GROUP BY w1, w2
    ),
    pair_total AS (SELECT CAST(SUM(pc) AS DOUBLE) AS n_pair FROM pairs)
    SELECT p.w1, p.w2, p.pc,
           ROUND(LN((p.pc / pt.n_pair)
                    / ((u1.uc / t.n_uni) * (u2.uc / t.n_uni))), 4) AS pmi
    FROM pairs p
    JOIN unigrams u1 ON u1.token = p.w1
    JOIN unigrams u2 ON u2.token = p.w2
    CROSS JOIN totals t CROSS JOIN pair_total pt
    WHERE p.pc >= 5
    ORDER BY pmi DESC, p.w1, p.w2
    LIMIT 20
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining: pointwise mutual information
    ln(p(w1,w2) / (p(w1)p(w2))) over adjacent token pairs (support >= 5),
    top 20 — the statistic that separates real collocations ("machine
    learning") from frequency accidents ("of the"), and the classic
    phrase-vocabulary induction signal (word2vec's phrase pass uses
    exactly this score family).

    Scale: unigram and pair counts are the two map-side-combined
    aggregates (pairs zipped in-row, no positional self-join — same plan
    as text_bpe_merge_pairs); unigram probabilities broadcast into the
    pair table; PMI's single LN rounds at 4 over exact-integer
    probability ratios."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    unigrams = (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("uc"))
    )
    totals = unigrams.agg(F.sum("uc").cast("double").alias("n_uni"))
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = (
        d.select(
            F.explode(
                F.arrays_zip(
                    F.slice(toks, 1, n1).alias("l"),
                    F.slice(toks, 2, n1).alias("r"),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.l").alias("w1"), F.col("p.r").alias("w2"))
        .agg(F.count(F.lit(1)).alias("pc"))
        .where(F.col("pc") >= 5)
    )
    pair_total = (
        d.select(F.explode(
            F.arrays_zip(
                F.slice(toks, 1, n1).alias("l"),
                F.slice(toks, 2, n1).alias("r"),
            )
        ).alias("p"))
        .agg(F.count(F.lit(1)).cast("double").alias("n_pair"))
    )
    u1 = unigrams.select(F.col("token").alias("w1"), F.col("uc").alias("uc1"))
    u2 = unigrams.select(F.col("token").alias("w2"), F.col("uc").alias("uc2"))
    pmi = F.log(
        (F.col("pc") / F.col("n_pair"))
        / ((F.col("uc1") / F.col("n_uni")) * (F.col("uc2") / F.col("n_uni")))
    )
    return (
        pairs.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(pair_total))
        .select("w1", "w2", "pc", F.round(pmi, 4).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


# theoretical LSH capture probability 1-(1-s^4)^16 (64 hashes, 16 bands,
# r=4 rows/band) at each jaccard-bin midpoint, precomputed as literals so
# both engines compare against the identical constant (no cross-engine
# pow()): {bin: P(candidate | jaccard≈midpoint)}
_S_CURVE = {
    0: 0.0001, 1: 0.008069, 2: 0.060702, 3: 0.214881, 4: 0.488256,
    5: 0.784647, 6: 0.95698, 7: 0.997726, 8: 0.999993, 9: 1.0,
}


# Calibration runs on a deterministic 20% hash-sample of the corpus: the
# oracle applies the IDENTICAL sample predicate, so the comparison stays
# exact while the near-zero-threshold pair census (quadratic in corpus
# size) is bounded. Same md5-bucket expression as plans/sampling.py.
_CAL_SAMPLE_PCT = 20
_CAL_BUCKET_SQL = (
    "(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"
)
_JACCARD_CTE_SAMPLED = (
    "WITH _cal_sample AS (SELECT * FROM documents "
    f"WHERE {_CAL_BUCKET_SQL} < {_CAL_SAMPLE_PCT})"
    + _JACCARD_CTE.replace("FROM documents", "FROM _cal_sample").replace(
        "WITH toks AS", ", toks AS"
    )
)


@query(
    "dedup_lsh_s_curve_calibration",
    oracle=_JACCARD_CTE_SAMPLED
    + f"""
    , binned AS (
      SELECT id_a, id_b,
             LEAST(CAST(FLOOR(jaccard * 10) AS INTEGER), 9) AS bin
      FROM jac WHERE jaccard >= 0.01
    )
    SELECT bin,
           ROUND(bin / 10.0 + 0.05, 2) AS bin_mid,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(CASE bin {' '.join(f'WHEN {b} THEN {p}' for b, p in _S_CURVE.items())}
           END AS DOUBLE) AS theoretical_capture
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
)
def dedup_lsh_s_curve_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH S-curve calibration table: the exact-Jaccard pair population
    bucketed into 0.1-wide similarity bins, each annotated with the
    THEORETICAL capture probability 1-(1-s^4)^16 of the registry's
    standard 64-hash/16-band MinHash configuration — the table an
    operator reads to pick bands/rows for a target threshold (steepness
    at s=0.5, near-certain capture above 0.75). Pair finding reuses the
    lossless prefix-filter join at threshold ~0 so the bin population is
    the complete nonzero-Jaccard pair set OF THE SAMPLE, oracled against
    all-pairs exact Jaccard over the identical sample.

    Scale: at threshold 0.01 PPJoin's prefix prune keeps nearly the whole
    shingle set, so the census volume approaches every shingle-sharing
    pair — quadratic-ish in corpus size. Calibration is a DIAGNOSTIC of
    the similarity distribution, not an operator over every document, so
    it runs on a deterministic 20% md5-bucket sample (engine-stable,
    map-side predicate; the oracle applies the same predicate) — the bin
    HISTOGRAM shape it exists to report is preserved while the pair
    census is bounded at ~4% of the full cost at any corpus size (pick
    the sample rate to taste at real scale: the S-curve read-off only
    needs enough pairs per bin). Theoretical values are literals (a pure
    function of the config, precomputed — no cross-engine pow)."""
    from pucminas_data_pipelines_spark.operators.sampling import (
        deterministic_sample,
    )

    docs = deterministic_sample(
        load_table(spark, sf_dir, "documents"), "doc_id", _CAL_SAMPLE_PCT
    )
    cands = D.prefix_filter_pairs(docs, "doc_id", "text", threshold=0.01)
    jac = D.ngram_jaccard_pairs(cands, docs, "doc_id", "text", threshold=0.01)
    binned = jac.select(
        F.least(F.floor(F.col("jaccard") * 10).cast("int"), F.lit(9)).alias(
            "bin"
        )
    )
    theo = F.lit(None).cast("double")
    expr = None
    for b, p in _S_CURVE.items():
        cond = F.when(F.col("bin") == b, F.lit(p))
        expr = cond if expr is None else expr.when(F.col("bin") == b, F.lit(p))
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "bin",
            F.round(F.col("bin") / 10.0 + 0.05, 2).alias("bin_mid"),
            "n_pairs",
            expr.alias("theoretical_capture"),
        )
        .orderBy("bin")
    )


@query(
    "dedup_content_defined_chunks",
    oracle="""
    WITH tok AS (
      SELECT d.doc_id, d.source, t.token, t.pos
      FROM documents d,
           (SELECT doc_id AS tid, unnest(w) AS token,
                   generate_subscripts(w, 1) AS pos
            FROM (SELECT doc_id,
                         regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS w
                  FROM documents)) t
      WHERE t.tid = d.doc_id
    ),
    flagged AS (
      SELECT doc_id, source, token, pos,
             CASE WHEN pos = 1 OR
                  CAST(('0x' || SUBSTRING(md5(token), 1, 8)) AS BIGINT)
                    % 16 = 0
                  THEN 1 ELSE 0 END AS is_boundary
      FROM tok
    ),
    chunked AS (
      SELECT doc_id, source, token, pos,
             SUM(is_boundary) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS chunk_no
      FROM flagged
    ),
    chunks AS (
      SELECT doc_id, source, chunk_no,
             md5(string_agg(token, ' ' ORDER BY pos)) AS chunk_hash,
             CAST(SUM(LENGTH(token) + 1) AS BIGINT) AS chunk_bytes
      FROM chunked
      GROUP BY doc_id, source, chunk_no
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT chunk_hash) AS BIGINT) AS n_distinct_chunks,
           CAST(SUM(chunk_bytes) AS BIGINT) AS raw_bytes,
           ROUND(1.0 - CAST(COUNT(DISTINCT chunk_hash) AS DOUBLE)
                 / COUNT(*), 6) AS chunk_dup_rate
    FROM chunks
    GROUP BY source
    ORDER BY source
    """,
)
def dedup_content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (LBFS/restic/borg family, token-level):
    chunk boundaries fall where a token's hash % 16 == 0 — a pure
    function of CONTENT, so an insertion shifts only the chunk it lands
    in, unlike fixed-size blocks where one edit re-chunks the rest of the
    document. Chunk-hash dedup across the corpus then measures the
    storage-level redundancy (per source: chunks, distinct chunks, dup
    rate) that document-level dedup (text_fingerprint) and span dedup
    (dedup_substring_spans) each miss half of.

    Scale: boundary flags are per-row expressions; chunk ids are one
    per-doc prefix-sum window; chunk assembly aggregates tokens in
    position order INSIDE each (doc, chunk) group (bounded by expected
    chunk length = 16 tokens); the dedup rollup is a distinct-count.
    Nothing is quadratic and no chunk text leaves its executor — only
    16-byte hashes shuffle for the distinct."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        F.posexplode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("pos", "token"),
    )
    boundary = (F.col("pos") == 0) | (
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint") % 16
        == 0
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = tok.select(
        "doc_id",
        "source",
        "token",
        "pos",
        F.sum(boundary.cast("int")).over(w).alias("chunk_no"),
    )
    chunks = chunked.groupBy("doc_id", "source", "chunk_no").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).cast("binary")
        ).alias("chunk_hash"),
        F.sum(F.length("token") + 1).alias("chunk_bytes"),
    )
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count_distinct("chunk_hash").alias("n_distinct_chunks"),
            F.sum("chunk_bytes").alias("raw_bytes"),
            F.round(
                F.lit(1.0)
                - F.count_distinct("chunk_hash").cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("chunk_dup_rate"),
        )
        .orderBy("source")
    )


@query(
    "text_oov_rate_by_lang",
    oracle="""
    WITH tok AS (
      SELECT d.lang, t.token
      FROM documents d,
           UNNEST(regexp_split_to_array(TRIM(LOWER(d.text)), '\\s+'))
             AS t(token)
    ),
    vocab AS (
      SELECT token FROM (
        SELECT token, COUNT(*) AS c,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rk
        FROM tok GROUP BY token
      ) WHERE rk <= 20
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           ROUND(CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS oov_rate
    FROM tok LEFT JOIN vocab v USING (token)
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_oov_rate_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against a top-20 corpus
    vocabulary — the fairness metric for a shared tokenizer/vocab: a
    language whose OOV rate is high pays byte-fallback costs the head
    language never sees (the companion to text_tokenizer_fertility's
    pieces-per-word view).

    Scale: vocabulary selection is an aggregate + TakeOrdered-sized head;
    the membership join BROADCASTS the vocab (20 rows — a real vocab's
    50k entries still broadcast trivially); per-lang rollup map-side
    combines."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "lang",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "token"
        ),
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "token")
        .limit(20)
        .select("token", F.lit(1).alias("_in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.round(
                F.sum(
                    F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("oov_rate"),
        )
        .orderBy("lang")
    )


@query(
    "dedup_survivorship_report",
    oracle=_JACCARD_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + f"""
    , doc_tok AS (
      SELECT doc_id,
             CAST(LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS BIGINT)
               AS n_tok
      FROM documents
    ),
    exact_drop AS (
      SELECT d.doc_id, t.n_tok
      FROM documents d JOIN doc_tok t USING (doc_id)
      WHERE d.doc_id != (
        SELECT MIN(d2.doc_id) FROM documents d2
        WHERE md5({_NORM_SQL.replace('text', 'd2.text')})
              = md5({_NORM_SQL.replace('text', 'd.text')})
      )
    ),
    pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.3),
    uedges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT a, a FROM uedges
      UNION
      SELECT reach.id, uedges.b FROM reach JOIN uedges ON reach.r = uedges.a
    ),
    lab AS (SELECT id AS member_id, MIN(r) AS rep FROM reach GROUP BY id),
    near_drop AS (
      SELECT l.member_id AS doc_id, t.n_tok
      FROM lab l JOIN doc_tok t ON t.doc_id = l.member_id
      WHERE l.member_id != l.rep
    ),
    grams AS (
      SELECT doc_id, i - 1 AS pos
      FROM (SELECT doc_id,
                   regexp_split_to_array({_NORM_SQL}, ' ') AS w
            FROM documents),
           LATERAL unnest(generate_series(1, len(w) - 7)) AS t(i)
      WHERE len(w) >= 8
        AND array_to_string(w[i:i+7], ' ') IN (
          SELECT array_to_string(w2[j:j+7], ' ')
          FROM (SELECT doc_id AS did2,
                       regexp_split_to_array({_NORM_SQL}, ' ') AS w2
                FROM documents),
               LATERAL unnest(generate_series(1, len(w2) - 7)) AS t2(j)
          WHERE len(w2) >= 8
          GROUP BY 1 HAVING COUNT(DISTINCT did2) >= 2
        )
    ),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM grams
    ),
    span_tok AS (
      SELECT CAST(SUM(mx - mn + 8) AS BIGINT) AS toks,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS docs
      FROM (SELECT doc_id, MIN(pos) AS mn, MAX(pos) AS mx
            FROM isl GROUP BY doc_id, g)
    )
    SELECT 'exact' AS method,
           CAST(COUNT(*) AS BIGINT) AS docs_affected,
           CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) AS tokens_affected
    FROM exact_drop
    UNION ALL
    SELECT 'near_dup_clusters',
           CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n_tok), 0) AS BIGINT)
    FROM near_drop
    UNION ALL
    SELECT 'duplicated_spans', docs, toks FROM span_tok
    ORDER BY method
    """,
)
def dedup_survivorship_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DASHBOARD: one table comparing what each method would
    remove — exact (normalized-hash twins beyond the first), near-dup
    cluster collapse (every member that is not its cluster's
    representative), and exact-substring span redaction (tokens inside
    duplicated >=8-gram spans). Methods overlap but answer different
    questions (whole-doc vs partial redundancy), and this report is what
    a data lead reads before choosing the pipeline's dedup budget.

    Scale: composes three already-plan-audited operators (hash groupBy;
    banded LSH + label propagation; inverted-index span merge) and adds
    only |methods| result rows; nothing here introduces a new shuffle
    shape."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    doc_tok = docs.select("doc_id", n_tok.alias("n_tok"))

    from pucminas_data_pipelines_spark.functions.text import normalize_text

    hashed = docs.select(
        "doc_id", F.md5(normalize_text(F.col("text")).cast("binary")).alias("h")
    )
    keep = hashed.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    exact_drop = (
        hashed.join(keep, "h")
        .where(F.col("doc_id") != F.col("keep_id"))
        .join(doc_tok, "doc_id")
    )

    pairs = D.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.3
    ).select("id_a", "id_b")
    labels = D.dedup_clusters(pairs)
    near_drop = labels.where(
        F.col("member_id") != F.col("cluster_rep")
    ).join(doc_tok, F.col("member_id") == F.col("doc_id"))

    spans = D.duplicated_spans(docs, "doc_id", "text", span_tokens=8)

    def _row(method, df, tok_col):
        return df.agg(
            F.lit(method).alias("method"),
            F.count(F.lit(1)).alias("docs_affected"),
            F.coalesce(F.sum(tok_col), F.lit(0))
            .cast("bigint")
            .alias("tokens_affected"),
        ).select("method", "docs_affected", "tokens_affected")

    span_row = spans.agg(
        F.lit("duplicated_spans").alias("method"),
        F.count_distinct("doc_id").alias("docs_affected"),
        F.coalesce(F.sum("span_len_tokens"), F.lit(0))
        .cast("bigint")
        .alias("tokens_affected"),
    ).select("method", "docs_affected", "tokens_affected")
    return (
        _row("exact", exact_drop, "n_tok")
        .unionByName(_row("near_dup_clusters", near_drop, "n_tok"))
        .unionByName(span_row)
        .orderBy("method")
    )


@query(
    "text_entity_resolution_clusters",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT c_custkey * 10 AS rec_id, c_name AS name
      FROM customer WHERE c_custkey <= 150
    ),
    variant1 AS (
      SELECT c_custkey * 10 + 1,
             SUBSTRING(c_name, 1, 4) || SUBSTRING(c_name, 6)
      FROM customer WHERE c_custkey <= 150 AND c_custkey % 3 = 0
    ),
    variant2 AS (
      SELECT c_custkey * 10 + 2, REPLACE(c_name, 'Customer', 'Custmer')
      FROM customer WHERE c_custkey <= 150 AND c_custkey % 5 = 0
    ),
    records AS (
      SELECT * FROM base UNION ALL SELECT * FROM variant1
      UNION ALL SELECT * FROM variant2
    ),
    blocked AS (
      SELECT rec_id, name,
             SUBSTRING(name, LENGTH(name) - 3) AS block_key
      FROM records
    ),
    pairs AS (
      SELECT a.rec_id AS ra, b.rec_id AS rb
      FROM blocked a JOIN blocked b
        ON a.block_key = b.block_key AND a.rec_id < b.rec_id
      WHERE levenshtein(a.name, b.name) <= 2
    ),
    edges AS (
      SELECT ra AS a, rb AS b FROM pairs UNION SELECT rb, ra FROM pairs
    ),
    reach(id, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT reach.id, edges.b FROM reach JOIN edges ON reach.r = edges.a
    ),
    lab AS (SELECT id, MIN(r) AS rep FROM reach GROUP BY id),
    all_labeled AS (
      SELECT r.rec_id, COALESCE(l.rep, r.rec_id) AS rep
      FROM records r LEFT JOIN lab l ON l.id = r.rec_id
    ),
    sizes AS (
      SELECT rep, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM all_labeled GROUP BY rep
    )
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(cluster_size) AS BIGINT) AS n_records
    FROM sizes
    GROUP BY cluster_size
    ORDER BY cluster_size
    """,
)
def text_entity_resolution_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ENTITY RESOLUTION: deterministic typo'd variants of
    customer names (a dropped character, a misspelled prefix) are blocked
    on a stable key (trailing digits survive the planted typos), paired
    within blocks under Levenshtein <= 2, and collapsed to entities via
    connected components — the full dedupe-the-CRM pipeline (block →
    match → cluster), reported as a cluster-size histogram (singletons =
    clean entities; size 2-3 = the planted duplicate groups).

    Scale: blocking is what makes ER tractable — edit distance runs only
    within blocks (the quadratic term is per-block, bounded), components
    reuse the checkpointed label propagation. The oracle replays the
    exact pipeline with a recursive-CTE closure."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") <= 150)
        .select("c_custkey", "c_name")
    )
    base = c.select(
        (F.col("c_custkey") * 10).alias("rec_id"), F.col("c_name").alias("name")
    )
    v1 = c.where(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") * 10 + 1).alias("rec_id"),
        F.concat(
            F.substring("c_name", 1, 4), F.expr("substring(c_name, 6)")
        ).alias("name"),
    )
    v2 = c.where(F.col("c_custkey") % 5 == 0).select(
        (F.col("c_custkey") * 10 + 2).alias("rec_id"),
        F.replace(
            F.col("c_name"), F.lit("Customer"), F.lit("Custmer")
        ).alias("name"),
    )
    records = base.unionByName(v1).unionByName(v2)
    blocked = records.select(
        "rec_id",
        "name",
        F.expr("substring(name, length(name) - 3)").alias("block_key"),
    )
    a = blocked.select(
        F.col("rec_id").alias("ra"),
        F.col("name").alias("na"),
        "block_key",
    )
    b = blocked.select(
        F.col("rec_id").alias("rb"),
        F.col("name").alias("nb"),
        "block_key",
    )
    pairs = (
        a.join(b, "block_key")
        .where(F.col("ra") < F.col("rb"))
        .where(F.levenshtein("na", "nb") <= 2)
        .select(F.col("ra").alias("id_a"), F.col("rb").alias("id_b"))
    )
    labels = D.dedup_clusters(pairs)
    all_labeled = records.join(
        labels, records["rec_id"] == labels["member_id"], "left"
    ).select(
        "rec_id",
        F.coalesce(F.col("cluster_rep"), F.col("rec_id")).alias("rep"),
    )
    sizes = all_labeled.groupBy("rep").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("cluster_size").cast("bigint").alias("n_records"),
        )
        .orderBy("cluster_size")
    )


@query(
    "text_bigram_lm_crossentropy",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang, regexp_split_to_array(TRIM(text), '\s+') AS arr
      FROM documents
    ),
    positioned AS (
      SELECT doc_id, lang, g.i AS pos, arr[g.i] AS token
      FROM toks, UNNEST(generate_series(1, len(arr))) AS g(i)
    ),
    pairs AS (
      SELECT doc_id, lang, token AS w1,
             LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM positioned
    ),
    bi AS (SELECT lang, w1, w2 FROM pairs WHERE w2 IS NOT NULL),
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n2 FROM bi GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1 FROM bi GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS vsz FROM positioned),
    scored AS (
      SELECT b.lang,
             CAST(LN(CAST(c1.n1 + v.vsz AS DOUBLE))
                  - LN(CAST(c2.n2 + 1 AS DOUBLE)) AS DECIMAL(18, 9)) AS nll
      FROM bi b
      JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
      JOIN c1 ON b.w1 = c1.w1
      CROSS JOIN v
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS cross_entropy_nats,
           ROUND(EXP(ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6)), 4)
             AS perplexity
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def text_bigram_lm_crossentropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed bigram language model trained on the corpus and
    scored over it, reported as per-language cross-entropy (nats/bigram)
    and perplexity — the classic KenLM-style quality signal LLM-data
    pipelines threshold on (CCNet/Gopher score documents by LM perplexity
    and drop the tail). nll(w1,w2) = ln(c(w1)+V) - ln(c(w1,w2)+1).

    Determinism: each pair's nll is quantized to DECIMAL(18,9) before the
    group sum (the registry's float discipline — 1-ulp libm drift cannot
    survive a 1e-9 round), the aggregate divides exact decimal by an
    integer count, and perplexity exponentiates the already-rounded
    entropy so both engines exponentiate the identical double.

    Scale: counts tables are vocab-bounded (c1) and distinct-pair-bounded
    (c2, Zipf-truncated), both orders below corpus token volume — in
    production they broadcast; the scoring join shuffles on the pair key
    once. Training and scoring are the same two map-side-combined
    aggregates a trillion-token corpus needs."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    positioned = docs.select(
        "doc_id",
        "lang",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "token"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = positioned.select(
        "lang",
        F.col("token").alias("w1"),
        F.lead("token").over(w).alias("w2"),
    ).where(F.col("w2").isNotNull())
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    v = positioned.agg(
        F.countDistinct("token").cast("bigint").alias("vsz")
    )
    scored = (
        pairs.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "lang",
            (
                F.log((F.col("n1") + F.col("vsz")).cast("double"))
                - F.log((F.col("n2") + 1).cast("double"))
            )
            .cast("decimal(18,9)")
            .alias("nll"),
        )
    )
    ce = F.round(F.sum("nll").cast("double") / F.count(F.lit(1)), 6)
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            ce.alias("cross_entropy_nats"),
            F.round(F.exp(ce), 4).alias("perplexity"),
        )
        .orderBy("lang")
    )


_KM_K = 8
_KM_ITER = 2
_KM_D2_SQL = (
    "list_aggregate(list_transform(list_zip(e.embedding, c.cvec), "
    "x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) "
    "* (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), 'sum')"
)


def _kmeans_oracle(k: int = _KM_K, iters: int = _KM_ITER) -> str:
    base = f"""
    WITH emb AS (SELECT vec_id, embedding FROM embeddings),
    c0 AS (
      SELECT vec_id AS cid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
      FROM embeddings WHERE vec_id < {k}
    )"""
    for i in range(iters):
        base += f""",
    d{i + 1} AS (
      SELECT e.vec_id, c.cid, {_KM_D2_SQL} AS d2
      FROM emb e CROSS JOIN c{i} c
    ),
    a{i + 1} AS (
      SELECT vec_id, cid, d2 FROM (
        SELECT vec_id, cid, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rk
        FROM d{i + 1}
      ) WHERE rk = 1
    )"""
        if i < iters - 1:
            base += f""",
    x{i + 1} AS (
      SELECT a.cid, g.i AS dim,
             CAST(e.embedding[g.i] AS DECIMAL(28, 9)) AS v
      FROM a{i + 1} a JOIN emb e USING (vec_id),
           UNNEST(generate_series(1, len(e.embedding))) AS g(i)
    ),
    cd{i + 1} AS (
      SELECT cid, dim, ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9) AS cv
      FROM x{i + 1} GROUP BY cid, dim
    ),
    c{i + 1} AS (
      SELECT cid, list(cv ORDER BY dim) AS cvec FROM cd{i + 1} GROUP BY cid
    )"""
    return base + f"""
    SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size,
           ROUND(CAST(SUM(CAST(d2 AS DECIMAL(18, 6))) AS DOUBLE) / COUNT(*), 6)
             AS mean_sqdist
    FROM a{iters} GROUP BY cid ORDER BY cid
    """


@query("embedding_kmeans_lloyd", oracle=_kmeans_oracle())
def embedding_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (Lloyd's algorithm, k=8, 2 fixed rounds,
    deterministic lowest-id init) over the embedding corpus — the
    clustering pass behind SemDeDup-style semantic dedup, IVF coarse
    quantizer training, and topic-balanced sampling, here expressed as
    pure DataFrame rounds so the SAME body scales where the driver-side
    trainer (operators/similarity._train_centroids_*) cannot: assignment
    is a broadcast cross join against k rows (never shuffles the corpus),
    the update is one (cid, dim)-keyed map-side-combined aggregate.

    Determinism across engines: per-element centroid updates quantize to
    DECIMAL(28,9) before the group sum (order-free), so both engines
    carry bit-identical centroids into the next round; distances are
    index-ordered folds (the knn oracle's proven zip_with ==
    list_aggregate equivalence); argmin tie-breaks on cid. The oracle
    unrolls the fixed rounds as chained CTEs (PageRank oracle scheme).

    Scale: per-round state is k x dim numbers; assignment is ROW-LOCAL —
    the k centroids collapse into one broadcast array row and the argmin
    is an array_min over per-row fold distances, so the corpus is never
    shuffled for assignment at all (a per-vec_id window or groupBy argmin
    would shuffle k x corpus rows); the (cid, dim) update aggregate
    shuffles k*dim partials per executor core, constant in corpus size;
    pytest asserts the no-corpus-shuffle plan shape."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = emb.where(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cvec"),
    )
    assign = None
    for i in range(_KM_ITER):
        cents_row = cent.agg(
            F.array_sort(F.collect_list(F.struct("cid", "cvec"))).alias("cents")
        )
        best = F.array_min(
            F.transform(
                "cents",
                lambda c: F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col("embedding"),
                            c.getField("cvec"),
                            lambda x, y: (x.cast("double") - y)
                            * (x.cast("double") - y),
                        ),
                        F.lit(0.0),
                        lambda acc, t: acc + t,
                    ).alias("d2"),
                    c.getField("cid").alias("cid"),
                ),
            )
        )
        # the assignment CARRIES the embedding through the row-local
        # select (r13): the centroid update below previously re-joined
        # assign to emb on vec_id — locally a broadcast, but at corpus
        # scale a full self-shuffle of the embeddings; carrying the
        # column keeps the update's input entirely shuffle-free (the
        # (cid, dim) aggregate is the only exchange) and scans emb once
        # per round instead of twice
        assigned = (
            emb.crossJoin(F.broadcast(cents_row))
            .select("vec_id", "embedding", best.alias("best"))
            .select(
                "vec_id",
                "embedding",
                F.col("best.cid").alias("cid"),
                F.col("best.d2").alias("d2"),
            )
        )
        assign = assigned.select("vec_id", "cid", "d2")
        if i < _KM_ITER - 1:
            x = assigned.select(
                "cid", F.posexplode("embedding").alias("dim", "v")
            )
            cd = x.groupBy("cid", "dim").agg(
                F.round(
                    F.sum(F.col("v").cast("decimal(28,9)")).cast("double")
                    / F.count(F.lit(1)),
                    9,
                ).alias("cv")
            )
            cent = cd.groupBy("cid").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                    lambda s: s.getField("cv"),
                ).alias("cvec")
            )
    return (
        assign.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
            F.round(
                F.sum(F.col("d2").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_sqdist"),
        )
        .orderBy("cluster_id")
    )


_NOV_N = 5  # n-gram order for the novelty signal


@query(
    "text_ngram_novelty",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(TRIM(text), '\s+') AS w
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             ('0x' || substring(md5(
                 w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                 || ' ' || w[i+4]), 1, 15))::BIGINT AS h
      FROM toks, unnest(generate_series(1, len(w) - 4)) AS t(i)
    ),
    df AS (
      SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS docfreq
      FROM grams GROUP BY h
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN df.docfreq = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(SUM(CASE WHEN df.docfreq = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS novelty_ratio
    FROM grams g JOIN df ON g.h = df.h
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's 5-gram
    occurrences whose 5-gram appears in NO other document — the
    uniqueness/memorization-risk signal curation pipelines threshold on
    (a near-zero ratio means the document is assembled from corpus
    boilerplate; a high ratio means genuinely novel text). Documents
    shorter than 5 tokens carry no 5-grams and are absent by definition.

    Determinism: grams are keyed by the 60-bit md5 prefix (the
    engine-portable hash used across the dedup stack); the ratio is ONE
    exact-integer division, identical on both engines.

    Scale: gram extraction is row-local (transform over the token
    array, no per-token explode before hashing); occurrences collapse
    to (hash, doc) counts in one keyed shuffle, doc-frequency comes
    from a window PARTITIONED by the 8-byte hash (no join back, no
    second corpus scan — each hash's partition is the handful of docs
    sharing that gram), and a final per-doc aggregate re-keys once.
    ONE corpus scan, three keyed shuffles, no Python."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    )
    gram_arr = F.when(
        F.size("w") < _NOV_N, F.array().cast("array<string>")
    ).otherwise(
        F.expr(
            f"transform(sequence(1, size(w) - {_NOV_N - 1}), i -> "
            "concat_ws(' ', element_at(w, i), element_at(w, i + 1), "
            "element_at(w, i + 2), element_at(w, i + 3), element_at(w, i + 4)))"
        )
    )
    gdoc = (
        toks.select("doc_id", F.explode(gram_arr).alias("gram"))
        .select(
            "doc_id",
            F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
        .groupBy("h", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    docfreq = F.count(F.lit(1)).over(Window.partitionBy("h"))
    scored = gdoc.select(
        "doc_id", "cnt", (docfreq == 1).alias("is_novel")
    )
    n_grams = F.sum("cnt").cast("bigint")
    novel = F.sum(F.when(F.col("is_novel"), F.col("cnt")).otherwise(0)).cast(
        "bigint"
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            n_grams.alias("n_grams"),
            novel.alias("n_novel"),
            (novel.cast("double") / n_grams).alias("novelty_ratio"),
        )
        .orderBy("doc_id")
    )
