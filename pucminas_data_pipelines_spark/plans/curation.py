"""Corpus-curation operators a large-scale LLM training-data pipeline
runs between raw crawl and tokenizer: chunking, sequence packing,
repetition gating, benchmark-contamination screening, composite quality
rules (Gopher/MassiveText-style), and domain-mixture resampling.

These extend SURVEY.md §2's LLM-data categories (the reference repo —
a 73-line Titanic ETL, sparkcode/titanic_example_delta.py — has none of
this; it is the BASELINE.json north-star extension surface). Everything
is Catalyst expressions + joins; the only shuffles are the stated
group-bys. Each query carries a full DuckDB oracle: fingerprints use md5
(bit-identical across engines), ratios divide exact integers.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.functions.text import normalize_text
from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.tables import load_table

_NORM_SQL = (
    "TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)

# ------------------------------------------------------------- chunking --

_CHUNK_LEN = 64
_CHUNK_STRIDE = 48


@query(
    "curation_doc_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST((s - 1) / {_CHUNK_STRIDE} + 1 AS INT) AS chunk_idx,
             CAST(s AS INT) AS start_token,
             w[s:s + {_CHUNK_LEN} - 1] AS chunk
      FROM toks, unnest(generate_series(1, len(w), {_CHUNK_STRIDE})) AS t(s)
    )
    SELECT doc_id, chunk_idx, start_token,
           CAST(len(chunk) AS INT) AS n_chunk_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
    FROM chunks
    WHERE doc_id < 50
    ORDER BY doc_id, chunk_idx
    """,
)
def curation_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (len 64, stride 48) — the RAG /
    long-doc preprocessing step. Start offsets come from F.sequence (no
    UDF, no explode-per-token); each chunk's identity is its md5
    fingerprint so the full chunk CONTENT is oracle-verified without
    shipping text. Scale: one narrow explode of ~n/stride rows per doc;
    no shuffle at all (chunking is embarrassingly row-local)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    toks = docs.select(
        "doc_id", F.split(normalize_text(F.col("text")), " ").alias("w")
    )
    return (
        toks.select(
            "doc_id",
            "w",
            F.explode(
                F.sequence(F.lit(1), F.size("w"), F.lit(_CHUNK_STRIDE))
            ).alias("start_token"),
        )
        .select(
            "doc_id",
            ((F.col("start_token") - 1) / _CHUNK_STRIDE + 1)
            .cast("int")
            .alias("chunk_idx"),
            F.col("start_token").cast("int"),
            F.slice(F.col("w"), F.col("start_token"), F.lit(_CHUNK_LEN)).alias(
                "chunk"
            ),
        )
        .select(
            "doc_id",
            "chunk_idx",
            "start_token",
            F.size("chunk").alias("n_chunk_tokens"),
            F.md5(F.array_join(F.col("chunk"), " ").cast("binary")).alias(
                "chunk_md5"
            ),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# ----------------------------------------------------- sequence packing --

_CTX_BUDGET = 512


@query(
    "curation_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(string_split({_NORM_SQL}, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT lang, doc_id, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - 1) / {_CTX_BUDGET})
                  AS BIGINT) AS bin_id
      FROM toks
    )
    SELECT lang, bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_packed
    FROM packed
    GROUP BY lang, bin_id
    ORDER BY lang, bin_id
    """,
)
def curation_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential sequence packing into 512-token context bins: running
    token sum per language stream, bin = floor((cumsum-1)/budget) — the
    deterministic streaming-fill strategy (docs may straddle bins, as
    packed pretraining batches do). The window partitions by lang, so
    packing parallelizes across streams instead of serializing the corpus
    through one global window — the scale shape; finer parallelism comes
    from sharding the stream key (lang, shard)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(normalize_text(F.col("text")), " ")).cast("bigint").alias(
            "n_tokens"
        ),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn(
            "bin_id",
            F.floor((F.sum("n_tokens").over(w) - 1) / _CTX_BUDGET).cast("bigint"),
        )
        .groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens_packed"),
        )
        .orderBy("lang", "bin_id")
    )


# -------------------------------------------------- repetition detection --


@query(
    "curation_repetition_detection",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id,
             greatest(len(w) - 2, 1) AS total_ngrams,
             len(list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 1)),
               i -> array_to_string(w[i:i+2], ' ')))) AS distinct_ngrams
      FROM toks
    )
    SELECT doc_id,
           CAST(total_ngrams AS BIGINT) AS total_ngrams,
           CAST(distinct_ngrams AS BIGINT) AS distinct_ngrams,
           ROUND(1.0 - CAST(distinct_ngrams AS DOUBLE) / total_ngrams, 6)
             AS rep_ratio
    FROM grams
    WHERE 1.0 - CAST(distinct_ngrams AS DOUBLE) / total_ngrams > 0.01
    ORDER BY doc_id
    """,
)
def curation_repetition_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition gate (the MassiveText/Gopher "repeated
    n-gram fraction" rule): 1 - distinct/total 3-grams; flag docs above
    the threshold. Production corpora use ~0.2; this synthetic corpus
    tops out at 0.07, so the registered gate runs at 0.01 to exercise
    the filter with non-empty output. Pure expressions per row — no
    explode, no shuffle; the 100 TB cost is one scan. The distinct count
    comes from the HASHED shingle set (r13: no gram strings built; same
    cardinality modulo ~2⁻⁶⁴ within-doc collisions)."""
    from pucminas_data_pipelines_spark.functions.text import (
        token_shingle_hashes,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(normalize_text(F.col("text")), " ")
    total = F.greatest(F.size(toks) - F.lit(2), F.lit(1))
    distinct = F.size(token_shingle_hashes(F.col("text"), 3))
    rep = F.round(
        F.lit(1.0) - distinct.cast("double") / total.cast("double"), 6
    )
    return (
        docs.select(
            "doc_id",
            total.cast("bigint").alias("total_ngrams"),
            distinct.cast("bigint").alias("distinct_ngrams"),
            rep.alias("rep_ratio"),
        )
        .where(
            F.lit(1.0)
            - F.col("distinct_ngrams").cast("double") / F.col("total_ngrams")
            > 0.01
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------- contamination screening --


@query(
    "curation_contamination_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 7, 1)),
               i -> array_to_string(w[i:i+7], ' ')))) AS g
      FROM toks
    ),
    bench AS (SELECT doc_id AS bench_id, g FROM grams WHERE doc_id < 20),
    corpus AS (SELECT doc_id, g FROM grams WHERE doc_id >= 20)
    SELECT c.doc_id,
           COUNT(DISTINCT c.g) AS n_grams_hit,
           COUNT(DISTINCT b.bench_id) AS n_bench_docs_hit
    FROM corpus c JOIN bench b ON c.g = b.g
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """,
)
def curation_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: corpus documents sharing any
    8-gram with a held-out benchmark set (here: doc_id < 20 stands in for
    the eval suite) — the n-gram-collision decontamination step every
    pretraining pipeline runs before training. Shape: distinct 8-grams
    per doc, equi-join on the gram (r13: join/distinct key = 8-byte gram
    HASH, never the ~50-byte gram string — a cross-doc collision can
    only add a hit, the same acceptance class as every hashed-shingle
    operator; the benchmark side is tiny → broadcast), two
    distinct-counts per contaminated doc. Never all-pairs."""
    from pucminas_data_pipelines_spark.functions.text import (
        token_shingle_hashes,
    )

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(token_shingle_hashes(F.col("text"), 8)).alias("g")
    )
    bench = grams.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("bench_id"), "g"
    )
    corpus = grams.where(F.col("doc_id") >= 20)
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_grams_hit"),
            F.countDistinct("bench_id").alias("n_bench_docs_hit"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------- composite quality gate --


@query(
    "curation_quality_rules",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
        len(string_split({_NORM_SQL}, ' ')) AS n_words,
        CAST(LENGTH(replace({_NORM_SQL}, ' ', '')) AS DOUBLE)
          / len(string_split({_NORM_SQL}, ' ')) AS mean_word_len,
        CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^a-z0-9\\s]', '', 'g'))
             AS DOUBLE) / LENGTH(text) AS symbol_ratio
      FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           ROUND(mean_word_len, 6) AS mean_word_len,
           ROUND(symbol_ratio, 6) AS symbol_ratio,
           (n_words BETWEEN 20 AND 100000) AS words_ok,
           (mean_word_len BETWEEN 2.0 AND 12.0) AS word_len_ok,
           (symbol_ratio < 0.2) AS symbols_ok,
           ((n_words BETWEEN 20 AND 100000)
            AND (mean_word_len BETWEEN 2.0 AND 12.0)
            AND (symbol_ratio < 0.2)) AS keep
    FROM m
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def curation_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style composite quality gate: word-count
    bounds, mean-word-length bounds, symbol-to-character ratio — each
    rule emitted as its own boolean plus the conjunctive keep flag, so a
    curation run can audit WHICH rule dropped a document. Expression-only
    single scan."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    norm = normalize_text(F.col("text"))
    n_words = F.size(F.split(norm, " "))
    mean_wl = F.length(F.replace(norm, F.lit(" "), F.lit(""))).cast(
        "double"
    ) / n_words
    sym = (
        F.length(F.col("text"))
        - F.length(F.regexp_replace(F.col("text"), r"[^a-z0-9\s]", ""))
    ).cast("double") / F.length(F.col("text"))
    words_ok = n_words.between(20, 100000)
    wl_ok = mean_wl.between(2.0, 12.0)
    sym_ok = sym < 0.2
    return docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(sym, 6).alias("symbol_ratio"),
        words_ok.alias("words_ok"),
        wl_ok.alias("word_len_ok"),
        sym_ok.alias("symbols_ok"),
        (words_ok & wl_ok & sym_ok).alias("keep"),
    ).orderBy("doc_id")


# --------------------------------------------- domain mixture resampling --

_MIX_MOD = 1_000_000


@query(
    "curation_domain_mixture",
    oracle=f"""
    WITH counted AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS actual_share
      FROM documents GROUP BY source
    ),
    rated AS (
      SELECT source, n_docs, actual_share,
             LEAST(1.0, 0.05 / actual_share) AS keep_prob
      FROM counted
    )
    SELECT d.source,
           CAST(r.n_docs AS BIGINT) AS n_docs,
           ROUND(r.keep_prob, 6) AS keep_prob,
           COUNT(*) FILTER (WHERE
             (('0x' || SUBSTRING(MD5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {_MIX_MOD}) < CAST(r.keep_prob * {_MIX_MOD} AS BIGINT)
           ) AS n_kept
    FROM documents d JOIN rated r USING (source)
    GROUP BY d.source, r.n_docs, r.keep_prob
    ORDER BY d.source
    """,
)
def curation_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling: flatten every source to a 5% target
    share by downsampling over-represented domains with a DETERMINISTIC
    md5 coin per doc (the engine-portable hash-sample used throughout;
    re-runs keep identical documents — a reproducibility requirement for
    training-data lineage). Shape: one groupBy for shares (tiny,
    broadcast back), one scan applying the coin; no global shuffle of the
    corpus."""
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    rated = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "keep_prob",
            F.least(
                F.lit(1.0), F.lit(0.05) / (F.col("n_docs") / F.lit(float(total)))
            ),
        )
    )
    coin = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % _MIX_MOD
    kept = coin < (F.col("keep_prob") * _MIX_MOD).cast("bigint")
    return (
        docs.join(F.broadcast(rated), "source")
        .groupBy("source", "n_docs", "keep_prob")
        .agg(F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"))
        .select(
            "source",
            F.col("n_docs").cast("bigint"),
            F.round("keep_prob", 6).alias("keep_prob"),
            F.col("n_kept").cast("bigint"),
        )
        .orderBy("source")
    )


# ------------------------------------------- cross-corpus boilerplate --

_BP_W = 2  # chunk width in tokens; production corpora use 8-16 (real
# paragraphs), but the synthetic word-salad testdata only repeats exact
# chunks across documents at width 2 — same plan shape, non-empty output.
_BP_DOC_FRAC = 0.03  # chunk in >= this fraction of docs = boilerplate
# (relative, not absolute: chunk document-frequency scales with corpus
# size, so a fixed count degenerates at 10x the data)
_BP_MAX_RATIO = 0.5  # prune docs whose boilerplate mass exceeds this


@query(
    "curation_boilerplate_prune",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             array_to_string(w[{_BP_W} * i - {_BP_W - 1} : {_BP_W} * i], ' ') AS chunk
      FROM toks,
           unnest(generate_series(1, CAST(ceil(len(w) / {_BP_W}.0) AS BIGINT))) AS t(i)
    ),
    freq AS (
      SELECT chunk, COUNT(DISTINCT doc_id) AS n_docs FROM chunks GROUP BY chunk
    ),
    lim AS (
      SELECT greatest(CAST(ceil({_BP_DOC_FRAC} * COUNT(*)) AS BIGINT), 2)
               AS min_docs
      FROM documents
    ),
    per_doc AS (
      SELECT c.doc_id,
             COUNT(*) AS n_chunks,
             SUM(CASE WHEN f.n_docs >= (SELECT min_docs FROM lim)
                 THEN 1 ELSE 0 END) AS n_boiler
      FROM chunks c JOIN freq f ON c.chunk = f.chunk
      GROUP BY c.doc_id
    )
    SELECT doc_id,
           CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(n_boiler AS BIGINT) AS n_boiler,
           round(n_boiler / CAST(n_chunks AS DOUBLE), 6) AS boiler_ratio,
           n_boiler <= {_BP_MAX_RATIO} * n_chunks AS keep
    FROM per_doc
    ORDER BY doc_id
    """,
)
def curation_boilerplate_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus boilerplate pruning (the CCNet/RefinedWeb paragraph-
    dedup step): split every document into non-overlapping token chunks,
    count in how many DISTINCT documents each exact chunk occurs, then
    prune documents whose share of corpus-frequent chunks exceeds a
    threshold — removing nav-bars, license headers, and templated pages
    that exact whole-doc dedup misses.

    Shape at 100 TB: chunking is a map-side explode (no regex re-runs —
    the token array materializes once per row); chunk frequency is one
    groupBy on the chunk hash with map-side combine; the frequency table
    re-joins the chunk stream on the same key, so AQE can plan it as a
    re-used shuffle rather than a second scan. The chunk key is zipfian
    (that is the point), so the frequency groupBy leans on AQE skew
    handling — and the per-doc rollup keys by doc_id, which is uniform.
    """
    docs = load_table(spark, sf_dir, "documents")
    # relative document-frequency cutoff (one cheap count job; at cluster
    # scale this is a cached catalog statistic, not a scan)
    min_docs = max(math.ceil(_BP_DOC_FRAC * docs.count()), 2)
    toks = docs.select(
        "doc_id", F.split(normalize_text(F.col("text")), " ").alias("w")
    )
    n_chunks = F.ceil(F.size("w") / F.lit(float(_BP_W))).cast("bigint")
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n_chunks),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("w"), (i - 1) * _BP_W + 1, _BP_W)
                ),
            )
        ).alias("chunk"),
    )
    # The chunk stream feeds BOTH the frequency groupBy and the re-join;
    # left lazy, Spark scans+explodes the corpus twice (the two exchange
    # subplans project different columns, so ReuseExchange cannot fire).
    # persist() materializes it once; the tiny per-doc rollup is eagerly
    # checkpointed below so the cache can be released before returning
    # (same storage-lifetime discipline as minhash_lsh_pairs).
    chunks = chunks.persist()
    freq = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    per_doc = (
        chunks.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(
                F.when(F.col("n_docs") >= min_docs, 1).otherwise(0)
            ).alias("n_boiler"),
        )
        .localCheckpoint(eager=True)
    )
    chunks.unpersist()
    return per_doc.select(
        "doc_id",
        F.col("n_chunks").cast("bigint").alias("n_chunks"),
        F.col("n_boiler").cast("bigint").alias("n_boiler"),
        F.round(
            F.col("n_boiler").cast("double") / F.col("n_chunks").cast("double"), 6
        ).alias("boiler_ratio"),
        (
            F.col("n_boiler").cast("double")
            <= F.lit(_BP_MAX_RATIO) * F.col("n_chunks").cast("double")
        ).alias("keep"),
    ).orderBy("doc_id")


# ------------------------------------------------- training shards --

_N_SHARDS = 16


@query(
    "curation_shard_assignment",
    oracle=f"""
    WITH assigned AS (
      SELECT (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {_N_SHARDS}) AS shard,
             len(string_split({_NORM_SQL}, ' ')) AS n_tokens
      FROM documents
    ),
    per AS (
      SELECT shard, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
      FROM assigned GROUP BY shard
    )
    SELECT shard, n_docs, n_tokens,
           round(n_tokens / (SELECT AVG(n_tokens) FROM per), 6)
             AS tokens_vs_mean
    FROM per
    ORDER BY shard
    """,
)
def curation_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment + balance audit: docs
    hash (md5 — engine-portable, reshuffle-proof) into N shards, with
    per-shard token mass reported against the mean — the write-side
    layout step before dataloader consumption, where shard skew becomes
    stragglers in every training epoch.

    One scan + one {_N_SHARDS}-group aggregate; the mean is a broadcast
    scalar. Reassignment under corpus growth only moves new docs (hash
    is content-addressed by id, not position)."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % _N_SHARDS
    )
    n_tokens = F.size(F.split(normalize_text(F.col("text")), " "))
    per = (
        docs.select(shard.alias("shard"), n_tokens.alias("n_tokens"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )
    mean = per.agg(F.avg("n_tokens").alias("_mean"))
    return (
        per.crossJoin(F.broadcast(mean))
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("_mean"), 6).alias(
                "tokens_vs_mean"
            ),
        )
        .orderBy("shard")
    )


_TOKEN_BUDGET = 20_000


@query(
    "curation_token_budget_fill",
    oracle=f"""
    WITH per_source AS (
      SELECT source,
             CAST(SUM(len(string_split({_NORM_SQL}, ' '))) AS BIGINT)
               AS n_tokens,
             round(CAST(AVG(n_chars) AS DOUBLE), 6) AS priority
      FROM documents
      GROUP BY source
    ),
    filled AS (
      SELECT source, n_tokens, priority,
             CAST(SUM(n_tokens) OVER (ORDER BY priority DESC, source
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM per_source
    )
    SELECT source, n_tokens, priority, cum_tokens,
           CAST(CASE
             WHEN cum_tokens <= {_TOKEN_BUDGET} THEN n_tokens
             ELSE greatest({_TOKEN_BUDGET} - (cum_tokens - n_tokens), 0)
           END AS BIGINT) AS kept_tokens
    FROM filled
    ORDER BY priority DESC, source
    """,
)
def curation_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture fill: sources ranked by priority (here: mean
    doc length as the quality proxy) fill a fixed training-token budget
    greedily; the source straddling the budget is taken partially, the
    rest contribute zero — the dataset-mixing step that decides what a
    fixed-compute training run actually sees.

    The global window runs over SOURCE-level aggregates (tens of rows at
    any corpus size), not documents — ordering the corpus itself never
    happens. One groupBy(source) + one tiny window."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum(F.size(F.split(normalize_text(F.col("text")), " ")))
        .cast("bigint")
        .alias("n_tokens"),
        # round BEFORE the window order so both engines rank identical keys
        F.round(F.avg("n_chars").cast("double"), 6).alias("priority"),
    )
    w = (
        Window.orderBy(F.col("priority").desc(), "source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = per_source.select(
        "source",
        "n_tokens",
        "priority",
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
    )
    kept = (
        F.when(F.col("cum_tokens") <= _TOKEN_BUDGET, F.col("n_tokens"))
        .otherwise(
            F.greatest(
                F.lit(_TOKEN_BUDGET) - (F.col("cum_tokens") - F.col("n_tokens")),
                F.lit(0),
            )
        )
        .cast("bigint")
    )
    return filled.withColumn("kept_tokens", kept).orderBy(
        F.col("priority").desc(), "source"
    )


@query(
    "curation_quality_percentile_gate",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
        CAST(LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS INTEGER) AS n_tokens
      FROM documents
    ),
    th AS (
      SELECT source, quantile_cont(n_tokens, 0.25) AS p25 FROM t GROUP BY source
    )
    SELECT t.doc_id, t.source, t.n_tokens, ROUND(th.p25, 6) AS p25_tokens
    FROM t JOIN th USING (source)
    WHERE t.n_tokens >= th.p25
    ORDER BY doc_id
    """,
)
def curation_quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ADAPTIVE quality gate: drop each source's shortest
    quartile (token count below that source's own 25th percentile) — the
    FineWeb/Gopher-style pattern where thresholds are relative to the
    domain, not global (a threshold right for web text guts code or
    reference material). Spark `percentile` interpolates identically to
    DuckDB quantile_cont, so the gate boundary is engine-exact.

    Scale: one corpus scan computes tokens map-side; the per-source
    threshold table is |sources| rows, explicitly broadcast back — the
    corpus itself never shuffles (contrast a per-source window, which
    would serialize each source through one partition)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )
    th = t.groupBy("source").agg(
        F.expr("percentile(n_tokens, 0.25)").alias("p25")
    )
    return (
        t.join(F.broadcast(th), "source")
        .where(F.col("n_tokens") >= F.col("p25"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.round("p25", 6).alias("p25_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "curation_train_order_shuffle",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS hx,
             ('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
               AS shard_id
      FROM documents
    )
    SELECT doc_id, shard_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY hx, doc_id)
                AS INTEGER) AS shard_pos
    FROM h ORDER BY doc_id
    """,
)
def curation_train_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets a
    (shard_id, shard_pos) from its id's md5 — the materialized "shuffled
    dataset" step before sequence packing. Hash ordering decorrelates
    neighbors (crawl order, domain runs) without rand(): the same corpus
    always shuffles identically across engines, reruns, and partitionings,
    which is what makes training runs reproducible.

    Scale: shard assignment is a map-side expression (zero shuffle); the
    within-shard position is one row_number per shard — shards are the
    write-parallelism unit, so at 100 TB you size n_shards to thousands
    and each window stays executor-sized. The md5 sort key is computed
    once, map-side, before the shuffle."""
    from pucminas_data_pipelines_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.col("doc_id").cast("string"))
    h = docs.select(
        "doc_id",
        hx.alias("hx"),
        hash_bucket(F.col("doc_id"), 8).alias("shard_id"),
    )
    w = Window.partitionBy("shard_id").orderBy("hx", "doc_id")
    return (
        h.withColumn("shard_pos", F.row_number().over(w).cast("int"))
        .select("doc_id", "shard_id", "shard_pos")
        .orderBy("doc_id")
    )


@query(
    "curation_temperature_mixture",
    oracle="""
    WITH counted AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS raw_share
      FROM documents GROUP BY source
    ),
    scaled AS (
      SELECT source, n_docs, raw_share,
             SQRT(raw_share) / SUM(SQRT(raw_share)) OVER () AS temp_share
      FROM counted
    )
    SELECT source, n_docs,
           ROUND(raw_share, 6) AS raw_share,
           ROUND(temp_share, 6) AS temp_share,
           CAST(ROUND(temp_share * 10000) AS BIGINT) AS sampled_docs_per_10k,
           ROUND(temp_share / raw_share, 6) AS upweight_factor
    FROM scaled
    ORDER BY source
    """,
)
def curation_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture (tau = 0.5, i.e. p^tau
    renormalized — the multilingual/multi-domain rebalancing rule from
    mBERT/XLM-R and LLM data recipes): rare sources are upweighted toward
    uniform while the head is flattened, in contrast to
    curation_domain_mixture's hard 5% cap.

    Scale: two tiny aggregates over |sources| rows after one
    map-side-combined count — the plan's only full-data pass is the
    count itself. IEEE sqrt is bit-identical across engines, so shares
    hash-match exactly."""
    d = load_table(spark, sf_dir, "documents")
    counted = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = Window.partitionBy()
    scaled = counted.select(
        "source",
        "n_docs",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(tot)).alias(
            "raw_share"
        ),
    ).select(
        "source",
        "n_docs",
        "raw_share",
        (F.sqrt("raw_share") / F.sum(F.sqrt("raw_share")).over(tot)).alias(
            "temp_share"
        ),
    )
    return scaled.select(
        "source",
        "n_docs",
        F.round("raw_share", 6).alias("raw_share"),
        F.round("temp_share", 6).alias("temp_share"),
        F.round(F.col("temp_share") * 10000).cast("bigint").alias(
            "sampled_docs_per_10k"
        ),
        F.round(F.col("temp_share") / F.col("raw_share"), 6).alias(
            "upweight_factor"
        ),
    ).orderBy("source")


@query(
    "curation_seq_length_histogram",
    oracle="""
    WITH lens AS (
      SELECT CAST(LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    binned AS (
      SELECT CAST(FLOOR(LN(CAST(GREATEST(n_tokens, 1) AS DOUBLE)) / LN(2.0))
                  AS INTEGER) AS log2_bucket,
             n_tokens
      FROM lens
    )
    SELECT log2_bucket,
           CAST(POW(2, log2_bucket) AS BIGINT) AS bucket_min_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(n_tokens) AS BIGINT) AS shortest,
           CAST(MAX(n_tokens) AS BIGINT) AS longest
    FROM binned
    GROUP BY log2_bucket
    ORDER BY log2_bucket
    """,
)
def curation_seq_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram in power-of-two buckets — the planning
    input for context-length choice and packing efficiency
    (curation_sequence_packing): the bucket profile says how much of the
    corpus fragments at a 2^k context and how much padding a naive
    batcher would burn.

    Integer-exact bucketing (ln ratio floored on identical doubles), one
    map-side-combined aggregate over ~15 buckets."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    binned = d.select(
        F.floor(
            F.log(F.greatest(n_tokens, F.lit(1)).cast("double")) / F.log(F.lit(2.0))
        )
        .cast("int")
        .alias("log2_bucket"),
        n_tokens.alias("n_tokens"),
    )
    return (
        binned.groupBy("log2_bucket")
        .agg(
            F.pow(F.lit(2), F.col("log2_bucket")).cast("bigint").alias(
                "bucket_min_tokens"
            ),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("shortest"),
            F.max("n_tokens").alias("longest"),
        )
        .select(
            "log2_bucket",
            "bucket_min_tokens",
            "n_docs",
            "total_tokens",
            "shortest",
            "longest",
        )
        .orderBy("log2_bucket")
    )


@query(
    "corpus_dataset_card",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, source, n_chars,
             CAST(LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS BIGINT)
               AS n_tokens,
             md5(LOWER(TRIM(text))) AS norm_hash
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(n_tokens) AS BIGINT) AS shortest_doc_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS longest_doc_tokens,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6)
             AS mean_doc_tokens,
           CAST(COUNT(*) - COUNT(DISTINCT norm_hash) AS BIGINT)
             AS n_exact_dup_docs,
           ROUND(1.0 - CAST(COUNT(DISTINCT norm_hash) AS DOUBLE) / COUNT(*), 6)
             AS exact_dup_rate
    FROM t
    """,
)
def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass dataset card ("datasheets for datasets"): corpus size in
    docs/tokens/chars, language and source breadth, length extremes, and
    the exact-duplicate rate (normalized-hash) — the summary block a
    training-data release publishes, computed as a SINGLE aggregate so
    the card is cheap enough to regenerate on every corpus version.

    Scale: one scan; every statistic is an algebraic or distinct
    aggregate with map-side partials (the distincts expand-and-combine —
    at extreme cardinality swap count_distinct for the HLL/bitmap
    sketches this registry already carries)."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    t = d.select(
        "lang",
        "source",
        "n_chars",
        n_tokens.alias("n_tokens"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("norm_hash"),
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_tokens").alias("shortest_doc_tokens"),
        F.max("n_tokens").alias("longest_doc_tokens"),
        F.round(
            F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_doc_tokens"),
        (F.count(F.lit(1)) - F.count_distinct("norm_hash"))
        .cast("bigint")
        .alias("n_exact_dup_docs"),
        F.round(
            F.lit(1.0)
            - F.count_distinct("norm_hash").cast("double") / F.count(F.lit(1)),
            6,
        ).alias("exact_dup_rate"),
    )


@query(
    "curation_chat_format_validation",
    oracle="""
    WITH convo AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN 'assistant' ELSE 'user' END
               AS first_role,
             CASE WHEN doc_id % 7 = 0 THEN '' ELSE TRIM(text) END
               AS user_content,
             CASE WHEN doc_id % 5 = 0 THEN 'user' ELSE 'assistant' END
               AS last_role
      FROM documents
    ),
    checked AS (
      SELECT doc_id,
             first_role = 'user' AS starts_with_user,
             LENGTH(user_content) > 0 AS no_empty_turns,
             last_role = 'assistant' AS ends_with_assistant,
             first_role = 'user' AND LENGTH(user_content) > 0
               AND last_role = 'assistant' AS valid
      FROM convo
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(CASE WHEN NOT starts_with_user THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bad_first_role,
           CAST(SUM(CASE WHEN NOT no_empty_turns THEN 1 ELSE 0 END)
                AS BIGINT) AS n_empty_turns,
           CAST(SUM(CASE WHEN NOT ends_with_assistant THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bad_last_role,
           CAST(SUM(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
    FROM checked
    """,
)
def curation_chat_format_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-format (SFT-record) validation: each document is framed as a
    two-turn conversation JSON (with deterministic corruption: every 11th
    record starts with the wrong role, every 7th has an empty turn, every
    5th ends on the user) and validated through the REAL JSON path —
    to_json → from_json with an explicit array<struct<role,content>>
    schema → higher-order checks (element_at for role order, forall for
    non-empty content). The structural gate every instruction-tuning
    pipeline runs before tokenization; the oracle derives the same
    verdicts from the corruption rules directly, so the JSON round-trip
    itself is what's under test.

    Scale: per-row JSON parse + lambda checks, whole-stage codegen, one
    single-row rollup. Malformed JSON (PERMISSIVE null from from_json)
    would surface as NULL roles → counted invalid, never an exception."""
    d = load_table(spark, sf_dir, "documents")
    convo_json = F.to_json(
        F.array(
            F.struct(
                F.when(F.col("doc_id") % 11 == 0, "assistant")
                .otherwise("user")
                .alias("role"),
                F.when(F.col("doc_id") % 7 == 0, "")
                .otherwise(F.trim(F.col("text")))
                .alias("content"),
            ),
            F.struct(
                F.when(F.col("doc_id") % 5 == 0, "user")
                .otherwise("assistant")
                .alias("role"),
                F.lit("ok").alias("content"),
            ),
        )
    )
    parsed = d.select(
        "doc_id",
        F.from_json(
            convo_json, "array<struct<role:string,content:string>>"
        ).alias("turns"),
    )
    starts = F.element_at("turns", 1)["role"] == "user"
    ends = F.element_at("turns", -1)["role"] == "assistant"
    non_empty = F.forall("turns", lambda t: F.length(t["content"]) > 0)
    checked = parsed.select(
        starts.alias("starts_with_user"),
        non_empty.alias("no_empty_turns"),
        ends.alias("ends_with_assistant"),
        (starts & non_empty & ends).alias("valid"),
    )
    return checked.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum(F.when(~F.col("starts_with_user"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bad_first_role"),
        F.sum(F.when(~F.col("no_empty_turns"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_empty_turns"),
        F.sum(F.when(~F.col("ends_with_assistant"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bad_last_role"),
        F.sum(F.when(F.col("valid"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_valid"),
    )


@query(
    "curation_epoch_repeat_plan",
    oracle="""
    WITH counted AS (
      SELECT source,
             CAST(SUM(LEN(regexp_split_to_array(TRIM(text), '\\s+')))
                  AS BIGINT) AS avail_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    shared AS (
      SELECT source, avail_tokens, n_docs,
             SQRT(CAST(avail_tokens AS DOUBLE))
               / SUM(SQRT(CAST(avail_tokens AS DOUBLE))) OVER () AS t_share
      FROM counted
    ),
    planned AS (
      SELECT source, avail_tokens, n_docs,
             t_share * 100000 AS target_tokens,
             LEAST(4.0, t_share * 100000 / avail_tokens) AS epochs
      FROM shared
    )
    SELECT source, avail_tokens,
           CAST(ROUND(target_tokens) AS BIGINT) AS target_tokens,
           ROUND(epochs, 4) AS epochs,
           CAST(ROUND(LEAST(target_tokens, 4.0 * avail_tokens)) AS BIGINT)
             AS effective_tokens,
           epochs >= 4.0 AS repeat_capped
    FROM planned
    ORDER BY source
    """,
)
def curation_epoch_repeat_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch/repeat planning under data constraints (Muennighoff et al.
    2023): temperature-scaled target tokens per source against a 100k
    training budget, with repeats CAPPED at 4 epochs — past ~4 repeats a
    source's marginal value decays to near zero, so the plan reports the
    effective (cap-clipped) token contribution and flags capped sources;
    the shortfall is what you go buy more data for. Composes
    curation_temperature_mixture (shares) with curation_token_budget_fill
    (budget) into the table a training run actually consumes.

    Scale: per-source token counts are one map-side-combined aggregate;
    the plan math runs on |sources| rows."""
    d = load_table(spark, sf_dir, "documents")
    counted = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("bigint")
        .alias("avail_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tot = Window.partitionBy()
    shared = counted.select(
        "source",
        "avail_tokens",
        (
            F.sqrt(F.col("avail_tokens").cast("double"))
            / F.sum(F.sqrt(F.col("avail_tokens").cast("double"))).over(tot)
        ).alias("t_share"),
    )
    target = F.col("t_share") * 100000
    epochs = F.least(F.lit(4.0), target / F.col("avail_tokens"))
    return shared.select(
        "source",
        "avail_tokens",
        F.round(target).cast("bigint").alias("target_tokens"),
        F.round(epochs, 4).alias("epochs"),
        F.round(F.least(target, F.lit(4.0) * F.col("avail_tokens")))
        .cast("bigint")
        .alias("effective_tokens"),
        (epochs >= 4.0).alias("repeat_capped"),
    ).orderBy("source")


# --------------------------------------------- DSIR importance resampling --

_DSIR_B = 512  # hashed n-gram feature buckets
_DSIR_K = 64  # selection budget (docs)
_DSIR_TARGET = "en"  # target-domain proxy: the English slice

_DSIR_LR_ROUND = 9


def _micros_double(col):
    """Exact decimal(.,9) -> 6-dp double, bit-identical across engines:
    FLOOR(x * 1e6 + 0.5) in EXACT decimal arithmetic (round-half-toward
    +inf, the same rule everywhere; the int64-backed decimal product
    cannot overflow at this magnitude), then int -> double (exact below
    2^53) and ONE correctly-rounded IEEE division by the exactly-
    representable 1e6. A direct decimal->double CAST is engine-dependent
    at the last ulp (DuckDB multiplies by an inexact reciprocal; the JVM
    converts via the correctly-rounded BigDecimal path), which flips a
    6-decimal ROUND on ~10% of rows."""
    micros = F.floor(col.cast("decimal(18,9)") * F.lit(1000000) + F.lit(0.5))
    return micros.cast("bigint").cast("double") / F.lit(1000000.0)


@query(
    "curation_dsir_selection",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id, lang, w[i] AS gram
      FROM toks, unnest(generate_series(1, len(w))) AS t(i)
      UNION ALL
      SELECT doc_id, lang, w[i] || ' ' || w[i + 1] AS gram
      FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
    ),
    docb AS (
      SELECT doc_id, ANY_VALUE(lang) AS lang,
             ('0x' || substring(md5(gram), 1, 8))::BIGINT % {_DSIR_B} AS b,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM grams
      GROUP BY doc_id, ('0x' || substring(md5(gram), 1, 8))::BIGINT % {_DSIR_B}
    ),
    raw_b AS (SELECT b, CAST(SUM(cnt) AS BIGINT) AS cr FROM docb GROUP BY b),
    tgt_b AS (
      SELECT b, CAST(SUM(cnt) AS BIGINT) AS ct
      FROM docb WHERE lang = '{_DSIR_TARGET}' GROUP BY b
    ),
    tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS tr,
             CAST(SUM(CASE WHEN lang = '{_DSIR_TARGET}' THEN cnt
                           ELSE 0 END) AS BIGINT) AS tt
      FROM docb
    ),
    lr AS (
      SELECT r.b,
             CAST(ROUND(
                 LN(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE))
               - LN(CAST(tot.tt + {_DSIR_B} AS DOUBLE))
               - LN(CAST(r.cr + 1 AS DOUBLE))
               + LN(CAST(tot.tr + {_DSIR_B} AS DOUBLE)),
               {_DSIR_LR_ROUND}) AS DECIMAL(12, {_DSIR_LR_ROUND})) AS lr
      FROM raw_b r LEFT JOIN tgt_b t ON r.b = t.b CROSS JOIN tot
    ),
    weighted AS (
      SELECT d.doc_id, ANY_VALUE(d.lang) AS lang,
             CAST(SUM(d.cnt) AS BIGINT) AS n_grams,
             SUM(CAST(d.cnt AS DECIMAL(8, 0)) * lr.lr) AS lw
      FROM docb d JOIN lr ON d.b = lr.b
      GROUP BY d.doc_id
    ),
    keyed AS (
      SELECT doc_id, lang, n_grams, lw,
             lw + CAST(ROUND(-LN(-LN(
                 ((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   + 0.5) / 4294967296.0))), {_DSIR_LR_ROUND})
               AS DECIMAL(18, {_DSIR_LR_ROUND})) AS gkey
      FROM weighted
    ),
    topk AS (SELECT * FROM keyed ORDER BY gkey DESC, doc_id LIMIT {_DSIR_K})
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY gkey DESC, doc_id) AS INT) AS rank,
           doc_id, lang, n_grams,
           CAST(CAST(FLOOR(CAST(lw AS DECIMAL(18, 9)) * 1000000 + 0.5)
                AS BIGINT) AS DOUBLE) / 1000000.0 AS dsir_logweight,
           CAST(CAST(FLOOR(CAST(gkey AS DECIMAL(18, 9)) * 1000000 + 0.5)
                AS BIGINT) AS DOUBLE) / 1000000.0 AS dsir_gumbel_key
    FROM topk ORDER BY rank
    """,
)
def curation_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023): score every raw document by the log-likelihood ratio
    of a target-domain bag-of-hashed-ngrams model (here: the English
    slice as the target proxy) against the raw-corpus model, then draw
    the K-document selection with Gumbel-top-k. Features are unigrams +
    bigrams hashed into 512 buckets (the paper's hashed n-gram
    parameterization); both bucket models are add-one smoothed.

    Determinism: the per-bucket log-ratio and the per-doc Gumbel key are
    quantized to DECIMAL(18,9) (the registry's float discipline), so
    doc-level weights are EXACT decimal sums, and the Gumbel noise is
    hash-derived (u = (md5-coin + 0.5) / 2^32 per doc_id) rather than an
    RNG — the same deterministic resample on both engines. Production
    swaps the coin for true Gumbel draws; nothing else changes.

    Scale: gram extraction is row-local (split + transform, no
    explode-per-token shuffle until the (doc_id, bucket) groupBy — the
    one data-grain shuffle); both corpus models are bucket-grain
    (512 rows) and BROADCAST back; selection is TakeOrdered (orderBy +
    limit), never a global window over data grain — the rank window
    runs over the already-limited K rows. This is exactly the shape
    that lets DSIR sweep a 100 TB crawl: one shuffle, two tiny
    broadcast models, a top-k."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.split(normalize_text(F.col("text")), " ").alias("w")
    )
    bigrams = F.when(
        F.size("w") < 2, F.array().cast("array<string>")
    ).otherwise(
        F.expr(
            "transform(sequence(1, size(w) - 1),"
            " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
        )
    )
    grams = toks.select(
        "doc_id", "lang", F.explode(F.concat(F.col("w"), bigrams)).alias("gram")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long")
        % _DSIR_B
    )
    docb = (
        grams.select("doc_id", "lang", bucket.alias("b"))
        .groupBy("doc_id", "b")
        .agg(
            F.any_value(F.col("lang")).alias("lang"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    # docb feeds four consumers (raw model, target model, totals, doc
    # weights): persist it so the corpus-side gram explode runs ONCE —
    # at 100 TB docb is bucket-bounded per doc (<=512 rows/doc, far
    # smaller than the token stream), the cheap thing to keep.
    docb.persist()
    raw_b = docb.groupBy("b").agg(F.sum("cnt").cast("bigint").alias("cr"))
    tgt_b = (
        docb.where(F.col("lang") == _DSIR_TARGET)
        .groupBy("b")
        .agg(F.sum("cnt").cast("bigint").alias("ct"))
    )
    tot = docb.agg(
        F.sum("cnt").cast("bigint").alias("tr"),
        F.sum(F.when(F.col("lang") == _DSIR_TARGET, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("tt"),
    )
    lr = (
        raw_b.join(tgt_b, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double"))
                - F.log((F.col("tt") + _DSIR_B).cast("double"))
                - F.log((F.col("cr") + 1).cast("double"))
                + F.log((F.col("tr") + _DSIR_B).cast("double")),
                _DSIR_LR_ROUND,
            )
            .cast(f"decimal(12,{_DSIR_LR_ROUND})")
            .alias("lr"),
        )
    )
    weighted = (
        docb.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value(F.col("lang")).alias("lang"),
            F.sum("cnt").cast("bigint").alias("n_grams"),
            F.sum(F.col("cnt").cast("decimal(8,0)") * F.col("lr")).alias(
                "lw"
            ),
        )
    )
    coin = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("double")
    u = (coin + F.lit(0.5)) / F.lit(4294967296.0)
    keyed = weighted.select(
        "doc_id",
        "lang",
        "n_grams",
        "lw",
        (
            F.col("lw")
            + F.round(-F.log(-F.log(u)), _DSIR_LR_ROUND).cast(
                f"decimal(18,{_DSIR_LR_ROUND})"
            )
        ).alias("gkey"),
    )
    topk = keyed.orderBy(F.desc("gkey"), "doc_id").limit(_DSIR_K)
    rank_w = Window.orderBy(F.desc("gkey"), "doc_id")
    return topk.select(
        F.row_number().over(rank_w).cast("int").alias("rank"),
        "doc_id",
        "lang",
        "n_grams",
        _micros_double(F.col("lw")).alias("dsir_logweight"),
        _micros_double(F.col("gkey")).alias("dsir_gumbel_key"),
    ).orderBy("rank")
