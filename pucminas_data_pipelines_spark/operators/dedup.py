"""Deduplication operators for large-scale training-data pipelines:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

All Spark-native (expressions + joins); no Python in the row path. Each
operator returns DataFrames, composes with the rest of the engine, and is
designed around the scalable shape:

  shingle → signature (narrow map) → band/bucket (explode by a small
  constant) → bucket equi-join (hash join on bucket key) → exact verify
  (only on candidates)

so the quadratic all-pairs comparison never materializes: the only shuffle
keys are band hashes, and candidate verification touches |candidates| pairs,
not |docs|².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.functions.text import (
    normalize_text,
    ordered_ngram_hashes,
    token_shingle_hashes,
)
from pucminas_data_pipelines_spark.functions.vector import cosine_similarity
from pucminas_data_pipelines_spark.operators.checkpoint import (
    free_local_checkpoint,
)

def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str, normalized: bool = True
) -> DataFrame:
    """Exact dedup by content hash: one row per distinct content with the
    representative (min id) and the duplicate count.

    Scale: md5 is computed map-side; the groupBy shuffles 16-byte keys with
    map-side combine — the cheapest possible full-corpus dedup."""
    content = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    return (
        df.select(F.col(id_col), F.md5(content.cast("binary")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document (array<bigint> of length num_hashes).

    Shape: explode HASHED shingles (token_shingle_hashes — the gram
    strings are never built: each token is hashed once and each gram hash
    is one variadic xxhash64 over the n token hashes, same tail/distinct
    semantics as token_shingles modulo ~2⁻⁶⁴ collisions) → num_hashes
    cheap 8-byte re-hashes (xxhash64 of the long salted with the hash
    index) as a wide 64-column projection → groupBy(id).min per column →
    assemble the array. All whole-stage-codegen'd; the single shuffle
    (groupBy id) is map-side combined, so at corpus scale it moves one
    64-long row per (partition × doc).

    (A pure higher-order-function variant — array_min over 64 transforms —
    avoids the shuffle but allocates 64 arrays per row and falls out of
    codegen for deep trees: measured 4x slower. Explode wins.)"""
    exploded = df.select(
        F.col(id_col),
        F.explode(token_shingle_hashes(F.col(text_col), shingle_n)).alias("_h"),
    )
    # seed folds into the per-hash salt: distinct seeds give independent
    # hash families (the seedability the signature API promises)
    wide = exploded.select(
        F.col(id_col),
        *[
            F.xxhash64("_h", F.lit(seed + i)).alias(f"_m{i}")
            for i in range(num_hashes)
        ],
    )
    return (
        wide.groupBy(id_col)
        .agg(*[F.min(f"_m{i}").alias(f"_m{i}") for i in range(num_hashes)])
        .select(
            F.col(id_col),
            F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("minhash"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH, with the
    estimated Jaccard (fraction of agreeing minhashes) filtered at
    ``threshold``.

    Returns (id_a, id_b, est_jaccard), id_a < id_b, deduplicated.

    Scale: docs explode ×bands (constant), shuffle on band hash; buckets
    self-join only within equal band hashes. Hot buckets (boilerplate text)
    are the known skew risk — AQE skew-join splits them; for adversarial
    corpora cap bucket size upstream.

    Storage lifetime: the signature DataFrame is persisted (it feeds the
    banding pass plus two candidate-verify joins). With ``materialize=True``
    (default) the pair set — tiny next to the corpus — is eagerly
    localCheckpoint'ed and the signature cache is released before
    returning, so long-lived sessions never accumulate executor storage.
    Pass ``materialize=False`` to keep the plan lazy/composable; the
    signature cache then lives until Spark's ContextCleaner collects it."""
    if bands < 1 or num_hashes % bands != 0:
        # a non-dividing band count would silently IGNORE the trailing
        # num_hashes % bands signature positions in the banding pass
        # (weakening recall with no error anywhere) — refuse loudly
        raise ValueError(
            f"bands={bands} must be >=1 and divide num_hashes={num_hashes}"
        )
    rows = num_hashes // bands
    # persist: the signature job runs once; banding, the two
    # fetch-signature joins, and any downstream verify all reuse it
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n, seed).persist()

    # Banding stays NARROW — (id, band, band_hash) only. Carrying the
    # num_hashes-long signature array through the ×bands explode and the
    # self-join would multiply shuffle bytes by ~bands × 8 × num_hashes
    # per doc; instead signatures are re-joined below only for the
    # (few) surviving candidate pairs.
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    # xxhash64 hashes the array slice directly (complex
                    # types supported) — no string concat needed
                    F.xxhash64(
                        F.lit(b), F.slice(F.col("minhash"), b * rows + 1, rows)
                    ).alias(f"_b{b}")
                    for b in range(bands)
                ]
            )
        ).alias("band_hash"),
    )

    left = banded.select(F.col("band_hash"), F.col(id_col).alias("id_a"))
    right = banded.select(F.col("band_hash"), F.col(id_col).alias("id_b"))
    pairs = (
        left.join(right, "band_hash")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    agree = F.size(
        F.filter(
            F.zip_with(F.col("mh_a"), F.col("mh_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    out = (
        pairs.join(sigs.select(F.col(id_col).alias("id_a"), F.col("minhash").alias("mh_a")), "id_a")
        .join(sigs.select(F.col(id_col).alias("id_b"), F.col("minhash").alias("mh_b")), "id_b")
        .withColumn(
            "est_jaccard",
            F.round(agree.cast("double") / F.lit(num_hashes), 6),
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    if materialize:
        out = out.localCheckpoint(eager=True)
        sigs.unpersist()
    return out


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 60) -> DataFrame:
    """SimHash per document from whitespace tokens (60 bits by default).

    Per bit b: sign of Σ_tokens (±1 depending on bit b of the token hash).
    The token hash is the first 15 hex chars of md5 (60 bits) — md5 is
    bit-identical across engines, so the whole signature is reproducible
    in the DuckDB oracle (`('0x' || substring(md5(tok),1,15))::bigint`),
    unlike engine-specific xxhash64. Expression-only: the per-bit sums
    fold over the token array without exploding rows."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    hashed = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    # One exploded row per token, then 60 codegen'd conditional SUMs per
    # document. An earlier version folded 60 F.aggregate HOF lambdas over
    # the token array per row — interpreted per element, 7.8 s at sf0.1;
    # this shape whole-stage-codegens and map-side-combines to one narrow
    # 60-int row per doc before the shuffle (2.5 s at sf0.1). The groupBy
    # shuffles signatures, not text — at 100 TB that is ~60 ints per doc,
    # the same per-doc signature exchange MinHash banding already pays.
    ex = df.select(F.col(id_col), F.explode(hashed).alias("_h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    g = ex.groupBy(id_col).agg(*bit_sums)
    # assemble bits into one bigint: Σ (sum_b > 0) << b
    assembled = None
    for b in range(bits):
        term = F.shiftleft(
            F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
            b,
        )
        assembled = term if assembled is None else assembled + term
    return g.select(F.col(id_col), assembled.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 60,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming, candidates found
    by banding the hash into ``bands`` chunks. COMPLETE (every qualifying
    pair found) iff max_hamming < bands — pigeonhole: a pair differing in
    fewer bits than there are chunks agrees exactly on ≥1 chunk. With
    max_hamming >= bands it degrades to a recall<1 candidate generator.

    Returns (id_a, id_b, hamming)."""
    width = bits // bands
    sh = simhash(df, id_col, text_col, bits=bits)
    mask = (1 << width) - 1
    banded = sh.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(F.col(id_col), "simhash", "bb.band", "bb.chunk")

    left = banded.select(
        "band", "chunk", F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a")
    )
    right = banded.select(
        "band", "chunk", F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b")
    )
    return (
        left.join(right, ["band", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    candidates: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    with_counts: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard verification over candidate (id_a, id_b) pairs:
    |A∩B| / |A∪B| on distinct token n-grams. The verify stage after LSH —
    only candidate pairs pay the set-intersection cost.

    ``with_counts=True`` additionally emits the distinct-shingle counts
    (n_common, n_a, n_b) so callers can derive directional containment
    |A∩B|/|A| without recomputing the sets.

    r13: the shingle sets are HASH sets (token_shingle_hashes) — every
    output is a function of set sizes, which are identical modulo
    ~2⁻⁶⁴ within-doc hash collisions, so the intersect/union compares
    8-byte longs instead of ~20-byte gram strings and the gram strings
    are never built."""
    sh = docs.select(
        F.col(id_col),
        token_shingle_hashes(F.col(text_col), shingle_n).alias("shingles"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    out = (
        candidates.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard", F.round(inter.cast("double") / union.cast("double"), 6)
        )
        .where(F.col("jaccard") >= threshold)
    )
    if with_counts:
        return out.select(
            "id_a",
            "id_b",
            "jaccard",
            inter.cast("double").alias("n_common"),
            # shingle arrays are already distinct (array_distinct inside
            # token_shingle_hashes) — size is the set cardinality
            F.size("sh_a").cast("double").alias("n_a"),
            F.size("sh_b").cast("double").alias("n_b"),
        )
    return out.select("id_a", "id_b", "jaccard")


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact-substring duplicated-span detection: per document, the maximal
    token spans whose every ``span_tokens``-gram also appears in at least
    ``min_docs - 1`` OTHER documents — the operator behind
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al., 2022), which removes repeated 50-token substrings rather than
    whole near-dup documents. Returns (id, span_start, span_len_tokens,
    n_dup_grams) with span_start a 0-based token offset into the
    normalized text.

    Distributed shape (the suffix-array of the paper is single-node; the
    cluster-scale analogue is a shingle inverted index):
      1. ordered n-grams with positions (narrow map, posexplode);
      2. cross-document frequency per gram HASH — groupBy on an 8-byte
         xxhash64 key with map-side partial count-distinct, never the
         gram text;
      3. LEFT SEMI join back (gram-hash keyed — the only wide shuffle,
         volume = total token count, same order as any inverted index);
      4. gaps-and-islands per document (pos - row_number over a per-doc
         window) to merge overlapping duplicated grams into maximal
         spans — per-doc state only, bounded by document length.
    The |docs|² pair space never materializes; cost is linear in corpus
    tokens. 64-bit gram-hash collisions can in principle merge two
    distinct grams (~n_grams²/2⁶⁵); at trillion-gram scale switch the
    semi-join key to (hash, length) or a 128-bit hash.
    """
    n = span_tokens
    # gram IDENTITY is all downstream steps need, so the grams are hashed
    # without ever building the n-token gram strings (no concat_ws alloc,
    # no hashing of ~n·avg_token bytes per position — see
    # functions/text.ordered_ngram_hashes), and the helper emits FULL
    # grams only, so the old per-gram split()-length filter (one extra
    # array alloc per corpus position) is gone too.
    hashed = df.select(
        F.col(id_col),
        F.posexplode(ordered_ngram_hashes(F.col(text_col), n)).alias(
            "pos", "gram_hash"
        ),
    )
    dup = (
        hashed.groupBy("gram_hash")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )
    dup_pos = hashed.join(dup.select("gram_hash"), "gram_hash", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = dup_pos.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        islands.groupBy(id_col, "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") - F.min("pos") + n).alias("span_len_tokens"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .drop("grp")
    )


def redact_duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """REMOVE every duplicated span from each document — the actionable
    step after duplicated_spans, and what Lee et al. (2022) actually do
    to the training corpus: cut the repeated substrings, keep the rest of
    the document. Returns (id, n_tokens_kept, n_tokens_dropped,
    redacted_text) over the NORMALIZED token stream (redaction operates
    on the same tokenization the span offsets index into).

    Shape on top of duplicated_spans' inverted-index output:
      1. tokens with positions (narrow posexplode);
      2. anti join tokens against their doc's span ranges — equi on doc
         id with the position-range residual; spans per doc are few, so
         the join stays hash-keyed and skew-safe;
      3. order-preserving reassembly WITHOUT a window: array_sort over
         collected (pos, token) structs, then join — partition-local,
         deterministic under any shuffle order;
      4. docs with every token redacted (or none kept) survive via a
         left join from the full doc list, with empty text.
    Cost is linear in corpus tokens, like the detector itself."""
    spans = duplicated_spans(df, id_col, text_col, span_tokens, min_docs)
    norm_toks = F.split(normalize_text(F.col(text_col)), " ")
    toks = df.select(
        F.col(id_col), F.posexplode(norm_toks).alias("tpos", "tok")
    )
    s = spans.select(
        F.col(id_col).alias("_sid"), "span_start", "span_len_tokens"
    )
    uncovered = toks.join(
        s,
        (F.col(id_col) == F.col("_sid"))
        & (F.col("tpos") >= F.col("span_start"))
        & (F.col("tpos") < F.col("span_start") + F.col("span_len_tokens")),
        "left_anti",
    )
    kept = uncovered.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                lambda st: st["tok"],
            ),
            " ",
        ).alias("redacted_text"),
    )
    totals = df.select(F.col(id_col), F.size(norm_toks).alias("_n_total"))
    return totals.join(kept, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens_kept", F.lit(0)).cast("bigint").alias(
            "n_tokens_kept"
        ),
        (F.col("_n_total") - F.coalesce("n_tokens_kept", F.lit(0)))
        .cast("bigint")
        .alias("n_tokens_dropped"),
        F.coalesce("redacted_text", F.lit("")).alias("redacted_text"),
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
    algorithm: str = "lpa",
) -> DataFrame:
    """Collapse duplicate pairs into clusters: connected components by
    iterative min-label propagation. Returns (member_id, cluster_rep) where
    cluster_rep is the smallest id reachable from member_id — the row to
    KEEP per cluster; every other member is the drop set. The final step of
    any near-dup pipeline (pairs alone don't say which copies to delete
    when dups chain a~b~c).

    Scale: each iteration is one shuffle round (edge join + min agg);
    convergence needs at most the graph diameter — near-dup clusters are
    shallow (boilerplate stars), so 3–5 rounds in practice; ``max_iters``
    bounds adversarial chains. Each round's labels are localCheckpoint'ed:
    an iterative plan that references the previous round twice grows
    EXPONENTIALLY if only persisted (persist caches data but keeps
    lineage; measured: a 12-round loop OOMs the driver just stringifying
    the plan) — checkpointing truncates lineage to O(1) per round, and
    the consumed round's blocks are released immediately
    (operators/checkpoint.py) so storage stays O(1) rounds too.

    ``algorithm``: ``"lpa"`` (default — min-label propagation, best when
    cluster diameters are small, which near-dup graphs are) or
    ``"two_phase"`` — the alternating large-star/small-star algorithm
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond"), which REWIRES the edge set toward per-component stars and
    converges in O(log n) rounds regardless of diameter. Identical
    output contract. Pick two_phase when components may chain deeply
    (citation graphs, web-link dedup at 100 TB): a 10^6-node path graph
    needs 10^6 LPA rounds but ~20 two-phase rounds. Per round two_phase
    costs one extra exchange (distinct) over LPA, so it loses on shallow
    graphs — that trade is the whole choice.

    .. versionchanged:: round 8 (BREAKING)
       The id-column gate tightened from "any numeric" to
       integral/decimal(p,0). float/double id columns that previously
       worked — and are exact for integral values up to 2^53 — now raise
       ``TypeError``: the convergence probe sums labels through a
       decimal(38,0) cast, and a fractional double rounds under that
       cast, so the "exact" probe could report a false fixpoint. Callers
       with provably-integral doubles must cast explicitly
       (``F.col(id).cast("long")``) before calling — an intentional
       opt-in that puts the exactness decision at the call site."""
    from pyspark.sql.types import DecimalType, IntegralType

    if algorithm not in ("lpa", "two_phase"):
        raise ValueError("algorithm must be 'lpa' or 'two_phase'")

    # The convergence probe below sums labels exactly via decimal(38,0):
    # a string id would cast to NULL and fake instant convergence, and a
    # fractional float label rounds under the decimal cast so the "exact"
    # probe could report a false fixpoint. Gate BOTH id columns to
    # integral/decimal — a mixed numeric/string pair would also coerce
    # labels to string through the union. Fail loudly.
    for col in (id_a, id_b):
        dt = pairs.schema[col].dataType
        ok = isinstance(dt, IntegralType) or (
            isinstance(dt, DecimalType) and dt.scale == 0
        )
        if not ok:
            raise TypeError(
                "dedup_clusters requires integral/decimal(p,0) ids "
                f"({col!r} is {dt.simpleString()!r}): a fractional id "
                "rounds under the probe's decimal(38,0) cast, faking a "
                "fixpoint — encode string/float/fractional-decimal ids to "
                "an integer key first (a dense id or collision-checked "
                "hash), then map cluster_rep back"
            )
    # undirected edge list, both directions
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    if algorithm == "two_phase":
        return _two_phase_cc(e, max_iters)
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    # r13 (guide §2.4): round 1 fused into initialization — with labels
    # initialized to the ids themselves, the first propagation round's
    # output is per-node min(self, neighbor ids), which is ONE groupBy
    # over the mirrored edges; the node-distinct the old init paid is
    # subsumed by the same groupBy. Saves a full round (edge join +
    # union-agg + probe barrier) on every call, bit-identical labels.
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.first("src"), F.min("dst")).alias("label"))
        .select(F.col("src").alias("id"), "label")
        .localCheckpoint(eager=False)
    )

    # Convergence probe: labels only ever DECREASE, so the total label sum
    # (exact decimal, overflow-free) strictly drops on any change and is
    # stable exactly at the fixpoint — one cheap agg over the round's
    # already-materialized frame, no old-vs-new join or filter needed.
    # r13 (guide §1.2): every checkpoint here is LAZY and the probe is
    # the action that materializes it — one scheduler barrier per round
    # instead of two (eager-checkpoint job + probe job), bit-identical
    # state. The initial probe likewise materializes the mirrored edge
    # checkpoint (the upstream pair generation still runs exactly once).
    _sum = lambda d: d.agg(  # noqa: E731
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    ).first()["s"]
    prev_sum = _sum(labels)

    for _ in range(max_iters):
        prev_labels = labels
        labels = _propagation_round(edges, labels).localCheckpoint(
            eager=False
        )
        new_sum = _sum(labels)  # materializes the round's checkpoint
        # the probe above was the lazy checkpoint's materializing action,
        # and the propagation join it ran was the old round's last
        # reader — free the consumed round's blocks now rather than
        # pinning O(rounds) dead label frames until the ContextCleaner
        # runs (same discipline as two_phase)
        free_local_checkpoint(prev_labels)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    return labels.select(
        F.col("id").alias("member_id"), F.col("label").alias("cluster_rep")
    )


def _propagation_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label propagation round: each node takes the min over its
    own and its neighbors' labels, as ONE edge join + ONE union + min
    aggregation — the self label rides the same groupBy instead of the
    third left-join exchange per round a joined-back convergence probe
    would need (plan shape pinned by ``test_dedup_clusters_round_plan``)."""
    neighbor = edges.join(labels, edges.src == labels.id).select(
        F.col("dst").alias("id"), F.col("label")
    )
    return (
        neighbor.unionByName(labels.select("id", "label"))
        .groupBy("id")
        .agg(F.min("label").alias("label"))
    )


def _two_phase_cc(e: DataFrame, max_iters: int) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris
    et al. 2014, Algorithm 2). State is the undirected edge SET stored
    in both directions (distinct, self-loops dropped); each alternation
    rewires edges toward per-component stars and provably converges in
    O(log² n) alternations worst case (O(log n) in practice) on any
    graph — diameter-independent, unlike LPA. The default max_iters=20
    therefore covers graphs far beyond any realistic pair set; raise it
    only on pathological inputs (the loop exits early at the fixpoint).

    large-star at node u: with m = min(Γ(u) ∪ {u}), emit (v, m) for
    every STRICTLY GREATER neighbor v ∈ Γ(u), v > u. (Every node
    survives: a node with a smaller neighbor w is re-emitted at w; a
    local-min node emits its own larger neighbors onto itself.)
    small-star (edges oriented big→small): with m = min of u's smaller
    neighbors, emit (s, m) for each smaller neighbor s ≠ m plus (u, m).

    Each phase is one groupBy(src) min + a same-key rejoin (the rejoin
    hashes on the key the aggregate just produced, so the exchange is
    reused) + a distinct; per alternation ~2 more exchanges than an LPA
    round, bought back exponentially in round count on deep graphs.

    Convergence: exact set equality between successive alternations —
    both phases keep the edge count nonincreasing (each output edge
    replaces one input edge; distinct only merges), so equal counts
    plus an empty one-way ``subtract`` proves set equality. The count
    comes from the same action as the checkpoint, and the subtract is
    one extra O(E) pass per alternation — the price of an EXACT
    fixpoint, matching the LPA path's exact-probe discipline. At the
    fixpoint every component is a star around its minimum, so the
    big→small edges ARE the (member, rep) map; roots and isolated
    (self-pair-only) nodes map to themselves."""
    # Checkpoint the mirrored input ONCE: `nodes` and `edges` both hang
    # off it, so the (potentially expensive) upstream pair generation —
    # an LSH banding join for the MinHash callers — runs a single time
    # instead of once per downstream action. All checkpoints in this
    # loop are LAZY (r13): the per-alternation count() is the action
    # that materializes them (running through the intermediate
    # large-star checkpoint in the same job), so each alternation costs
    # ONE scheduler barrier plus the subtract probe instead of three.
    both = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    nodes = both.select(F.col("src").alias("member_id")).distinct()
    edges = (
        both.where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_count = edges.count()  # materializes `both` and `edges`

    def _mirror_distinct(und: DataFrame) -> DataFrame:
        return (
            und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .union(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=False)
        )

    for _ in range(max_iters):
        prev_edges = edges
        # large-star: m(u) = min(Γ(u) ∪ {u}); emit (v, m) for v > u
        m = edges.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        large = (
            edges.join(m, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("a"), F.col("m").alias("b"))
        )
        mid = _mirror_distinct(large)
        # small-star: orient big→small; connect smaller side and u to m
        oriented = mid.where(F.col("src") > F.col("dst"))
        m2 = oriented.groupBy("src").agg(F.min("dst").alias("m"))
        small = (
            oriented.join(m2, "src")
            .where(F.col("dst") != F.col("m"))
            .select(F.col("dst").alias("a"), F.col("m").alias("b"))
            .unionByName(
                m2.select(F.col("src").alias("a"), F.col("m").alias("b"))
            )
        )
        edges = _mirror_distinct(small)
        cur_count = edges.count()  # materializes `mid` and `edges`
        done = cur_count == prev_count and not edges.subtract(prev_edges).take(1)
        # both of this round's consumed checkpoints are safe to free here:
        # the count() above materialized the small-star checkpoint (and
        # `mid` on the way through), so `mid` has no remaining reader,
        # and the fixpoint check above was prev_edges' last use (on
        # convergence the surviving answer is `edges`, a separate
        # checkpoint with identical content)
        free_local_checkpoint(mid)
        free_local_checkpoint(prev_edges)
        if done:
            converged = True
            break
        prev_count = cur_count
    else:
        converged = False

    if not converged:
        # The star extraction below is only valid AT the fixpoint; a
        # capped, unconverged edge set would yield duplicate member_id
        # rows with conflicting reps (silently multiplying downstream
        # joins). Unlike the LPA path — whose stale labels are still one
        # row per node — there is no honest partial answer here, so fail
        # loudly. O(log² n) worst-case alternations means max_iters=20
        # covers any realistic graph; hitting this means raise it.
        raise RuntimeError(
            f"two_phase connected components did not converge within "
            f"max_iters={max_iters} alternations; raise max_iters"
        )

    # fixpoint is a star per component: big→small edges are member→root;
    # everything else (roots, isolated self-pair nodes) maps to itself
    members = edges.where(F.col("src") > F.col("dst")).select(
        F.col("src").alias("member_id"), F.col("dst").alias("cluster_rep")
    )
    selfmapped = nodes.join(
        members.select("member_id"), "member_id", "left_anti"
    ).select("member_id", F.col("member_id").alias("cluster_rep"))
    return members.unionByName(selfmapped)


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (round(cosine,6) >= threshold),
    EXACT all-pairs via blocked BLAS: rows hash into ``n_blocks`` buckets,
    each row is replicated to the block-pairs it participates in, and one
    Arrow-batched applyInPandas task per block-pair computes the whole
    sub-matrix as a single numpy matmul.

    Replaces the expression-per-pair cross join (3 HOF aggregates × n²
    pairs of interpreted lambda — 58 s at sf0.1): the Python cost here is
    per block-pair, not per pair (~20× faster at sf0.1).

    Scale: still O(n²) work — that is what "exact all-pairs" means — but
    the shape distributes: n·B rows shuffle (B ≈ replication factor),
    B(B+1)/2 independent matmul tasks, no task ever holds more than two
    blocks. Raise n_blocks so blocks fit executor memory; for 100 TB feed
    candidates from random-hyperplane LSH (operators/similarity.lsh_ann)
    first and use this as the exact verifier on candidates only."""
    import numpy as np
    import pandas as pd

    id_type = emb.schema[id_col].dataType.simpleString()
    rows = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_b"),
    )
    # Row in bucket p joins block-pairs (i, p) for i<=p and (p, j) for j>=p;
    # array_distinct collapses the (p, p) duplicate → exactly B keys/row.
    keys = F.array_distinct(
        F.concat(
            F.transform(
                F.sequence(F.lit(0), F.col("_b")),
                lambda i: F.struct(i.alias("ki"), F.col("_b").alias("kj")),
            ),
            F.transform(
                F.sequence(F.col("_b"), F.lit(n_blocks - 1)),
                lambda j: F.struct(F.col("_b").alias("ki"), j.alias("kj")),
            ),
        )
    )
    replicated = rows.select(
        "_id", "_v", "_b", F.explode(keys).alias("_k")
    ).select("_id", "_v", "_b", F.col("_k.ki").alias("_ki"), F.col("_k.kj").alias("_kj"))

    out_schema = f"id_a {id_type}, id_b {id_type}, cosine double"

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ki, kj = int(pdf["_ki"].iloc[0]), int(pdf["_kj"].iloc[0])
        left = pdf[pdf["_b"] == ki]
        right = pdf[pdf["_b"] == kj]
        if left.empty or right.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})

        def norm_mat(part: pd.DataFrame) -> np.ndarray:
            m = np.stack(part["_v"].to_numpy()).astype(np.float64)
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0.0] = np.nan  # zero vectors: NaN cosine, never passes
            return m / n

        sims = np.round(norm_mat(left) @ norm_mat(right).T, 6)
        if ki == kj:
            xi, yi = np.triu_indices(len(left), k=1)
        else:
            xi, yi = np.nonzero(np.ones((len(left), len(right)), dtype=bool))
        c = sims[xi, yi]
        mask = c >= threshold
        ida = left["_id"].to_numpy()[xi[mask]]
        idb = right["_id"].to_numpy()[yi[mask]]
        lo, hi = np.minimum(ida, idb), np.maximum(ida, idb)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": c[mask]})

    return replicated.groupBy("_ki", "_kj").applyInPandas(block_pairs, out_schema)


def prefix_filter_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pair generation by PREFIX FILTERING (PPJoin family,
    Xiao et al. 2008): an EXACT set-similarity join reduction, the
    deterministic counterpart to MinHash LSH (which trades recall for
    speed probabilistically — prefix filtering guarantees recall 1.0).

    Order each document's shingles by ascending global document frequency
    (rarest first, ties by shingle text); with Jaccard threshold t, two
    sets can only reach t if they share at least one shingle among each
    set's first |S| - ceil(t*|S|) + 1 shingles. Candidates are therefore
    the equi-join of PREFIXES only — the frequent shingles that would
    explode a naive inverted-index join sit at the ranking's tail and
    never join.

    Scale: the frequency table is a map-side-combined count; ranking is
    one window per document over its own shingles; the candidate join
    keys on an 8-byte shingle hash — never the shingle TEXT (same
    discipline as duplicated_spans' inverted index: the wide shuffles
    carry fixed-width longs, not ~20-byte strings). r13: the shingle
    arrays themselves are hash sets (token_shingle_hashes) so the gram
    strings are never built; ties in the frequency ranking break by
    shingle HASH (any engine-deterministic total order works — the
    prefix bound only needs SOME consistent ordering). A 64-bit
    collision between two docs' shingles can only ADD candidate pairs
    (verify removes them); a within-doc collision shrinks that doc's
    set size, the same ~2⁻⁶⁴ class the verify stage itself computes
    under. Both join sides are pruned to ~(1-t)|S| entries per
    document; no all-pairs product anywhere."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        token_shingle_hashes(F.col(text_col), shingle_n).alias("shingles"),
    ).where(F.size("shingles") > 0)
    ex = sh.select(
        "id", F.size("shingles").alias("n"), F.explode("shingles").alias("sh")
    )
    freq = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("id").orderBy("df", "sh")
    prefix = (
        ex.join(freq, "sh")
        .withColumn("rk", F.row_number().over(w))
        .where(
            F.col("rk")
            <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
        )
        .select("id", "sh", "n", "rk")
    )
    a = prefix.select(
        F.col("id").alias("id_a"), "sh",
        F.col("n").alias("n_a"), F.col("rk").alias("rk_a"),
    )
    b = prefix.select(
        F.col("id").alias("id_b"), "sh",
        F.col("n").alias("n_b"), F.col("rk").alias("rk_b"),
    )
    t = F.lit(threshold)
    # PPJoin residual filters, both LOSSLESS at the threshold:
    #  - length: J(A,B) >= t forces t*max(|A|,|B|) <= min(|A|,|B|)
    #  - positional: shared prefix token at ranks (rk_a, rk_b) bounds the
    #    best-possible overlap by 1 + min(|A|-rk_a, |B|-rk_b), which must
    #    reach alpha = ceil(t/(1+t) * (|A|+|B|)) for J >= t
    alpha = F.ceil(t / (F.lit(1.0) + t) * (F.col("n_a") + F.col("n_b")))
    ubound = F.lit(1) + F.least(
        F.col("n_a") - F.col("rk_a"), F.col("n_b") - F.col("rk_b")
    )
    return (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            t * F.greatest(F.col("n_a"), F.col("n_b"))
            <= F.least(F.col("n_a"), F.col("n_b"))
        )
        .where(ubound >= alpha)
        .select("id_a", "id_b")
        .distinct()
    )
