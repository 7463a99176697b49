"""Similarity search over embedding columns (array<float>).

Three tiers (SURVEY.md §7 M5):
1. brute_force_topk — exact cosine top-k via cross join + window. The
   correctness baseline; O(|Q|·|C|) but fully distributed (queries
   broadcast, corpus partition-parallel).
2. lsh_ann_topk — random-hyperplane LSH bucketing: sign-bit signatures
   with deterministic seeded hyperplanes, candidates only within matching
   buckets (multi-probe over ``n_tables`` independent tables), exact
   re-rank on candidates. The 100 TB path: shuffle keys are bucket ids,
   never the full cross product.
3. ivf_topk — IVF-Flat: spherical-k-means coarse quantizer (trained
   driver-side on a sample), vectors shuffled only by cell id, queries
   probe n_probe cells, exact re-rank on cell candidates. The second
   100 TB path; n_probe trades recall for cost and degrades gracefully
   to brute force at n_probe = n_cells.
4. brute_force_topk_pandas — same semantics as (1) but the dot products run
   as one BLAS matmul per Arrow batch in a Pandas UDF; wins for wide
   vectors / large k where per-element expression folding is slow.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pucminas_data_pipelines_spark.functions.vector import (
    cosine_from_norms,
    norm,
    normalize,
)

# Norm clamp for every numpy unit-normalization: an all-zero embedding
# would otherwise produce NaN rows/codes/scores that silently poison a
# whole Arrow batch. The exact-KNN expression path maps zero vectors to
# NULL cosine (functions/vector.py cosine_similarity nullif); clamping
# to eps gives the numpy paths the same "scores ~0, never NaN" outcome.
_NORM_EPS = 1e-12


def _unit(mat: np.ndarray) -> np.ndarray:
    """Row-normalize, zero-vector-safe (2-D matrix or 1-D vector)."""
    if mat.ndim == 1:
        return mat / max(float(np.linalg.norm(mat)), _NORM_EPS)
    return mat / np.maximum(
        np.linalg.norm(mat, axis=1, keepdims=True), _NORM_EPS
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Ranking is by (rounded cosine desc, neighbor id) so results are fully
    deterministic. Queries are broadcast: the corpus never shuffles."""
    # per-SIDE norms hoisted out of the pair fan-out (each corpus row
    # meets every query): the q-side norm is evaluated once per query at
    # broadcast build, the c-side once per corpus row in its scan
    # projection — per-pair work drops to the dot fold alone, and
    # cosine_from_norms keeps the arithmetic bit-identical
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("_qn", norm(F.col("q_vec")))
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("_cn", norm(F.col("c_vec")))
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn(
            "cosine",
            F.round(
                cosine_from_norms(
                    F.col("q_vec"), F.col("c_vec"), F.col("_qn"), F.col("_cn")
                ),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id (long) of a vector against fixed hyperplanes —
    pure expressions: dot via zip_with fold, bits assembled with shiftleft."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lits = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(vec_col, lits, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.shiftleft(F.when(d >= 0, 1).otherwise(0).cast("long"), i)
    return bucket


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing an LSH bucket
    with the query in ANY of n_tables independent hyperplane tables, then
    exact cosine re-rank. Recall grows with n_tables; bucket (candidate)
    size shrinks with n_planes — tune to the corpus: for weakly-clustered
    vectors (neighbor cosine ~0.4, like random embeddings) 4 planes × 8
    tables gives ~0.75 expected top-k recall at ~16x fewer comparisons than
    brute force per table; sharper clusters tolerate more planes."""
    # All tables' hyperplanes as one (n_tables*n_planes, dim) matrix: the
    # 32 sign bits per vector are ONE Arrow-batched matmul, not 4k
    # interpreted HOF ops/row (same seeds/planes as the per-table
    # lsh_bucket expression form, kept for single-plane uses).
    plane_mat = np.concatenate(
        [
            np.asarray(_hyperplanes(n_planes, dim, seed + 1000 * t))
            for t in range(n_tables)
        ]
    ).T  # dim x (n_tables*n_planes)
    shifts = np.tile(1 << np.arange(n_planes), n_tables)  # bit weight per col

    @pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        bits = (m @ plane_mat) >= 0  # batch x (n_tables*n_planes)
        weighted = (bits * shifts).reshape(len(m), n_tables, n_planes)
        return pd.Series(list(weighted.sum(axis=2).astype(np.int64)))

    def tagged(
        df: DataFrame, id_alias: str, vec_alias: str, norm_alias: str
    ) -> DataFrame:
        # the side norm is computed ONCE per vector here, before the
        # ×n_tables posexplode and the bucket join fan-out (8 bytes per
        # row through the shuffle vs a full HOF re-fold per candidate)
        return (
            df.select(
                F.col(id_alias), F.col(vec_alias), buckets(F.col(vec_alias)).alias("_bk")
            )
            .withColumn(norm_alias, norm(F.col(vec_alias)))
            .select(
                id_alias,
                vec_alias,
                norm_alias,
                F.posexplode("_bk").alias("table", "bucket"),
            )
        )

    q = tagged(
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "query_id",
        "q_vec",
        "_qn",
    )
    c = tagged(
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        ),
        "neighbor_id",
        "c_vec",
        "_cn",
    )

    cands = (
        q.join(c, ["table", "bucket"])
        .select("query_id", "q_vec", "_qn", "neighbor_id", "c_vec", "_cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if exclude_self:
        cands = cands.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn(
            "cosine",
            F.round(
                cosine_from_norms(
                    F.col("q_vec"), F.col("c_vec"), F.col("_qn"), F.col("_cn")
                ),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


_HASH_MOD = 1 << 20


def ivf_sample_plan(
    corpus: DataFrame, vec_col: str, sample_size: int
) -> DataFrame:
    """Deterministic training-sample plan for the IVF quantizer: a
    hash-threshold FILTER (xxhash64 of the vector modulo 2^20 below a
    cutoff), never a sort — a global orderBy().limit() at 100 TB is a
    total sort of every embedding just to keep ~2k rows. The cutoff is
    sized from a corpus count (parquet: metadata-only) with a 1.5x margin
    so the filter yields >= sample_size rows with overwhelming
    probability; the driver-side truncation in train_ivf_centroids
    restores the exact size. Hash membership is a property of the vector
    value, so the sample set is stable across partitionings."""
    n = corpus.count()
    frac = min(1.0, 1.5 * sample_size / max(n, 1))
    cutoff = max(1, int(frac * _HASH_MOD))
    return corpus.select(
        F.col(vec_col).alias("_v"),
        F.pmod(F.xxhash64(F.col(vec_col)), F.lit(_HASH_MOD)).alias("_h"),
    ).where(F.col("_h") < cutoff)


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_cells: int = 16,
    sample_size: int = 2048,
    iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Spherical k-means coarse quantizer for IVF, trained driver-side on a
    deterministic hash-threshold sample (see ivf_sample_plan — a filter,
    not a sort). Centroids are unit-normalized so dot product = cosine.
    The centroid matrix is tiny (n_cells × dim) and is closed over /
    broadcast into the assignment UDF — the standard IVF split: train
    small, assign at scale."""
    sample = ivf_sample_plan(corpus, vec_col, sample_size).collect()
    # collect order follows partition order — sort driver-side (a few k
    # rows) so centroids are identical across partitionings
    sample.sort(key=lambda r: (r["_h"], tuple(r["_v"])))
    sample = sample[:sample_size]
    x = np.array([r["_v"] for r in sample], dtype=np.float64)
    x = _unit(x)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _unit(cent)
    return cent


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    sample_size: int = 2048,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via IVF-Flat: corpus vectors live in their nearest
    centroid cell; each query probes its n_probe nearest cells; candidates
    are the union of probed cells, exactly re-ranked by cosine.

    The second 100 TB ANN path next to lsh_ann_topk: the only shuffle keys
    are cell ids (n_cells of them — size cells so |corpus|/n_cells fits a
    partition; skewed cells are split by AQE), assignment is one BLAS
    matmul per Arrow batch, and recall/cost trades off with n_probe
    (n_probe = n_cells degrades gracefully to brute force)."""
    cent = train_ivf_centroids(corpus, vec_col, n_cells, sample_size, seed=seed)

    def probe_udf(n: int):
        @pandas_udf("array<int>")
        def probes(vecs: pd.Series) -> pd.Series:
            m = np.stack(vecs.to_numpy()).astype(np.float64)
            m = _unit(m)
            sims = m @ cent.T
            top = np.argsort(-sims, axis=1)[:, :n]
            return pd.Series(list(top.astype(np.int32)))

        return probes

    # side norms computed pre-join (once per vector, not per candidate)
    c = (
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )
        .withColumn("_cn", norm(F.col("c_vec")))
        .withColumn("cell", F.explode(probe_udf(1)(F.col("c_vec"))))
    )
    q = (
        queries.select(
            F.col(query_id).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        .withColumn("_qn", norm(F.col("q_vec")))
        .withColumn("cell", F.explode(probe_udf(n_probe)(F.col("q_vec"))))
    )

    cands = q.join(c, "cell").select(
        "query_id", "q_vec", "_qn", "neighbor_id", "c_vec", "_cn"
    )
    if exclude_self:
        cands = cands.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn(
            "cosine",
            F.round(
                cosine_from_norms(
                    F.col("q_vec"), F.col("c_vec"), F.col("_qn"), F.col("_cn")
                ),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def brute_force_topk_pandas(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 5,
    exclude_self: bool = True,
    max_queries: int = 10_000,
) -> DataFrame:
    """Same contract as brute_force_topk, but cosine against ALL queries is
    one numpy matmul per corpus row batch (Arrow-vectorized pandas_udf).
    The Python cost is per-batch, not per-pair — the fast path for wide
    vectors.

    The query side is collected to the driver and closed over into the UDF
    (it must be small by contract); ``max_queries`` makes a misuse with a
    large query side fail loudly instead of OOMing the driver — the
    limit(max_queries + 1) bounds the collect itself."""
    q_rows = queries.select(query_id, vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"brute_force_topk_pandas collects the query side to the driver; "
            f"got > {max_queries} query rows — use brute_force_topk (broadcast "
            f"join) or an ANN operator for large query sets"
        )
    q_ids = [r[0] for r in q_rows]
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_mat = _unit(q_mat)
    bq_ids = np.array(q_ids)

    @pandas_udf("array<double>")
    def sims(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # batch_rows x dim
        m = _unit(m)
        return pd.Series(list(m @ q_mat.T))

    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("_sims", sims(F.col("c_vec")))
    # explode per-query similarity, then grouped top-k
    exploded = c.select(
        "neighbor_id",
        F.posexplode("_sims").alias("q_idx", "cosine_raw"),
    ).withColumn(
        "query_id",
        F.element_at(F.array(*[F.lit(int(i)) for i in bq_ids]), F.col("q_idx") + 1),
    )
    if exclude_self:
        exploded = exploded.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        exploded.withColumn("cosine", F.round(F.col("cosine_raw"), 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def semantic_dup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    n_cells: int = 16,
    n_assign: int = 3,
    sample_size: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: every vector is
    assigned to its ``n_assign`` nearest IVF cells (multi-assignment buys
    recall across cell boundaries — measured 1.0 at 16 cells × 4 assigns
    at sf0.01, 0.966 at sf0.1, vs 0.34 at 1 assign), candidate pairs form only
    WITHIN a cell, and each candidate is verified by exact cosine at
    ``threshold``. Returns (id_a, id_b, cosine), id_a < id_b, distinct.
    Precision is 1.0 by construction (exact verify); recall is the
    quantity the registered dedup_semantic_recall query bounds.

    Scale shape: the only shuffle key is the cell id; a cell holds
    ~|corpus| * n_assign / n_cells vectors, so n_cells is the knob that
    keeps the within-cell quadratic verify bounded (size cells to
    ~10k-100k vectors at 100 TB; AQE splits stragglers). Centroids are
    trained driver-side on a deterministic hash-threshold sample and
    closed over into one Arrow-batched assignment UDF — identical to the
    ivf_topk quantizer, so index build cost is shared in a real pipeline."""
    cent = train_ivf_centroids(corpus, vec_col, n_cells, sample_size, seed=seed)

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = _unit(m)
        sims = m @ cent.T
        top = np.argsort(-sims, axis=1)[:, :n_assign]
        return pd.Series(list(top.astype(np.int32)))

    tagged = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("cell", F.explode(assign(F.col("_v"))))

    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cosine double"

    # Exact verify as ONE matmul per cell (not an expression per pair):
    # a cell of c rows costs one c×c BLAS product — the per-pair HOF
    # cosine it replaces was ~30 s at sf0.1 for the same result.
    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0.0] = np.nan
        m = m / n
        sims = np.round(m @ m.T, 6)
        xi, yi = np.triu_indices(len(pdf), k=1)
        c = sims[xi, yi]
        mask = c >= threshold
        ids = pdf[id_col].to_numpy()
        ida, idb = ids[xi[mask]], ids[yi[mask]]
        lo, hi = np.minimum(ida, idb), np.maximum(ida, idb)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": c[mask]})

    return (
        tagged.groupBy("cell")
        .applyInPandas(cell_pairs, out_schema)
        .dropDuplicates(["id_a", "id_b"])
    )


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str,
    m: int = 8,
    k_sub: int = 16,
    sample_size: int = 2048,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Product-quantization codebooks, shape (m, k_sub, dim/m): per-subspace
    k-means (L2) trained driver-side on the deterministic hash-threshold
    sample (ivf_sample_plan — a filter, never a global sort), over
    UNIT-NORMALIZED vectors so summed sub-space inner products against the
    codebooks reconstruct cosine (asymmetric distance computation).

    The codebook tensor is tiny (m * k_sub * dim/m = dim * k_sub floats)
    and is closed over / broadcast into the encode and ADC UDFs — train
    small, encode at scale, exactly like the IVF coarse quantizer."""
    sample = ivf_sample_plan(corpus, vec_col, sample_size).collect()
    sample.sort(key=lambda r: (r["_h"], tuple(r["_v"])))
    sample = sample[:sample_size]
    x = np.array([r["_v"] for r in sample], dtype=np.float64)
    x = _unit(x)
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, k_sub, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        cent = xs[rng.choice(len(xs), size=min(k_sub, len(xs)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j, : len(cent)] = cent
        if len(cent) < k_sub:  # degenerate tiny-sample guard
            books[j, len(cent):] = cent[0]
    return books


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_sub: int = 16,
    refine: int = 4,
    sample_size: int = 2048,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-PQ approximate top-k — the memory-scale ANN path (FAISS
    IndexIVFPQ + refine shape): corpus vectors are stored as m small-int
    codes (m bytes vs dim*4 — 32x compression at dim=64/m=8), candidates
    come from the query's n_probe nearest IVF cells, candidates are ranked
    by asymmetric distance (per-query lookup table against the PQ
    codebooks — the raw corpus vector is never read), and only the top
    k*refine survivors are re-ranked exactly by joining the original
    vectors back BY ID.

    100 TB design: the candidate stream carries (cell, id, codes) — codes
    being 32x smaller than vectors is the difference between an index that
    fits executor memory and one that doesn't. Shuffle keys are cell ids
    (skew split by AQE) plus a per-query applyInPandas regroup whose state
    is one cell-candidate list per query; the ADC lookup table is computed
    ONCE per query (not per pair) inside the grouped kernel. The final
    exact refine join touches k*refine rows per query — narrow by
    construction. Returns (query_id, neighbor_id, cosine, rank).
    """
    cent = train_ivf_centroids(corpus, vec_col, n_cells, sample_size, seed=seed)
    books = train_pq_codebooks(corpus, vec_col, m, k_sub, sample_size, seed=seed)
    dsub = books.shape[2]

    @pandas_udf("cell int, codes array<int>")
    def encode(vecs: pd.Series) -> pd.DataFrame:
        v = np.stack(vecs.to_numpy()).astype(np.float64)
        v = _unit(v)
        cells = (v @ cent.T).argmax(axis=1).astype(np.int32)
        codes = np.empty((len(v), m), dtype=np.int32)
        for j in range(m):
            xs = v[:, j * dsub : (j + 1) * dsub]
            d2 = (
                (xs**2).sum(axis=1)[:, None]
                - 2.0 * (xs @ books[j].T)
                + (books[j] ** 2).sum(axis=1)[None, :]
            )
            codes[:, j] = d2.argmin(axis=1)
        return pd.DataFrame({"cell": cells, "codes": list(codes)})

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat = _unit(mat)
        top = np.argsort(-(mat @ cent.T), axis=1)[:, :n_probe]
        return pd.Series(list(top.astype(np.int32)))

    c = (
        corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
        .withColumn("_enc", encode(F.col("_cv")))
        .select("neighbor_id", F.col("_enc.cell").alias("cell"),
                F.col("_enc.codes").alias("codes"))
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("cell", F.explode(probes(F.col("q_vec"))))

    cands = q.join(c, "cell").select("query_id", "q_vec", "neighbor_id", "codes")
    if exclude_self:
        cands = cands.where(F.col("query_id") != F.col("neighbor_id"))

    # query_id is typed from the QUERIES side, neighbor_id from the CORPUS
    # side — the API allows them to differ, and a mistyped Arrow schema
    # would fail or silently truncate at serialization time.
    q_id_type = queries.schema[query_id].dataType.simpleString()
    c_id_type = corpus.schema[corpus_id].dataType.simpleString()
    shortlist_schema = (
        f"query_id {q_id_type}, neighbor_id {c_id_type}, approx_ip double"
    )
    shortlist_n = k * max(refine, 1)

    # per-query ADC: ONE (m x k_sub) lookup table per query, gathered over
    # the candidate code matrix — never a per-pair table
    def adc_shortlist(pdf: pd.DataFrame) -> pd.DataFrame:
        qv = np.asarray(pdf["q_vec"].iloc[0], dtype=np.float64)
        qv = _unit(qv)
        lut = np.stack(
            [qv[j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)]
        )  # m x k_sub
        codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # n x m
        score = lut[np.arange(m)[None, :], codes].sum(axis=1)
        order = np.lexsort((pdf["neighbor_id"].to_numpy(), -score))[:shortlist_n]
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].to_numpy()[order],
                "neighbor_id": pdf["neighbor_id"].to_numpy()[order],
                "approx_ip": score[order],
            }
        )

    shortlist = cands.groupBy("query_id").applyInPandas(
        adc_shortlist, shortlist_schema
    )

    # exact refine: fetch the original vectors for the shortlist only
    # (side norms hoisted below the join — once per vector row, not per
    # shortlist pair; bit-identical via cosine_from_norms)
    qv = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("_qn", norm(F.col("q_vec")))
    cv = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("_cn", norm(F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        shortlist.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .withColumn(
            "cosine",
            F.round(
                cosine_from_norms(
                    F.col("q_vec"), F.col("c_vec"), F.col("_qn"), F.col("_cn")
                ),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
