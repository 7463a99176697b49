"""Similarity-search tests: BLAS path agrees with the expression path;
LSH ANN recall is bounded below vs exact top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.operators import similarity as S
from pucminas_data_pipelines_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _topk_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cosine"]))
    return out


def test_pandas_path_matches_expression_path(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    expr = _topk_map(S.brute_force_topk(q, emb, "vec_id", "vec_id", "embedding", k=5))
    blas = _topk_map(
        S.brute_force_topk_pandas(q, emb, "vec_id", "vec_id", "embedding", k=5)
    )
    assert expr.keys() == blas.keys()
    for qid in expr:
        e_ids = [n for n, _ in expr[qid]]
        b_ids = [n for n, _ in blas[qid]]
        assert e_ids == b_ids, f"query {qid}: {e_ids} vs {b_ids}"
        for (_, ce), (_, cb) in zip(expr[qid], blas[qid]):
            assert abs(ce - cb) < 1e-5


def test_lsh_ann_recall(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    exact = _topk_map(S.brute_force_topk(q, emb, "vec_id", "vec_id", "embedding", k=5))
    approx = _topk_map(
        S.lsh_ann_topk(
            q, emb, "vec_id", "vec_id", "embedding", k=5, n_planes=4, n_tables=8
        )
    )
    hits = total = 0
    for qid, exact_list in exact.items():
        exact_ids = {n for n, _ in exact_list}
        approx_ids = {n for n, _ in approx.get(qid, [])}
        hits += len(exact_ids & approx_ids)
        total += len(exact_ids)
    recall = hits / total
    assert recall >= 0.3, f"LSH recall {recall:.2f} too low"


def test_lsh_self_match(spark):
    """A vector's own bucket always contains it → querying with
    exclude_self=False must return the vector itself at rank 1."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    res = S.lsh_ann_topk(
        q, emb, "vec_id", "vec_id", "embedding", k=1, exclude_self=False
    )
    rows = {r["query_id"]: r["neighbor_id"] for r in res.collect()}
    assert rows == {i: i for i in range(5)}


def test_ivf_ann_recall(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    exact = _topk_map(S.brute_force_topk(q, emb, "vec_id", "vec_id", "embedding", k=5))
    approx = _topk_map(
        S.ivf_topk(q, emb, "vec_id", "vec_id", "embedding", k=5, n_cells=16, n_probe=4)
    )
    hits = total = 0
    for qid, exact_list in exact.items():
        exact_ids = {n for n, _ in exact_list}
        approx_ids = {n for n, _ in approx.get(qid, [])}
        hits += len(exact_ids & approx_ids)
        total += len(exact_ids)
    recall = hits / total
    assert recall >= 0.4, f"IVF recall {recall:.2f} too low"


def test_ivf_full_probe_is_exact(spark):
    # probing every cell must reproduce exact brute-force top-k
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    exact = _topk_map(S.brute_force_topk(q, emb, "vec_id", "vec_id", "embedding", k=5))
    full = _topk_map(
        S.ivf_topk(q, emb, "vec_id", "vec_id", "embedding", k=5, n_cells=8, n_probe=8)
    )
    assert exact == full


def test_ivf_sample_is_filter_not_sort(spark):
    """The IVF training sample must be a hash-threshold FILTER — a global
    orderBy().limit() would total-sort every embedding at 100 TB."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    plan = S.ivf_sample_plan(emb, "embedding", 64)._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan
    assert "xxhash64" in plan.lower() or "Filter" in plan


def test_ivf_sample_deterministic_across_partitionings(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = S.train_ivf_centroids(emb, "embedding", n_cells=4, sample_size=64)
    b = S.train_ivf_centroids(emb.repartition(13), "embedding", n_cells=4, sample_size=64)
    assert (a == b).all()


def test_brute_force_pandas_guards_large_query_side(spark):
    import pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    with pytest.raises(ValueError, match="query rows"):
        S.brute_force_topk_pandas(
            emb, emb, "vec_id", "vec_id", "embedding", k=5, max_queries=10
        )


def test_semantic_dup_pairs_recall_and_precision(spark):
    """semantic_dup_pairs at 16 cells x 3 assigns: precision exactly 1.0
    (every pair exact-verified) and recall pinned at the measured
    deterministic floor on the sf0.01 corpus."""
    from pucminas_data_pipelines_spark.operators.dedup import (
        embedding_neardup_pairs,
    )
    from pucminas_data_pipelines_spark.operators.similarity import (
        semantic_dup_pairs,
    )
    from pucminas_data_pipelines_spark.tables import load_table
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(
            emb, "vec_id", "embedding", threshold=0.4
        ).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.4, n_cells=16, n_assign=3
        ).collect()
    }
    assert approx <= exact  # precision 1.0: no false pairs survive verify
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, recall


def test_neardup_pairs_edge_cases(spark):
    """Blocked-BLAS all-pairs: tiny inputs (fewer rows than blocks), a
    planted exact duplicate, and a zero vector (NaN cosine → excluded)."""
    from pucminas_data_pipelines_spark.operators.dedup import (
        embedding_neardup_pairs,
    )

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),      # exact dup of 1
        (3, [0.0, 1.0, 0.0]),      # orthogonal
        (4, [0.0, 0.0, 0.0]),      # zero vector: must never pair
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(
            df, "vec_id", "embedding", threshold=0.9, n_blocks=8
        ).collect()
    }
    assert got == {(1, 2): 1.0}

    empty = spark.createDataFrame([], "vec_id int, embedding array<double>")
    assert (
        embedding_neardup_pairs(
            empty, "vec_id", "embedding", threshold=0.5
        ).count()
        == 0
    )


def test_ivf_pq_planted_copies_rank_first(spark):
    # exact copies of corpus vectors (shifted ids) must come back at
    # rank 1 with cosine 1.0: identical vectors share cell + codes, so the
    # copy survives the ADC shortlist and the exact refine pins it at top
    emb = load_table(spark, SF_SMOKE, "embeddings")
    copies = emb.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.union(copies)
    q = corpus.where(F.col("vec_id") >= 10_000)
    top = S.ivf_pq_topk(
        q, corpus, "vec_id", "vec_id", "embedding",
        k=3, n_cells=8, n_probe=2, m=8, k_sub=16, refine=4,
    )
    first = {r["query_id"]: (r["neighbor_id"], r["cosine"]) for r in top.collect() if r["rank"] == 1}
    assert first == {i + 10_000: (i, 1.0) for i in range(5)}


def test_pq_codebooks_shape_and_determinism(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    b1 = S.train_pq_codebooks(emb, "embedding", m=8, k_sub=16, sample_size=256)
    b2 = S.train_pq_codebooks(emb, "embedding", m=8, k_sub=16, sample_size=256)
    assert b1.shape == (8, 16, 8)
    assert (b1 == b2).all()  # hash-threshold sample + fixed seed => stable


def test_cosine_nan_component_never_tops_ranking(spark):
    """A NaN component in a corpus vector must yield a NULL cosine (not
    NaN): Spark sorts NaN above every number, so before the guard the
    corrupt row ranked FIRST for every query in each desc top-k."""
    from pucminas_data_pipelines_spark.functions.vector import (
        cosine_similarity,
        normalize,
    )
    from pucminas_data_pipelines_spark.operators.similarity import (
        brute_force_topk,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [float("nan"), 1.0]),
            (3, [0.9, 0.1]),
            (4, [0.0, 0.0]),  # zero vector: NULL cosine, also excluded
        ],
        "vid bigint, v array<double>",
    )
    queries = spark.createDataFrame([(100, [1.0, 0.0])], "vid bigint, v array<double>")
    got = brute_force_topk(queries, corpus, "vid", "vid", "v", k=2).collect()
    assert [r["neighbor_id"] for r in got] == [1, 3]
    assert all(r["cosine"] is not None for r in got)

    # direct function contract: NaN component and zero vector -> NULL
    from pyspark.sql import functions as F

    row = (
        spark.createDataFrame(
            [([1.0, 0.0], [float("nan"), 1.0], [0.0, 0.0])],
            "a array<double>, b array<double>, z array<double>",
        )
        .select(
            cosine_similarity(F.col("a"), F.col("b")).alias("c_nan"),
            cosine_similarity(F.col("a"), F.col("z")).alias("c_zero"),
            normalize(F.col("z")).alias("n_zero"),
            normalize(F.col("b")).alias("n_nan"),
            normalize(F.col("a")).alias("n_ok"),
        )
        .first()
    )
    assert row["c_nan"] is None
    assert row["c_zero"] is None
    assert row["n_zero"] is None
    assert row["n_nan"] is None
    assert row["n_ok"] == [1.0, 0.0]
