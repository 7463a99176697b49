"""Semantics tests for the probabilistic dedup operators (planted
duplicates — the differential oracle can't cover these)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.operators import dedup as D
from pucminas_data_pipelines_spark.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def planted(spark):
    """50 base docs + exact copies of 5 + near-copies (one token changed)
    of 5 more."""
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .where(F.col("doc_id") < 50)
        .select("doc_id", "text")
    )
    exact = (
        docs.where(F.col("doc_id") < 5)
        .select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    )
    near = (
        docs.where(F.col("doc_id").between(5, 9))
        .select(
            (F.col("doc_id") + 2000).alias("doc_id"),
            F.concat(F.lit("zzz "), F.expr("substring(text, 5)")).alias("text"),
        )
    )
    return docs.union(exact).union(near)


def test_exact_duplicates(spark, planted):
    groups = D.exact_duplicates(planted, "doc_id", "text", normalized=False)
    dups = {
        r["representative_id"]: r["n_copies"]
        for r in groups.where(F.col("n_copies") > 1).collect()
    }
    assert dups == {i: 2 for i in range(5)}


def test_minhash_lsh_finds_planted_pairs(spark, planted):
    pairs = D.minhash_lsh_pairs(
        planted, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
    )
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # exact copies must be found with est_jaccard ~1
    for i in range(5):
        assert (i, i + 1000) in found, f"exact pair {i} missed"
    # near-copies (one leading token changed) should be found too
    near_hits = sum((i, i + 2000) in found for i in range(5, 10))
    assert near_hits >= 4, f"only {near_hits}/5 near pairs found"


def test_minhash_estimate_close_to_true_jaccard(spark, planted):
    pairs = D.minhash_lsh_pairs(
        planted, "doc_id", "text", num_hashes=64, bands=16, threshold=0.2
    )
    verified = D.ngram_jaccard_pairs(pairs, planted, "doc_id", "text", threshold=0.0)
    joined = pairs.join(verified, ["id_a", "id_b"]).select("est_jaccard", "jaccard")
    for r in joined.collect():
        assert abs(r["est_jaccard"] - r["jaccard"]) < 0.35  # 64 hashes → coarse


def test_simhash_near_zero_hamming_for_copies(spark, planted):
    sh = D.simhash(planted, "doc_id", "text")
    by_id = {r["doc_id"]: r["simhash"] for r in sh.collect()}
    for i in range(5):
        assert by_id[i] == by_id[i + 1000]  # identical text → identical simhash
    pairs = D.simhash_neardup_pairs(planted, "doc_id", "text", max_hamming=3)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(5):
        assert (i, i + 1000) in found


def test_embedding_neardup_self_similarity(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").where(F.col("vec_id") < 30)
    dup = emb.select((F.col("vec_id") + 500).alias("vec_id"), "embedding", "label")
    both = emb.union(dup)
    pairs = D.embedding_neardup_pairs(both, "vec_id", "embedding", threshold=0.999)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(i, i + 500) for i in range(30)} <= found


def test_dedup_clusters_chain_and_star(spark):
    # chain 1-2-3-4 (one cluster, rep 1), star 10-(11,12) (rep 10),
    # isolated pair 20-21 (rep 20)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21)],
        "id_a bigint, id_b bigint",
    )
    got = {
        r["member_id"]: r["cluster_rep"]
        for r in D.dedup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_clusters_round_plan(spark):
    # One propagation round must be exactly one edge join feeding a
    # union + min aggregation — the old shape carried a second join
    # (labels left-joined back for the convergence probe), a third
    # exchange per round that the label-sum probe makes unnecessary.
    edges = spark.createDataFrame(
        [(1, 2), (2, 1)], "src bigint, dst bigint"
    ).localCheckpoint()
    labels = spark.createDataFrame(
        [(1, 1), (2, 2)], "id bigint, label bigint"
    ).localCheckpoint()
    plan = (
        D._propagation_round(edges, labels)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") == 1, plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan, plan


def test_dedup_clusters_rejects_string_ids(spark):
    """The monotone-sum convergence probe needs exact-summable labels —
    string ids would cast to NULL and fake instant convergence, fractional
    floats round under the decimal(38,0) cast (false fixpoint), and a
    mixed numeric/string pair coerces labels to string through the union.
    The operator must refuse all three loudly, checking BOTH id columns."""
    import pytest as _pytest

    pairs = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    with _pytest.raises(TypeError, match="integral/decimal"):
        D.dedup_clusters(pairs)
    mixed = spark.createDataFrame([(1, "b")], "id_a bigint, id_b string")
    with _pytest.raises(TypeError, match="'id_b'"):
        D.dedup_clusters(mixed)
    floats = spark.createDataFrame([(1.5, 2.5)], "id_a double, id_b double")
    with _pytest.raises(TypeError, match="integral/decimal"):
        D.dedup_clusters(floats)


def test_dedup_clusters_converges_on_long_chain(spark):
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a bigint, id_b bigint"
    )
    got = D.dedup_clusters(pairs, max_iters=n + 2).collect()
    assert all(r["cluster_rep"] == 0 for r in got)
    assert len(got) == n + 1


def test_duplicated_spans_planted(spark):
    # docs 1,2 share an 10-token sentence in the middle at different
    # offsets; doc 3 is unrelated — exactly one maximal span per sharer,
    # none for doc 3. Normalization strips punctuation before gramming.
    shared = "the quick brown fox jumps over the lazy sleeping dog"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta epsilon"),
            (2, f"one two three four {shared}, zeta!"),
            (3, "completely different content with no overlap at all "
                "whatsoever in any of these particular filler tokens"),
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: (r["span_start"], r["span_len_tokens"], r["n_dup_grams"])
        for r in D.duplicated_spans(docs, "doc_id", "text", span_tokens=8).collect()
    }
    # 10 shared tokens -> 3 duplicated 8-grams, merged into one span of 10
    assert rows == {1: (2, 10, 3), 2: (4, 10, 3)}


def test_duplicated_spans_short_docs_no_partial_grams(spark):
    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id bigint, text string"
    )
    assert D.duplicated_spans(docs, "doc_id", "text", span_tokens=8).count() == 0


def test_redact_duplicated_spans_planted(spark):
    """Two docs share a verbatim 8-token run; redaction must cut exactly
    that run from both, keep unique text, and keep untouched docs whole."""
    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"{shared} epsilon zeta eta theta"),
            (3, "totally unique text with no duplicated runs here"),
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: (r.n_tokens_kept, r.n_tokens_dropped, r.redacted_text)
        for r in D.redact_duplicated_spans(
            docs, "doc_id", "text", span_tokens=8
        ).collect()
    }
    assert got[1] == (4, 8, "alpha beta gamma delta")
    assert got[2] == (4, 8, "epsilon zeta eta theta")
    assert got[3][1] == 0 and got[3][0] == 8


def test_two_phase_cc_matches_lpa_on_random_graphs(spark):
    """algorithm='two_phase' (alternating large-star/small-star) must
    produce the identical (member_id, cluster_rep) map as the LPA path
    on arbitrary pair sets — same contract, different round complexity."""
    import random

    rnd = random.Random(8)
    for trial in range(4):
        n = rnd.randint(2, 40)
        pairs = [
            (rnd.randint(0, n), rnd.randint(0, n))
            for _ in range(rnd.randint(1, 60))
        ]
        df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
        lpa = {
            r["member_id"]: r["cluster_rep"]
            for r in D.dedup_clusters(df, max_iters=n + 2).collect()
        }
        two = {
            r["member_id"]: r["cluster_rep"]
            for r in D.dedup_clusters(
                df, max_iters=n + 2, algorithm="two_phase"
            ).collect()
        }
        assert two == lpa, (trial, pairs)


def test_two_phase_cc_converges_on_deep_chain_in_log_rounds(spark):
    """The point of two_phase: a 200-node path graph needs ~200 LPA
    rounds but O(log n) alternations — with max_iters=10 the two-phase
    result must be fully collapsed (every node → 0) while LPA capped at
    the same budget demonstrably is not."""
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a bigint, id_b bigint"
    )
    two = D.dedup_clusters(pairs, max_iters=10, algorithm="two_phase").collect()
    assert len(two) == n + 1
    assert all(r["cluster_rep"] == 0 for r in two)
    lpa = D.dedup_clusters(pairs, max_iters=10).collect()
    assert any(r["cluster_rep"] != 0 for r in lpa)  # the contrast LPA can't


def test_two_phase_cc_releases_consumed_checkpoints(spark):
    """Each two_phase alternation localCheckpoints two edge frames; the
    consumed ones (previous round's edges, the large-star intermediate)
    must be unpersisted as soon as the round's fixpoint check passes —
    on a deep chain (many alternations) leaving them to the
    ContextCleaner pins O(rounds) storage blocks for the whole run.
    Bound: after collecting the result, at most the mirrored input, the
    final edge set, and the current suite's unrelated leftovers remain."""
    sc = spark.sparkContext._jsc.sc()
    before = sc.getPersistentRDDs().size()
    n = 200  # path graph -> ~8 alternations -> ~16 checkpoints created
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a bigint, id_b bigint"
    )
    D.dedup_clusters(pairs, max_iters=10, algorithm="two_phase").collect()
    leaked = sc.getPersistentRDDs().size() - before
    assert leaked <= 3, (
        f"{leaked} checkpoint RDDs still persisted after a two_phase run "
        "(expected <=3: mirrored input, initial edges head, final edges)"
    )


def test_two_phase_cc_self_pairs_and_gate(spark):
    """Self-pairs map to themselves (parity with the LPA path), and the
    integral/decimal id gate applies regardless of algorithm."""
    import pytest as _pytest

    df = spark.createDataFrame([(7, 7), (1, 2)], "id_a bigint, id_b bigint")
    got = {
        r["member_id"]: r["cluster_rep"]
        for r in D.dedup_clusters(df, algorithm="two_phase").collect()
    }
    assert got == {7: 7, 1: 1, 2: 1}
    floats = spark.createDataFrame([(1.5, 2.5)], "id_a double, id_b double")
    with _pytest.raises(TypeError, match="integral/decimal"):
        D.dedup_clusters(floats, algorithm="two_phase")
    with _pytest.raises(ValueError, match="algorithm"):
        D.dedup_clusters(df, algorithm="bogus")


def test_dedup_clusters_rejects_fractional_decimal_ids(spark):
    """A decimal(p, s>0) id rounds under the probe's decimal(38,0) cast —
    e.g. a 10.10~10.15~10.20 chain all rounds to 10, the label-sum probe
    reads stable after one round, and the operator would report a false
    fixpoint. Both algorithms must refuse fractional decimals loudly."""
    import pytest as _pytest

    frac = spark.createDataFrame(
        [(1, 2)], "id_a int, id_b int"
    ).select(
        F.col("id_a").cast("decimal(10,2)").alias("id_a"),
        F.col("id_b").cast("decimal(10,2)").alias("id_b"),
    )
    for algo in ("lpa", "two_phase"):
        with _pytest.raises(TypeError, match="decimal\\(p,0\\)"):
            D.dedup_clusters(frac, algorithm=algo)
    # scale-0 decimals remain accepted (symmetric range, exact sums)
    ok = spark.createDataFrame([(1, 2)], "id_a int, id_b int").select(
        F.col("id_a").cast("decimal(10,0)").alias("id_a"),
        F.col("id_b").cast("decimal(10,0)").alias("id_b"),
    )
    got = {
        str(r["member_id"]): str(r["cluster_rep"])
        for r in D.dedup_clusters(ok).collect()
    }
    assert got == {"1": "1", "2": "1"}


def test_two_phase_cc_raises_when_capped_before_fixpoint(spark):
    """An unconverged two-phase edge set is NOT a per-component star, so
    the extraction would emit duplicate member_id rows with conflicting
    reps — the operator must raise instead of returning them."""
    import pytest as _pytest

    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a bigint, id_b bigint"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        D.dedup_clusters(pairs, max_iters=1, algorithm="two_phase")
