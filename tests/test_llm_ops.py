"""Invariant tests for the LLM-pipeline operators — properties the DuckDB
parity gate can't express (recall vs baseline, containment between
detectors, guard rails).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inspig_etl_spark import queries as reg
from tests.conftest import SF_CORRECT

reg._load()
Q = {q.name: q.fn for q in reg.REGISTRY.values()}


def test_minhash_finds_planted_neardup(spark):
    """sf0.01 documents contain a planted near-dup (jaccard ~0.955);
    the banded MinHash detector must surface it."""
    pairs = {
        (r.id_a, r.id_b)
        for r in Q["docs_minhash_neardup_pairs"](spark, SF_CORRECT).collect()
    }
    assert (87, 134) in pairs


def test_minhash_pairs_subset_of_exact_jaccard(spark):
    """LSH banding may MISS pairs but must never invent them: every banded
    result must also be found by the recall-1 shared-shingle blocker."""
    mh = {
        (r.id_a, r.id_b)
        for r in Q["docs_minhash_neardup_pairs"](spark, SF_CORRECT).collect()
    }
    full = {
        (r.id_a, r.id_b)
        for r in Q["docs_ngram_jaccard_pairs"](spark, SF_CORRECT).collect()
    }
    assert mh <= full
    assert len(full) >= 1  # the planted pair exists


def test_bucketed_knn_is_bucket_consistent_and_recalls(spark):
    """Bucketed ANN results must be a per-bucket refinement of brute force:
    (a) every (query, neighbor) it returns also appears in the brute-force
    candidate ordering with the SAME similarity; (b) recall@5 is nonzero."""
    brute = Q["embeddings_knn_bruteforce"](spark, SF_CORRECT).collect()
    bucketed = Q["embeddings_knn_bucketed"](spark, SF_CORRECT).collect()
    brute_sims = {(r.query_id, r.neighbor_id): r.cosine_sim for r in brute}
    overlap = 0
    for r in bucketed:
        key = (r.query_id, r.neighbor_id)
        if key in brute_sims:
            assert brute_sims[key] == r.cosine_sim
            overlap += 1
    assert len(bucketed) > 0
    assert overlap > 0  # some true top-5 neighbors share a bucket


def test_exact_dedup_canonical_invariants(spark):
    df = Q["docs_exact_dedup"](spark, SF_CORRECT)
    bad = df.filter(
        (F.col("canonical_id") > F.col("doc_id"))
        | ((F.col("is_dup") == 1) & (F.col("canonical_id") == F.col("doc_id")))
    )
    assert bad.count() == 0


def test_asof_join_rejects_column_collision(spark):
    from inspig_etl_spark.operators.events import asof_join

    df = spark.createDataFrame([(1, 10, "x")], "k INT, t INT, v STRING")
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, keys=["k"], left_ts="t", right_ts="t", right_vals=["v"])
