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


def test_kmeans_separates_planted_clusters(spark):
    """Two obvious 64-dim clusters (near +e0 and near +e1) with axis seeds:
    after Lloyd updates every member of a group shares a cluster id and the
    two groups get DIFFERENT ids — and sizes are right."""
    from inspig_etl_spark.operators.clustering import MICRO, kmeans_fit_assign

    dim = 64
    def vec(axis, bump):
        v = [0.0] * dim
        v[axis] = 0.9
        v[(axis + 7) % dim] = bump  # small per-row jitter, same cluster
        return v

    rows = [(i, vec(0, 0.01 * i)) for i in range(4)] + [
        (10 + i, vec(1, 0.01 * i)) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    seeds = [[MICRO if d == 0 else 0 for d in range(dim)],
             [MICRO if d == 1 else 0 for d in range(dim)]]
    out = {r.vec_id: r for r in kmeans_fit_assign(
        df, "embedding", "vec_id", dim, seeds, updates=2
    ).collect()}
    a_clusters = {out[i].cluster for i in range(4)}
    b_clusters = {out[10 + i].cluster for i in range(3)}
    assert len(a_clusters) == 1 and len(b_clusters) == 1
    assert a_clusters != b_clusters
    assert out[0].cluster_size == 4 and out[10].cluster_size == 3


def test_kmeans_query_sizes_are_consistent(spark):
    """cluster_size must equal the actual member count per cluster and the
    assignment must cover every valid (exact-dim) vector exactly once."""
    out = Q["embeddings_kmeans_lloyd"](spark, SF_CORRECT).collect()
    from collections import Counter

    counts = Counter(r.cluster for r in out)
    for r in out:
        assert r.cluster_size == counts[r.cluster]
    assert len({r.vec_id for r in out}) == len(out)


def test_semdedup_keeps_every_cell_leader(spark):
    """The most-central vector of each cell outranks everything, so it can
    never be pruned; and the keep flag must be a 0/1 partition of the
    corpus."""
    out = Q["embeddings_semdedup_prune"](spark, SF_CORRECT).collect()
    assert out and all(r.keep in (0, 1) for r in out)
    best_by_cell = {}
    for r in out:
        if r.centroid_sim_e6 is None or r.cell is None:
            continue
        cur = best_by_cell.get(r.cell)
        key = (-r.centroid_sim_e6, r.vec_id)
        if cur is None or key < cur[0]:
            best_by_cell[r.cell] = (key, r.keep)
    for cell, (_, keep) in best_by_cell.items():
        assert keep == 1, f"cell {cell} leader was pruned"


def test_multiprobe_dominates_single_probe_pointwise(spark):
    """nprobe=2 only ADDS candidates per query, so at every rank its
    similarity must be >= the nprobe=1 similarity — and both are bounded by
    brute force."""
    single = {(r.query_id, r.rank): r.cosine_sim
              for r in Q["embeddings_knn_ivf"](spark, SF_CORRECT).collect()}
    multi = {(r.query_id, r.rank): r.cosine_sim
             for r in Q["embeddings_knn_ivf_multiprobe"](spark, SF_CORRECT).collect()}
    brute = {(r.query_id, r.rank): r.cosine_sim
             for r in Q["embeddings_knn_bruteforce"](spark, SF_CORRECT).collect()}
    assert multi
    for key, sim in single.items():
        if key in multi:
            assert multi[key] >= sim
    for key, sim in multi.items():
        if key in brute:
            assert brute[key] >= sim


def test_quality_classifier_verdict_is_threshold_consistent(spark):
    """keep == (logit >= 0), features stay in their fixed-point ranges, and
    the model discriminates (both classes present at sf0.01)."""
    out = Q["docs_quality_classifier"](spark, SF_CORRECT).collect()
    kept = sum(r.keep for r in out)
    assert 0 < kept < len(out)
    for r in out:
        assert r.keep == (1 if r.logit_e4 >= 0 else 0)
        assert 0 <= r.f_len <= 256
        for f in (r.f_stop_e4, r.f_uniq_e4, r.f_punct_e4):
            assert 0 <= f <= 10000
        assert r.f_awl_e4 >= 0
