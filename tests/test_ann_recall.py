"""ANN recall accounting: measure each approximate-search variant against
the exact brute-force top-k and pin the recall ladder. The synthetic
embeddings are near-orthogonal (neighbor cosine ~0.3 — no manifold
structure), which caps bucketed recall by construction; what these tests
pin is the ORDERING the knobs must buy (multi-probe > single-probe,
nprobe=2 >= nprobe=1) and a floor for the multi-probe path. On real
embedding manifolds (neighbor cosine 0.7+) the same constructions reach
90%+ recall — the knobs, not the constants, are the contract."""

from __future__ import annotations

import pytest

from crane_stream_processing_spark.inventory import REGISTRY


@pytest.fixture(scope="module")
def recall(spark, sf_dir):
    exact = {
        (r.query_id, r.cand_id)
        for r in REGISTRY["sim_cosine_topk"].fn(spark, sf_dir).collect()
    }
    assert exact

    def _measure(name: str) -> float:
        approx = {
            (r.query_id, r.cand_id)
            for r in REGISTRY[name].fn(spark, sf_dir).collect()
        }
        return len(exact & approx) / len(exact)

    return _measure


def test_multiprobe_beats_single_probe(recall):
    r1, rmp = recall("sim_lsh_ann_topk"), recall("sim_lsh_multiprobe_topk")
    assert rmp > r1  # Hamming-1 probes must recover boundary misses
    assert rmp >= 0.15  # measured 0.20-0.23 on this corpus


def test_nprobe_at_least_single_cell(recall):
    assert recall("sim_ivf_nprobe_topk") >= recall("sim_ivf_ann_topk")


def test_approx_results_are_true_cosines(spark, sf_dir):
    """Approximate variants may MISS neighbors but never fabricate
    scores: every (query, cand, cos_sim) they emit must equal the exact
    pair cosine (same rounding), i.e. approximation lives only in the
    candidate set, not the metric."""
    exact_scores = {
        (r.query_id, r.cand_id): r.cos_sim
        for r in REGISTRY["sim_cosine_topk"]
        .fn(spark, sf_dir)
        .collect()
    }
    for name in ("sim_lsh_multiprobe_topk", "sim_ivf_nprobe_topk"):
        for r in REGISTRY[name].fn(spark, sf_dir).collect():
            key = (r.query_id, r.cand_id)
            if key in exact_scores:
                assert r.cos_sim == exact_scores[key], (name, key)


def test_arrow_cosine_topk_matches_relational(spark, sf_dir):
    """The Arrow brute-force baseline must return row-identical top-k to
    the relational path (same 6-decimal round, same cand_id tiebreak,
    same self-pair filter) — with and without exclude_self."""
    from crane_stream_processing_spark.catalog import load_table
    from crane_stream_processing_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_arrow,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    from pyspark.sql import functions as F

    q = emb.filter(F.col("vec_id") < 12)
    for excl in (True, False):
        rel = sorted(
            map(tuple, cosine_topk(emb, q, k=5, exclude_self=excl).collect())
        )
        fast = sorted(
            map(
                tuple,
                cosine_topk_arrow(emb, q, k=5, exclude_self=excl).collect(),
            )
        )
        assert fast == rel and len(fast) == 12 * 5
