"""Property tests for the round-3 operator additions: weighted PageRank
(mass conservation + agreement with a NumPy power iteration), matryoshka
two-stage retrieval (shortlist containment; exact equivalence to
brute-force when the shortlist covers the corpus), and the char-entropy
fold (must equal the Counter-based formula, including empty/uniform
edge cases)."""

from __future__ import annotations

import collections
import math
import random

from pyspark.sql import functions as F

from crane_stream_processing_spark.operators import similarity as S
from crane_stream_processing_spark.operators.graph import (
    pagerank,
    shortest_paths,
)
from crane_stream_processing_spark.operators.text import char_entropy_nats


def _pagerank_ref(edges, damping=0.85, iters=10):
    """Driver-side reference: the identical fixed-iteration recurrence."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    n = len(nodes)
    out = collections.defaultdict(float)
    for u, _, w in edges:
        out[u] += w
    rank = {x: 1.0 / n for x in nodes}
    for _ in range(iters):
        acc = collections.defaultdict(float)
        for u, v, w in edges:
            acc[v] += rank[u] * (w / out[u])
        rank = {x: (1 - damping) / n + damping * acc.get(x, 0.0) for x in nodes}
    return rank


def test_pagerank_matches_reference_and_conserves_mass(spark):
    rng = random.Random(7)
    nodes = list(range(12))
    edges = [
        (u, v, float(rng.randint(1, 9)))
        for u in nodes
        for v in rng.sample(nodes, 3)
        if u != v
    ]
    df = spark.createDataFrame(edges, "u long, v long, w double")
    got = {r.node: r.rank for r in pagerank(df, iters=10).collect()}
    ref = _pagerank_ref(edges, iters=10)
    assert set(got) == set(ref)
    for x in ref:
        assert abs(got[x] - ref[x]) < 1e-9, (x, got[x], ref[x])
    # every node has out-edges here, so rank mass is conserved exactly
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_dangling_mass_leaks_but_ranks_stay_positive(spark):
    # 1 -> 2 -> 3 where 3 is dangling: mass leaks, no crash, no NULLs
    df = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0)], "u long, v long, w double"
    )
    got = {r.node: r.rank for r in pagerank(df, iters=5).collect()}
    ref = _pagerank_ref([(1, 2, 1.0), (2, 3, 1.0)], iters=5)
    assert all(abs(got[x] - ref[x]) < 1e-12 for x in ref)
    assert all(v > 0 for v in got.values())
    assert sum(got.values()) < 1.0  # the documented dangling leak


def test_pagerank_empty_graph_returns_empty(spark):
    df = spark.createDataFrame([], "u long, v long, w double")
    assert pagerank(df, iters=3).collect() == []


def _dijkstra_ref(edges, sources):
    """Driver-side reference: exact shortest paths (rounds=inf)."""
    import heapq

    adj = collections.defaultdict(list)
    for u, v, w in edges:
        adj[u].append((v, w))
    dist = {s: 0.0 for s in sources}
    heap = [(0.0, s) for s in sources]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, math.inf):
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist.get(v, math.inf):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


def test_shortest_paths_matches_dijkstra_when_rounds_cover_diameter(spark):
    rng = random.Random(11)
    nodes = list(range(10))
    edges = [
        (u, v, float(rng.randint(1, 20)))
        for u in nodes
        for v in rng.sample(nodes, 3)
        if u != v
    ]
    df = spark.createDataFrame(edges, "u long, v long, w double")
    src = spark.createDataFrame([(0,)], "node long")
    got = {
        r.node: r.dist
        for r in shortest_paths(df, src, rounds=9).collect()
    }
    ref = _dijkstra_ref(edges, [0])
    assert got == ref  # identical double arithmetic -> exact equality


def test_shortest_paths_bounds_path_length_and_drops_unreached(spark):
    # chain 1->2->3->4 plus isolated target 9: rounds=2 reaches node 3
    # but not 4; 9 never appears (sparse contract: no NULL-dist rows)
    df = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (8, 9, 1.0)],
        "u long, v long, w double",
    )
    src = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.dist for r in shortest_paths(df, src, rounds=2).collect()}
    assert got == {1: 0.0, 2: 1.0, 3: 2.0}


def test_shortest_paths_multi_source_takes_nearest(spark):
    df = spark.createDataFrame(
        [(1, 5, 10.0), (2, 5, 3.0)], "u long, v long, w double"
    )
    src = spark.createDataFrame([(1,), (2,)], "node long")
    got = {r.node: r.dist for r in shortest_paths(df, src, rounds=3).collect()}
    assert got == {1: 0.0, 2: 0.0, 5: 3.0}


def _vecs(spark, n=30, dim=8, seed=3):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_matryoshka_full_shortlist_equals_bruteforce(spark):
    """With shortlist >= corpus the coarse stage prunes nothing, so the
    re-ranked top-k must equal cosine_topk exactly (ids AND scores)."""
    emb = _vecs(spark)
    q = emb.filter(F.col("vec_id") < 5)
    brute = {
        (r.query_id, r.rank): (r.cand_id, r.cos_sim)
        for r in S.cosine_topk(emb, q, k=3).collect()
    }
    mat = {
        (r.query_id, r.rank): (r.cand_id, r.cos_sim)
        for r in S.matryoshka_topk(
            emb, q, prefix_dim=4, shortlist=1000, k=3
        ).collect()
    }
    assert mat == brute


def test_matryoshka_results_come_from_the_shortlist(spark):
    """Stage-2 winners must be stage-1 survivors: rerun stage 1 alone and
    check containment; pre_sim must be the prefix cosine of that pair."""
    emb = _vecs(spark, n=40)
    q = emb.filter(F.col("vec_id") < 4)
    out = S.matryoshka_topk(emb, q, prefix_dim=4, shortlist=8, k=3).collect()
    assert len(out) == 4 * 3
    pre = S.cosine_topk(
        emb.select("vec_id", F.slice("embedding", 1, 4).alias("embedding")),
        q.select("vec_id", F.slice("embedding", 1, 4).alias("embedding")),
        k=8,
    ).collect()
    shortlist = {(r.query_id, r.cand_id): r.cos_sim for r in pre}
    for r in out:
        assert (r.query_id, r.cand_id) in shortlist
        assert abs(shortlist[(r.query_id, r.cand_id)] - r.pre_sim) < 1e-9


def test_char_entropy_matches_counter_formula(spark):
    cases = ["", "a", "aaaa", "aabb", "abcd", "mississippi",
             "The quick brown fox jumps over the lazy dog."]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "id long, text string"
    )
    got = {
        r.id: r.h
        for r in df.select("id", char_entropy_nats("text").alias("h")).collect()
    }

    def ref(s):
        if not s:
            return 0.0
        n = len(s)
        cnt = collections.Counter(s)
        return round(
            math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n, 6
        )

    for i, s in enumerate(cases):
        assert abs(got[i] - ref(s)) < 1e-9, (s, got[i], ref(s))
    # uniform string => zero entropy; k distinct chars => ln(k)
    assert got[2] == 0.0
    assert abs(got[4] - round(math.log(4), 6)) < 1e-9
