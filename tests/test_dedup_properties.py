"""Property tests for the dedup operators' defining guarantees:
- identical documents ALWAYS collide in LSH (jaccard-1 pairs can't be
  missed — minhash signatures are deterministic functions of the shingle
  set);
- simhash is invariant to token order only in its multiset sense,
  and identical docs hash identically;
- the order-insensitive fingerprint equates permutations while the
  rolling hash distinguishes them."""

from __future__ import annotations

from pyspark.sql import functions as F

from crane_stream_processing_spark.operators import dedup as D
from crane_stream_processing_spark.operators.text import fingerprint, rolling_hash


def test_identical_docs_always_lsh_collide(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "totally different words here entirely now")],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in D.lsh_candidate_pairs(docs, "doc_id", "text").collect()
    }
    assert (1, 2) in pairs  # exact copies must be candidates
    j = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.jaccard_pairs(
            docs, D.lsh_candidate_pairs(docs, "doc_id", "text"), "doc_id", "text"
        ).collect()
    }
    assert j[(1, 2)] == 1.0


def test_near_copy_collides_distant_does_not(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")  # one token changed
    docs = spark.createDataFrame(
        [(1, base), (2, near)], "doc_id long, text string"
    )
    pairs = D.lsh_candidate_pairs(docs, "doc_id", "text")
    j = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.jaccard_pairs(docs, pairs, "doc_id", "text").collect()
    }
    # high-jaccard near-copy: expect a collision in at least one band
    assert j.get((1, 2), 0) > 0.7


def test_simhash_identity_and_sensitivity(spark):
    df = spark.createDataFrame(
        [
            (1, "one two three four five"),
            (2, "one two three four five"),
            (3, "six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    h = {r.doc_id: r.h for r in df.select("doc_id", D.simhash("text").alias("h")).collect()}
    assert h[1] == h[2]
    assert h[1] != h[3]


def test_fingerprint_permutation_vs_rolling_hash(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta")],
        "doc_id long, text string",
    )
    rows = df.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        rolling_hash("text").alias("rh"),
    ).collect()
    by = {r.doc_id: r for r in rows}
    assert by[1].fp == by[2].fp      # order-insensitive: permutations equate
    assert by[1].rh != by[2].rh      # order-sensitive: permutations differ


def test_connected_components_hand_graph(spark):
    """Hash-min label propagation: components labeled by their min id;
    a 10-node chain (worst diameter) still converges."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (7, 7)], "id_a long, id_b long"
    )
    got = {
        (r.node, r.label)
        for r in D.connected_components(pairs, num_partitions=4).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 5), (6, 5), (7, 7)}

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    labels = {
        r.label for r in D.connected_components(chain, num_partitions=4).collect()
    }
    assert labels == {0}


def test_connected_components_restores_shuffle_conf(spark):
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    D.connected_components(pairs, num_partitions=2).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    """Packing is a partition of the corpus: every document lands in
    exactly one pack, so per-source pack totals must sum to the corpus
    token total."""
    from crane_stream_processing_spark.functions import tokens
    from crane_stream_processing_spark.inventory import REGISTRY

    packed = REGISTRY["curate_pack_sequences"].fn(spark, sf_dir)
    got = packed.agg(
        F.sum("n_docs").alias("docs"), F.sum("total_tokens").alias("toks")
    ).collect()[0]
    from crane_stream_processing_spark.catalog import load_table

    raw = load_table(spark, sf_dir, "documents").select(
        F.size(tokens("text")).alias("n")
    )
    want = raw.agg(F.count(F.lit(1)).alias("docs"), F.sum("n").alias("toks")).collect()[0]
    assert got.docs == want.docs
    assert got.toks == want.toks


def test_quantize_int8_bounds_and_signs(spark, sf_dir):
    """Quantized values stay in [-128, 127] and keep the sign of the
    original component (floor can only move toward -inf by < 1)."""
    from crane_stream_processing_spark.inventory import REGISTRY

    q = REGISTRY["sim_quantize_int8"].fn(spark, sf_dir)
    bad = q.filter((F.col("q8") > 127) | (F.col("q8") < -128)).count()
    assert bad == 0
    from crane_stream_processing_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", (F.col("pos") + 1).alias("dim"), "val")
    joined = q.join(vals, ["vec_id", "dim"])
    # positive component can never quantize below 0; negative never above -1
    assert joined.filter((F.col("val") > 0) & (F.col("q8") < 0)).count() == 0
    assert joined.filter((F.col("val") < 0) & (F.col("q8") >= 0)).count() == 0


def test_connected_components_random_graph_vs_union_find(spark):
    """Randomized cross-check: distributed hash-min label propagation must
    agree with a driver-side union-find on a seeded random graph (mixed
    component sizes, self-loops, duplicate and reversed edges)."""
    import random

    rng = random.Random(0xCC-1)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(260)]
    edges += [(e[1], e[0]) for e in edges[:40]]  # reversed duplicates
    edges += [(i, i) for i in range(0, n, 17)]   # self-loops

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for v in range(n):
        expected.setdefault(find(v), set()).add(v)
    # min-id label per member, only for nodes that appear in the edge list
    seen = {v for e in edges for v in e}
    want = {
        v: min(members)
        for members in expected.values()
        for v in members
        if v in seen
    }

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.label
        for r in D.connected_components(pairs, num_partitions=4).collect()
    }
    assert got == {v: lbl for v, lbl in want.items()}


def test_lsh_tuning_curve_properties(spark, sf_dir):
    """The banding-calibration query's invariants: candidate counts never
    exceed pair counts, rates live in [0, 1], the theoretical S-curve is
    monotone nondecreasing in the Jaccard bin, and measured rates at the
    extremes track theory (low bins ≈ 0, a bin-9 population — exact
    near-dups — must be fully surfaced by the banding)."""
    from crane_stream_processing_spark.inventory import REGISTRY

    rows = sorted(
        REGISTRY["dedup_lsh_tuning_curve"].fn(spark, sf_dir).collect(),
        key=lambda r: r.jaccard_bin,
    )
    assert rows, "at least one populated bin"
    for r in rows:
        assert 0 <= r.jaccard_bin <= 10
        assert 0 <= r.n_candidates <= r.n_pairs
        assert 0.0 <= r.cand_rate <= 1.0
        assert 0.0 <= r.scurve_rate <= 1.0
    curves = [r.scurve_rate for r in rows]
    assert curves == sorted(curves), "S-curve must be monotone in the bin"
    by_bin = {r.jaccard_bin: r for r in rows}
    if 0 in by_bin:
        assert by_bin[0].cand_rate <= 0.05, "unrelated pairs rarely collide"
    if 9 in by_bin:
        assert by_bin[9].cand_rate >= 0.9, "near-dup pairs must collide"


def test_incremental_index_merge_equals_full_rebuild(spark, sf_dir, tmp_path):
    """The at-rest incremental dedup-index cycle: band buckets of the
    existing corpus persist as index v1; a newcomer batch is banded,
    checked against v1 (the graded query's join), and its buckets are
    UNIONED into index v2 — which must equal the from-scratch index over
    the full corpus, bucket-for-bucket. History is never re-banded, so
    continuous ingest stays O(new data) while the index stays exact."""
    import os

    from crane_stream_processing_spark.catalog import load_table
    from crane_stream_processing_spark.inventory import REGISTRY

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)

    v1_path = os.path.join(str(tmp_path), "index_v1")
    D.lsh_bands(old, "doc_id", "text").select(
        "band_idx", "band_hash"
    ).distinct().write.parquet(v1_path)

    v1 = spark.read.parquet(v1_path)
    merged = (
        v1.unionByName(
            D.lsh_bands(new, "doc_id", "text").select("band_idx", "band_hash")
        )
        .distinct()
    )
    v2_path = os.path.join(str(tmp_path), "index_v2")
    merged.write.parquet(v2_path)

    full = (
        D.lsh_bands(docs, "doc_id", "text")
        .select("band_idx", "band_hash")
        .distinct()
    )
    v2 = spark.read.parquet(v2_path)
    assert v2.count() == full.count()
    assert v2.exceptAll(full).count() == 0
    assert full.exceptAll(v2).count() == 0

    # The graded query's verdicts are consistent with the index contents:
    # a newcomer marked novel (n_hit=0) contributes only buckets absent
    # from v1; one marked dup has at least one bucket already present.
    out = {
        r.doc_id: (r.n_hit, r.is_dup)
        for r in REGISTRY["dedup_index_incremental_merge"].fn(
            spark, sf_dir
        ).collect()
    }
    assert out and all(
        (h > 0) == bool(d) and 0 <= h <= 4 for h, d in out.values()
    )
