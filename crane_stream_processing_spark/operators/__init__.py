"""Composite operators the Spark DataFrame API lacks as primitives.

Each module implements one family as pure DataFrame transforms (partition-
parallel, no driver-side collection — the 100 TB design rule):

- :mod:`.asof` — as-of (nearest-prior) joins (SURVEY.md §2.3 J6)
- :mod:`.dedup` — exact + near-duplicate detection (minhash-LSH, simhash,
  n-gram Jaccard)
- :mod:`.similarity` — embedding similarity search (brute-force + LSH)
- :mod:`.text` — language-ID, quality scoring, token stats, fingerprints
- :mod:`.multimodal` — opaque binary media columns + Arrow-batched decode
"""
