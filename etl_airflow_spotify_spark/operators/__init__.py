"""Reusable DataFrame operator library.

Modules:
    text        - tokenization, language-ID, quality scoring, fingerprints
    dedup       - exact + MinHash-LSH + SimHash near-duplicate detection
    similarity  - vector cosine top-k (exact + LSH-bucketed)
    asof        - as-of (most-recent-match) join
    topk        - deterministic top-k per group
    multimodal  - binary-column plumbing for image/audio payloads
"""
