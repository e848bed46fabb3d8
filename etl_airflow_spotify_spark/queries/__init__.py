"""Named queries over the driver's synthetic tables.

Importing this package populates the registry (see ``..registry``).
Module map (SURVEY.md §2.B inventory):
    relational  - X1-X15: scans, filters, joins, aggregates, rollup/cube,
                  windows, sort/top-k, set ops, scalar/JSON functions
    text        - X18 + text-analysis extensions over ``documents``
    dedup       - X15/X16: exact + near-duplicate detection
    curation    - decontamination, PII redaction, sequence packing,
                  stratified mixing, count-min frequency sketch
    similarity  - X17: vector similarity search over ``embeddings``
    subqueries  - EXISTS / NOT EXISTS / correlated-scalar SQL shapes
    streaming   - X20-X23 batch-equivalent checks
"""

from . import (curation, dedup, events_ops, graph, linkage,  # noqa: F401
               maintenance, ml, multimodal, relational, sampling, scale,
               similarity, sketches, spotify, streaming, subqueries, text)
