"""Large-scale training-data pipeline operators.

Beyond the reference's cast matrix, these are the operations a 100 TB
training-data pipeline runs over the ingested table: deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language id, quality scoring, token counting, fingerprinting), and
multimodal column plumbing (binary payload + typed metadata, Arrow-batch
decode/feature kernels).

Every operator that is SQL-expressible ships with a DuckDB oracle twin in
__spark_entry__.py; candidate-generation operators (LSH) are verified by
containment against their exact baselines in pytest instead.
"""

from . import asof, components, dedup, lines, pii, profile, ranges, sampling, similarity, text  # noqa: F401
from .cache import unpersist_intermediates  # noqa: F401
