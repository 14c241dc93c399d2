"""distributed_deduplicator_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query / data-processing
capabilities of the reference library ``stroiker/distributed-deduplicator``
(a Cassandra-backed exactly-once deduplication library), generalized into
a batch + streaming operator suite for large-scale (100 TB) data
pipelines:

- keyed first-writer-wins deduplication with deterministic tie-breaking,
  TTL/time-horizon semantics, 4-state attempt audit trails
  (reference: provider/DeduplicationProvider.kt:35-123),
- relational breadth (joins, aggregates, windows, set ops),
- LLM-data-pipeline operators: exact + near dedup (MinHash/SimHash/
  n-gram Jaccard), similarity search over embeddings, text analysis,
  multimodal column plumbing,
- Structured Streaming equivalents (watermarked dedup, windowed aggs).

Everything is expressed with the DataFrame/SQL API so Catalyst + AQE pick
the physical strategy; Python UDFs appear only where built-ins cannot
express the semantics (and then always Arrow-batched).
"""

from distributed_deduplicator_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
