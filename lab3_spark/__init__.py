"""lab3_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of elen4020-bigdata/Lab3 (Phoenix++
shared-memory MapReduce + wordCount/top50/invert text pipelines; see
SURVEY.md) as an idiomatic Spark DataFrame engine, and extends it with the
operators a large-scale training-data pipeline needs: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
similarity search, text analysis, multimodal column plumbing, and
Structured Streaming.

Design principles (SURVEY.md §7):
- DataFrame/Catalyst-first: logical plans are declared with built-in
  column expressions; Catalyst/Tungsten pick the physical strategy.
- No Python UDFs on hot paths; Pandas UDFs (Arrow-batched) only where
  built-ins genuinely cannot express the semantics.
- Explicit schemas, deterministic orderings (total orders with explicit
  tie-breakers), repartition-invariant results.
- Shuffle-light at scale: broadcast small dims, partial aggregation,
  AQE on, pushdown-friendly scans.
"""

from lab3_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
