"""Large-scale training-data pipeline operators.

Beyond the reference's TSDB surface: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), similarity search over embeddings, text analysis,
and multimodal binary-column plumbing — the operator set a 100 TB
LLM-data pipeline needs, built Spark-first (JVM expressions wherever the
semantics allow, Arrow-batched pandas only at the decode boundary).

Cross-engine determinism: hashes use the first 15 hex chars of md5 as a
60-bit integer — computable identically in Spark
(``conv(substring(md5(x),1,15),16,10)``) and DuckDB
(``('0x' || substr(md5(x),1,15))::BIGINT``) so every probabilistic
structure (MinHash signatures, SimHash bits, LSH buckets) has an exact SQL
oracle.
"""
