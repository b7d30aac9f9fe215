"""Training-data pipeline operators over the documents/embeddings tables:
tokenization, dedup (exact / minhash-LSH / simhash / n-gram jaccard /
embedding cosine), similarity search, text analysis, multimodal plumbing.

Every operator here is a pure DataFrame composition (JVM-side, no Python
UDFs) unless noted, and ships with an equivalent ANSI-SQL oracle string so
the driver can verify it against DuckDB value-for-value.  The shared
md5-based hash primitives in shared.py exist precisely so Spark and the
oracle compute *identical* numbers.
"""
