"""demo_pgvector_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference RAG proof-of-concept (FredworkLemmas/demo_pgvector,
read-only snapshot at /root/reference): document ingestion, chunk/metadata
tables, deterministic embedding computation, brute-force and approximate
vector similarity search, threshold+top-k retrieval with payload join,
dedup/upsert semantics, RAG prompt assembly — plus the large-scale
training-data-pipeline operators (dedup families, ANN, text analytics,
multimodal plumbing, streaming) the reference never had.

Everything is DataFrame/SQL-first: declare the logical plan, let Catalyst
pick the physical strategy. Python UDFs only where built-ins genuinely
cannot express the semantics (the deterministic hash-embedding's numpy RNG).
"""

__version__ = "0.1.0"

from demo_pgvector_spark.session import get_session  # noqa: F401
