"""HTTP API layer (reference: src/vector_graph_rag/api/app.py)."""

from vector_graph_rag_spark.api.app import create_app  # noqa: F401
