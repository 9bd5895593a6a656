from vector_graph_rag_spark.streaming.ingest import windowed_event_aggregate

__all__ = ["windowed_event_aggregate"]
