from vector_graph_rag_spark.sources.tables import TESTDATA_TABLES, load_table, load_tables

__all__ = ["TESTDATA_TABLES", "load_table", "load_tables"]
