from baum_welch_spark.sources.io import load_table, load_tables, TABLES

__all__ = ["load_table", "load_tables", "TABLES"]
