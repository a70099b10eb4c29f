from bigdata2016w_spark.sources.catalog import TABLES, SCHEMAS, load_table, load_all

__all__ = ["TABLES", "SCHEMAS", "load_table", "load_all"]
