"""bigdata2016w_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``ColourfulBlank/bigdata2016w`` (student
big-data course solutions: text analytics, TPC-H-style queries, inverted
index + boolean retrieval, personalized PageRank, SGD spam classifier),
extended with the operators a large-scale training-data pipeline needs
(dedup, similarity search, text stats, streaming windows).

Everything is declarative DataFrame / Spark SQL so Catalyst + Tungsten pick
the physical strategy; Python UDFs appear only where built-ins genuinely
cannot express the semantics (sequential SGD).
"""

from bigdata2016w_spark.session import get_spark
from bigdata2016w_spark.sources.catalog import TABLES, load_table, load_all

__all__ = ["get_spark", "TABLES", "load_table", "load_all"]
