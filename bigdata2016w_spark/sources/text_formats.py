"""Reference-native text ingestion formats.

The reference consumes raw text in three hand-parsed shapes; the engine
ingests each into typed DataFrames (after which everything is columnar):

- pipe-delimited TPC-H ``.tbl`` dumps, columns recovered positionally
  (``SCALA/assignment5/Q1.scala:39-41``);
- tab/space adjacency lists ``nodeid n1 n2 ...``
  (``JAVA/assignment4/BuildPersonalizedPageRankRecords.java:72-92``,
  format of ``data/p2p-Gnutella08-adj.txt``);
- ML instance lines ``docid label f1 f2 ...`` with label ∈ {spam, ham}
  (``SCALA/assignment6/TrainSpamClassifier.scala:78-89``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata2016w_spark.sources.catalog import SCHEMAS


def read_tbl(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Read a reference-style ``.tbl`` pipe-delimited dump with the catalog
    schema (replaces per-query ``split('|')(i)`` positional parsing)."""
    return spark.read.csv(path, sep="|", schema=SCHEMAS[table])


def read_adjacency(spark: SparkSession, path: str) -> DataFrame:
    """Adjacency-list text → edges DataFrame[src long, dst long].

    Lines with no neighbors (dangling nodes) produce no edge rows — their
    ids still appear wherever they are someone's target, matching the
    reference's missing-structure handling
    (RunPersonalizedPageRankBasic.java:251-259).
    """
    lines = spark.read.text(path)
    toks = lines.select(F.split(F.trim("value"), r"\s+").alias("t"))
    return (
        toks.where(F.size("t") >= 2)
        .select(
            F.element_at("t", 1).cast("long").alias("src"),
            F.explode(F.slice("t", 2, 1 << 30)).alias("dst_s"),
        )
        .select("src", F.col("dst_s").cast("long").alias("dst"))
    )


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Line-per-document corpus → DataFrame[doc_id long, text string].

    The reference derived docids from the line's byte offset
    (``BuildInvertedIndexCompressed.java:67,89`` — TextInputFormat keys);
    here docid is the deterministic 0-based line number (zipWithIndex — one
    extra pass, stable across partitionings, unlike
    monotonically_increasing_id).
    """
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    return spark.createDataFrame(
        rdd.map(lambda t: (t[1], t[0])), schema="doc_id long, text string"
    )


def read_ml_instances(spark: SparkSession, path: str) -> DataFrame:
    """Instance lines → DataFrame[docid string, label double, features array<int>].

    label: spam→1.0, ham→0.0 (TrainSpamClassifier.scala:83-86)."""
    lines = spark.read.text(path)
    toks = lines.select(F.split(F.trim("value"), r"\s+").alias("t"))
    return toks.select(
        F.element_at("t", 1).alias("docid"),
        F.when(F.element_at("t", 2) == "spam", 1.0).otherwise(0.0).alias("label"),
        F.transform(F.slice("t", 3, 1 << 30), lambda x: x.cast("int")).alias("features"),
    )


def read_jsonl(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Read JSON-lines with the catalog schema declared up front — schema
    inference on JSON is a full extra pass over the data at scale, so the
    engine never relies on it for known tables."""
    return spark.read.schema(SCHEMAS[table]).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write JSON-lines (the interchange format most external corpus
    tooling consumes)."""
    df.write.mode(mode).json(path)


def read_csv_table(
    spark: SparkSession, path: str, table: str, header: bool = True
) -> DataFrame:
    """Read CSV with the catalog schema declared up front — like JSONL,
    schema/type inference is a full extra pass at scale and is never
    relied on for known tables. Timestamps parse ISO-8601."""
    return (
        spark.read.schema(SCHEMAS[table])
        .options(header=str(header).lower(), timestampNTZFormat="yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(path)
    )


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    """CSV export for downstream non-columnar consumers."""
    (
        df.write.mode(mode)
        .options(header=str(header).lower(), timestampNTZFormat="yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar with predicate pushdown like parquet; schema
    travels with the file."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None,
    mode: str = "overwrite", compression: str = "zlib",
) -> None:
    """ORC sink with optional hive partitioning. Codec defaults to zlib
    explicitly (every ORC reader decodes it; Spark's session default
    resolves to zstd, which older readers may lack)."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
