"""Streaming maintenance of a persisted residual IVF-PQ index — the
vector-index member of the foreachBatch sink family.

``sources.sinks.ivfpq_index_append`` encodes new vectors against the
FROZEN model artifacts (centroids + codebook) in one map-side pass, but
its ``mode('append')`` write is not replay-safe: a micro-batch whose
parquet write succeeded but whose checkpoint commit did not would append
its rows AGAIN on replay. This sink keeps the one-pass frozen-model
encode and swaps the landing zone for the family's batch-stamped
overwrite layout (``streaming.ingest`` / ``streaming.sketch_sink``):
batch N's packed codes land under ``{index}/codes_stream/batch=N``,
hive-partitioned by cell inside the batch dir, so a replayed batch
overwrites its own subdir instead of doubling. Probes union the base
``codes`` partitions with the streamed ones
(``knn_ivfpq_from_index(include_streamed=True)``); both sides prune to
the probed cells BEFORE the union, so the scan stays n_probe cell
directories of M-byte rows on each side.

At 100 TB the streamed tail stays tiny relative to the base index, and
:func:`ivfpq_index_compact` periodically folds ``codes_stream`` batches
into the base ``codes`` partitions (quiesce the stream first) to bound
read-side fan-in — the same compaction story as the sketch partials
(``sketch_sink.compact_sketch_batches``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdata2016w_spark.streaming.ingest import (
    _batch_dirs,
    _checkpoint_started,
)

CODES_SCHEMA = "vec_id bigint, codes array<tinyint>, cell int"


def _stream_dir(index_path: str) -> str:
    return f"{index_path}/codes_stream"


def read_streamed_codes(spark: SparkSession, index_path: str) -> DataFrame:
    """(vec_id, codes, cell): every committed micro-batch's packed codes,
    via the Hadoop batch-dir listing (never a glob — an in-flight batch's
    partial files must not leak in). No batches yet → empty typed frame.
    Each batch dir is itself hive-partitioned by cell, so a cell filter
    on this frame still prunes directories at the scan."""
    marker = spark._jvm.org.apache.hadoop.fs.Path(
        f"{_stream_dir(index_path)}/_COMPACTING"
    )
    if marker.getFileSystem(
        spark._jsc.hadoopConfiguration()
    ).exists(marker):
        raise ValueError(
            f"compaction marker {marker} exists — the surviving batch= "
            "dirs were already folded into the base codes, so reading "
            "them again would double-count; recover per "
            "ivfpq_index_compact first."
        )
    dirs = _batch_dirs(spark, _stream_dir(index_path))
    if not dirs:
        return spark.createDataFrame([], CODES_SCHEMA)
    # basePath anchors partition discovery at the stream root so each
    # batch dir's nested cell= level parses as (batch, cell) instead of
    # CONFLICTING_DIRECTORY_STRUCTURES; only committed batch dirs are
    # listed, so an in-flight batch still can't leak in
    return (
        spark.read.option("basePath", _stream_dir(index_path))
        .parquet(*dirs)
        .select("vec_id", "codes", "cell")
    )


def ivfpq_index_compact(spark: SparkSession, index_path: str) -> int:
    """Fold every streamed batch's codes into the base ``codes``
    partitions and remove ``codes_stream`` — the periodic job that
    bounds probe-side fan-in as the streamed tail grows. Returns the
    number of code rows folded (0 = nothing to compact).

    Run against a QUIESCED stream whose last batch committed, and keep
    using the ORIGINAL checkpoint afterwards: a fresh checkpoint would
    re-process every input file and re-encode vectors that now live in
    the base partitions (the family's batch-id contract — the sink's
    guard can no longer see the folded batches). Crash safety is a
    marker file: it is created before the base append and removed after
    the batch dirs are deleted, so a compaction that died in between
    fails the NEXT compact/append loudly instead of silently
    double-counting rows that were folded but not yet removed."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    marker = jvm.org.apache.hadoop.fs.Path(
        f"{_stream_dir(index_path)}/_COMPACTING"
    )
    fs = marker.getFileSystem(hconf)
    if fs.exists(marker):
        raise ValueError(
            f"compaction marker {marker} exists — a previous compaction "
            "died between the base append and the batch-dir cleanup, so "
            "the folded rows may exist BOTH in codes and codes_stream. "
            "Inspect and remove the surviving batch= dirs (their rows "
            "were already appended) and the marker before retrying."
        )
    dirs = _batch_dirs(spark, _stream_dir(index_path))
    if not dirs:
        return 0
    streamed = read_streamed_codes(spark, index_path)
    n = streamed.count()
    fs.create(marker, True).close()
    (
        streamed.repartition("cell")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(f"{index_path}/codes")
    )
    for d in dirs:
        fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)
    fs.delete(marker, False)
    return n


def ivfpq_append_sink(
    emb_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
):
    """Start the index-maintenance stream: batch N's vectors are encoded
    against the index's FROZEN centroids + codebook (read once at sink
    start — appends never retrain, ``write_ivfpq_index``'s train-once
    contract) and land as packed codes in
    ``{index}/codes_stream/batch=N`` (overwrite — replay-idempotent).
    Returns the StreamingQuery.

    Raises up front when the index is empty (no model to encode against,
    the batch append's contract) and on the family's fresh-checkpoint-
    vs-populated-target mismatch: a fresh checkpoint restarts batch ids
    at 0 and would overwrite existing streamed batches one by one."""
    from bigdata2016w_spark.sources.sinks import (
        _ivfpq_frozen_models,
        ivfpq_encode_packed,
    )

    spark = emb_stream.sparkSession
    marker = spark._jvm.org.apache.hadoop.fs.Path(
        f"{_stream_dir(index_path)}/_COMPACTING"
    )
    if marker.getFileSystem(
        spark._jsc.hadoopConfiguration()
    ).exists(marker):
        raise ValueError(
            f"compaction marker {marker} exists — finish the crashed "
            "compaction (see ivfpq_index_compact) before appending."
        )
    if not _checkpoint_started(spark, checkpoint_dir):
        existing = _batch_dirs(spark, _stream_dir(index_path))
        if existing:
            raise ValueError(
                f"index at {index_path!r} already holds streamed batch= "
                f"subdirs but checkpoint_dir {checkpoint_dir!r} is fresh "
                "— batch ids would restart at 0 and overwrite existing "
                "appends. Reuse the original checkpoint, or compact "
                "codes_stream into the base index first."
            )
    # frozen at sink start: every batch encodes against the SAME models,
    # so a replay of batch N is bit-identical to its first run
    cent_lit, cent, cb, n_subspaces, dim = _ivfpq_frozen_models(
        spark, index_path
    )

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        (
            ivfpq_encode_packed(batch_df, cent_lit, cent, cb,
                                n_subspaces, dim)
            .repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(f"{_stream_dir(index_path)}/batch={batch_id}")
        )

    return (
        emb_stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
