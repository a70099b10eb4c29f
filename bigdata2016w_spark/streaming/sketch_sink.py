"""Streaming sketch maintenance — per-micro-batch CMS counter and HLL
register partials, merged on read.

Sketches are ALGEBRAIC aggregates (counters add, registers max), so the
streaming design writes each micro-batch's d·w-row / 2^p-row partial to
a batch-stamped subdirectory and merges at read time: the write side
needs no read-modify-write (a replayed batch overwrites its own subdir —
the exactly-once-per-batch-id convention of ``streaming.ingest``), and
the read side folds a few hundred tiny rows per batch. A read-modify-
write counter table would instead double-count on every replay unless
it re-derived which batches were already folded in — exactly the state
this layout keeps in the directory structure for free.

At 100 TB the per-batch partial is STILL d·w / 2^p rows — the whole
point of maintaining sketches instead of exact aggregates on a stream.
:func:`compact_sketch_batches` periodically folds old batch dirs into
one (the merge is associative), keeping the read-side fan-in bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdata2016w_spark.operators.sketches import (
    QSK_K,
    cms_counters,
    hash_sample_rows,
    hll_registers,
)
from bigdata2016w_spark.streaming.ingest import (
    _batch_dirs,
    _checkpoint_started,
)

CMS_SCHEMA = "j int, slot int, cnt bigint"
HLL_SCHEMA = "bucket int, rho int"
QSK_SCHEMA = "h bigint, x double"


def sketch_maintenance_sink(
    keys_stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    col: str,
    hll_seed: str = "HLL",
    value_col: str | None = None,
):
    """Start the sketch-maintenance stream: batch N's CMS counter
    partial lands in ``{target_dir}/batch=N/cms`` and its HLL register
    partial in ``{target_dir}/batch=N/hll``; when ``value_col`` is given
    the batch's k-minimum-hash quantile sample (keyed by ``col``, which
    must then identify rows uniquely) additionally lands in
    ``batch=N/qsk`` — the quantile member of the family, whose merge
    (k smallest of the union) is just as algebraic as counter-add and
    register-max. Returns the StreamingQuery.

    Same fresh-checkpoint-vs-populated-target fail-fast as the admission
    sinks (batch ids are the replay-safety keys here too), implemented
    against THIS sink's nested layout — the admission sinks' guard
    checks via a flat parquet read, which would silently pass on these
    ``batch=N/cms|hll`` subtrees."""
    spark = keys_stream.sparkSession
    if not _checkpoint_started(spark, checkpoint_dir):
        existing = _batch_dirs(spark, target_dir)
        if existing:
            raise ValueError(
                f"target_dir {target_dir!r} already holds batch= subdirs "
                f"but checkpoint_dir {checkpoint_dir!r} is fresh — batch "
                "ids would restart at 0 and overwrite existing sketch "
                "partials while stale ones kept merging in. Reuse the "
                "original checkpoint, or point the stream at an empty "
                "target."
            )

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        base = f"{target_dir}/batch={batch_id}"
        cms_counters(batch_df, col).write.mode("overwrite").parquet(
            f"{base}/cms"
        )
        hll_registers(batch_df, col, hll_seed).write.mode(
            "overwrite"
        ).parquet(f"{base}/hll")
        if value_col is not None:
            hash_sample_rows(batch_df, col, value_col).write.mode(
                "overwrite"
            ).parquet(f"{base}/qsk")

    return (
        keys_stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _read_partials(
    spark: SparkSession, target_dir: str, sub: str, schema: str,
    strict: bool = False,
) -> DataFrame:
    """All batches' ``{sub}`` partials, via the Hadoop batch-dir listing
    (``streaming.ingest._batch_dirs`` — never a glob, which would both
    swallow an in-flight batch's partial files and throw PATH_NOT_FOUND
    before the first commit). No batches yet → empty typed frame, so a
    reader sees cardinality 0, not an AnalysisException.

    ``strict`` raises when SOME batches have the partial and some don't —
    the mixed-mode signature of a stream restarted WITH ``value_col``
    after batches ran without it: silently merging only the batches that
    have a ``qsk`` subdir would return a sample of part of the stream as
    if it covered all of it. (cms/hll stay lenient: they are written
    unconditionally, so a missing half there is an in-flight batch whose
    replay will overwrite the whole ``batch=N`` dir.)"""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    marker = _compaction_marker(spark, target_dir)
    if marker.getFileSystem(hconf).exists(marker):
        raise ValueError(
            f"compaction marker {marker} exists — a compaction died "
            "mid-way, so merging now would double-count the folded "
            "batches; recover per compact_sketch_batches first."
        )
    batch_dirs = _batch_dirs(spark, target_dir)
    paths = []
    missing = []
    for d in batch_dirs:
        p = jvm.org.apache.hadoop.fs.Path(f"{d}/{sub}")
        # a crash between the sink's writes can leave batch=N with only
        # some partials; skip the missing half instead of failing
        if p.getFileSystem(hconf).exists(p):
            paths.append(f"{d}/{sub}")
        else:
            missing.append(d)
    if strict and paths and missing:
        raise ValueError(
            f"{len(missing)} of {len(batch_dirs)} batch dirs under "
            f"{target_dir!r} lack a {sub!r} partial (e.g. {missing[0]!r})"
            " — the stream ran some batches without this sketch enabled;"
            " merging only the batches that have it would silently "
            "misrepresent the stream. Re-run from a fresh target with "
            "the sketch enabled throughout, or compact the old batches."
        )
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def compact_sketch_batches(spark: SparkSession, target_dir: str) -> int:
    """Fold every batch's sketch partials into the LOWEST-id batch dir
    and delete the rest — the periodic job the module docstring promises
    to bound read-side fan-in (the merges are associative: counters add,
    registers max, quantile samples keep the k smallest). Returns the
    number of batch dirs removed (0 = nothing to fold).

    Run against a QUIESCED stream whose last batch committed, and keep
    the original checkpoint: folding into the lowest id means a replay
    of the newest uncommitted batch can never overwrite the folded dir.
    The merged partials are tiny (d·w + 2^p + k rows), so they are
    collected and rewritten as literal frames — no self-read-overwrite
    hazard. Mixed-mode quantile layouts fail fast via the strict read
    BEFORE anything is rewritten."""
    from pyspark.sql import functions as F

    marker = _compaction_marker(spark, target_dir)
    fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(marker):
        raise ValueError(
            f"compaction marker {marker} exists — a previous compaction "
            "died between the fold rewrite and the batch-dir cleanup, "
            "so the lowest batch dir already holds the folded totals "
            "while later dirs still hold their partials. Delete the "
            "surviving later batch= dirs and the marker, then retry."
        )
    dirs = _batch_dirs(spark, target_dir)
    if len(dirs) < 2:
        return 0
    # strict qsk read first: raise on mixed-mode BEFORE any rewrite
    qsk = _read_partials(spark, target_dir, "qsk", QSK_SCHEMA, strict=True)
    cms = (
        _read_partials(spark, target_dir, "cms", CMS_SCHEMA)
        .groupBy("j", "slot").agg(F.sum("cnt").alias("cnt")).collect()
    )
    hll = (
        _read_partials(spark, target_dir, "hll", HLL_SCHEMA)
        .groupBy("bucket").agg(F.max("rho").alias("rho")).collect()
    )
    qsk_rows = qsk.orderBy("h", "x").limit(QSK_K).collect()
    has_qsk = bool(qsk_rows)
    low = min(dirs, key=lambda d: int(d.rsplit("batch=", 1)[1]))
    fs.create(marker, True).close()
    spark.createDataFrame(
        [tuple(r) for r in cms] or [], CMS_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{low}/cms")
    spark.createDataFrame(
        [tuple(r) for r in hll] or [], HLL_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{low}/hll")
    if has_qsk:
        spark.createDataFrame(
            [tuple(r) for r in qsk_rows], QSK_SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(f"{low}/qsk")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    removed = 0
    for d in dirs:
        if d == low:
            continue
        p = jvm.org.apache.hadoop.fs.Path(d)
        p.getFileSystem(hconf).delete(p, True)
        removed += 1
    fs.delete(marker, False)
    return removed


def _compaction_marker(spark: SparkSession, target_dir: str):
    return spark._jvm.org.apache.hadoop.fs.Path(
        f"{target_dir}/_COMPACTING"
    )


def read_merged_cms(spark: SparkSession, target_dir: str) -> DataFrame:
    """(j, slot, cnt): the merged Count-Min matrix — counters ADD across
    batches. Identical to ``cms_counters`` over the concatenated stream
    (pinned in tests), because counter addition is associative."""
    from pyspark.sql import functions as F

    return (
        _read_partials(spark, target_dir, "cms", CMS_SCHEMA)
        .groupBy("j", "slot")
        .agg(F.sum("cnt").alias("cnt"))
    )


def read_merged_hll(spark: SparkSession, target_dir: str) -> DataFrame:
    """(bucket, rho): the merged HLL register table — registers MAX
    across batches. Identical to ``hll_registers`` over the concatenated
    stream; feed to ``hll_estimate_from_registers`` for the estimate."""
    from pyspark.sql import functions as F

    return (
        _read_partials(spark, target_dir, "hll", HLL_SCHEMA)
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def read_merged_quantile_sample(
    spark: SparkSession, target_dir: str, k: int = QSK_K
) -> DataFrame:
    """(h, x): the merged k-minimum-hash quantile sample — the k
    smallest (h, x) of all batches' samples, which (given row-unique
    keys) is identical to ``hash_sample_rows`` over the concatenated
    stream (pinned in tests); feed to
    ``operators.sketches.quantile_rows_from_sample`` for estimates."""
    return (
        _read_partials(spark, target_dir, "qsk", QSK_SCHEMA, strict=True)
        .orderBy("h", "x")
        .limit(k)
    )
