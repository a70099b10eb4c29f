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
    marker = _compaction_marker(spark, target_dir)
    if marker.getFileSystem(
        spark._jsc.hadoopConfiguration()
    ).exists(marker):
        raise ValueError(
            f"compaction marker {marker} exists — batches written now "
            "would be swept up by the crashed compaction's recovery; "
            "run compact_sketch_batches(spark, target_dir) to "
            "auto-recover before restarting the stream."
        )
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
            "mid-way, so merging now could double-count; run "
            "compact_sketch_batches(spark, target_dir) to auto-recover, "
            "then read again."
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
        newest = max(batch_dirs,
                     key=lambda d: int(d.rsplit("batch=", 1)[1]))
        if missing == [newest]:
            # the sink writes this partial LAST, so a gap in only the
            # newest batch is the signature of an in-flight/crashed
            # write, not of mixed modes — a replay heals it
            raise ValueError(
                f"only the newest batch dir {newest!r} lacks a {sub!r} "
                "partial — most likely the sink crashed mid-batch. "
                "Restart the stream with the SAME checkpoint so the "
                "batch replays and rewrites its partials, then read "
                "again."
            )
        raise ValueError(
            f"{len(missing)} of {len(batch_dirs)} batch dirs under "
            f"{target_dir!r} lack a {sub!r} partial (e.g. {missing[0]!r})"
            " — the stream ran batches without this sketch enabled, and "
            "those batches' samples are gone (they were never taken); "
            "merging only the batches that have one would silently "
            "misrepresent the stream. Re-run from a fresh target with "
            "the sketch enabled throughout."
        )
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def compact_sketch_batches(spark: SparkSession, target_dir: str) -> int:
    """Fold every batch's sketch partials into ONE batch dir (the lowest
    id) and delete the rest — the periodic job the module docstring
    promises to bound read-side fan-in (the merges are associative:
    counters add, registers max, quantile samples keep the k smallest).
    Returns the number of batch dirs removed, net (0 = nothing to fold).

    Run against a QUIESCED stream whose last batch committed, and keep
    the original checkpoint: folding into the lowest id means a replay
    of the newest uncommitted batch can never overwrite the folded dir.

    Crash safety — the fold NEVER overwrites live data in place: the
    merged partials (tiny: d·w + 2^p + k rows) are first written to a
    ``_fold`` staging dir; only then is a marker recording the target
    batch id created, the original batch dirs deleted, and the staging
    dir renamed into place. A crash before the marker leaves the
    original dirs untouched (a stale ``_fold`` is simply overwritten
    next time); a crash after it is finished AUTOMATICALLY by the next
    call — the staging dir holds the complete fold, so recovery deletes
    the remaining originals and renames, losing nothing. No step ever
    asks an operator to remove data by hand. Mixed-mode quantile
    layouts fail fast via the strict read BEFORE anything is written."""
    import json

    from pyspark.sql import functions as F

    marker = _compaction_marker(spark, target_dir)
    fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(marker):
        return _recover_sketch_compaction(spark, target_dir)
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
    # the fold must mirror the stream's MODE, not this window's data: a
    # value_col stream whose batches all carried zero rows still has qsk
    # dirs everywhere, and omitting the folded one would make a later
    # strict read see batch=<low_id> as mode-less next to newer batches
    # and raise the mixed-mode error on a stream that never mixed modes
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    had_qsk = any(
        (lambda p: p.getFileSystem(hconf).exists(p))(
            jvm.org.apache.hadoop.fs.Path(f"{d}/qsk")
        )
        for d in dirs
    )
    low_id = min(int(d.rsplit("batch=", 1)[1]) for d in dirs)
    fold = f"{target_dir}/_fold"
    spark.createDataFrame(
        [tuple(r) for r in cms] or [], CMS_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{fold}/cms")
    spark.createDataFrame(
        [tuple(r) for r in hll] or [], HLL_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{fold}/hll")
    if had_qsk:
        spark.createDataFrame(
            [tuple(r) for r in qsk_rows] or [], QSK_SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(f"{fold}/qsk")
    out = fs.create(marker, True)
    out.write(bytearray(json.dumps({"low_id": low_id}).encode()))
    out.close()
    _finish_sketch_fold(spark, target_dir, low_id, dirs)
    return len(dirs) - 1


def _finish_sketch_fold(spark, target_dir: str, low_id: int,
                        dirs: list[str] | None = None) -> None:
    """Post-staging tail of the fold: delete the original batch dirs
    (exactly the set that was folded when the caller knows it; recovery
    re-lists, safe because the marker blocks the sink from adding new
    batches in between), rename ``_fold`` to ``batch=<low_id>``, clear
    the marker. When the staging dir is already gone, the rename
    happened before the crash — ``batch=<low_id>`` IS the folded result
    and must survive; only stragglers with other ids (there should be
    none) are dropped."""
    jvm = spark._jvm
    marker = _compaction_marker(spark, target_dir)
    fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
    fold = jvm.org.apache.hadoop.fs.Path(f"{target_dir}/_fold")
    fold_pending = fs.exists(fold)
    for d in (dirs if dirs is not None
              else _batch_dirs(spark, target_dir)):
        if not fold_pending and d.endswith(f"batch={low_id}"):
            continue
        p = jvm.org.apache.hadoop.fs.Path(d)
        fs.delete(p, True)
    if fold_pending:
        fs.rename(fold, jvm.org.apache.hadoop.fs.Path(
            f"{target_dir}/batch={low_id}"
        ))
    fs.delete(marker, False)


def _recover_sketch_compaction(spark, target_dir: str) -> int:
    """Finish a fold whose marker survived a crash: the marker is only
    created once the ``_fold`` staging dir holds the COMPLETE merge, so
    recovery just replays the cleanup/rename tail (idempotent — a crash
    after the rename but before the marker delete leaves no ``_fold``
    and the rename is skipped)."""
    import json

    marker = _compaction_marker(spark, target_dir)
    fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(marker)
    try:
        raw = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    try:
        info = json.loads(raw or "{}")
    except json.JSONDecodeError:
        # torn marker write (partial JSON): close() never completed, so
        # the cleanup that strictly follows it cannot have run — same
        # recovery as the missing-key case, not an unhandled parse error
        info = {}
    if "low_id" not in info:
        # crash between marker creation and its single write: the
        # cleanup (which strictly follows the close) cannot have run and
        # the originals are intact — clear the marker and fold normally
        fs.delete(marker, False)
        return compact_sketch_batches(spark, target_dir)
    removed = len(_batch_dirs(spark, target_dir))
    _finish_sketch_fold(spark, target_dir, int(info["low_id"]))
    return max(removed - 1, 0)


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
