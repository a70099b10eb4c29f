"""Multimodal plumbing (stubbed decode, real Arrow pipeline) + sinks."""

import pytest
from pyspark.sql import functions as F


def test_image_features_pipeline(spark, sf_dir):
    """mapInPandas media pipeline: schema, determinism, batch shape."""
    from bigdata2016w_spark.operators.multimodal import (
        documents_as_media,
        fake_decode_image,
        image_features,
    )
    from bigdata2016w_spark.sources.catalog import load_table

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = image_features(media, decoder=fake_decode_image)
    assert feats.columns == ["media_id", "width", "height", "n_bytes",
                             "mean_intensity"]
    rows = {r.media_id: r for r in feats.collect()}
    docs = {r.doc_id: r.text for r in
            load_table(spark, sf_dir, "documents").collect()}
    assert set(rows) == set(docs)
    # determinism + agreement with a local call
    some_id = min(docs)
    w, h, mi = fake_decode_image(docs[some_id].encode())
    r = rows[some_id]
    assert (r.width, r.height) == (w, h)
    assert r.mean_intensity == pytest.approx(mi, abs=1e-12)
    assert r.n_bytes == len(docs[some_id].encode())


@pytest.mark.parametrize("name", ["media_image_features", "media_frame_sample"])
def test_multimodal_queries_match_oracle(name, spark, sf_dir, duck):
    """Registered multimodal queries hash-match their DuckDB oracles
    (fake decoder byte math transcribed to SQL — documents.text is ASCII)."""
    from bigdata2016w_spark.registry import all_specs

    from tests.oracle import compare_spark_duckdb

    spec = all_specs()[name]
    out = spec.fn(spark, sf_dir)
    assert out.count() > 0
    compare_spark_duckdb(out, duck, spec.oracle)


def test_decode_image_parses_real_ppm():
    from bigdata2016w_spark.operators.multimodal import decode_image

    # 2x2 P6, maxval 255, raster = 12 known bytes (incl. a header comment)
    raster = bytes([0, 255, 0, 255, 0, 0, 10, 20, 30, 40, 50, 60])
    payload = b"P6\n# comment\n2 2\n255\n" + raster
    w, h, mean = decode_image(payload)
    assert (w, h) == (2, 2)
    assert mean == pytest.approx(sum(raster) / 12 / 255.0, abs=1e-15)


def test_decode_image_parses_real_bmp():
    import struct

    from bigdata2016w_spark.operators.multimodal import decode_image

    # minimal 24-bit BMP, 2x1 (row pads to 8 bytes): pixels BGR
    row = bytes([10, 20, 30, 40, 50, 60, 0, 0])
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(row), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, len(row), 2835, 2835, 0, 0
    )
    w, h, mean = decode_image(header + row)
    assert (w, h) == (2, 1)
    assert mean == pytest.approx(sum([10, 20, 30, 40, 50, 60]) / 6 / 255.0,
                                 abs=1e-15)


def test_decode_image_rejects_compressed_formats():
    from bigdata2016w_spark.operators.multimodal import decode_image

    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n")


def test_documents_as_ppm_payloads_are_real_p6(spark, sf_dir):
    """The registered query's payloads decode as genuine P6 images whose
    raster mean equals the text-byte math (space padding = ascii 32)."""
    from bigdata2016w_spark.operators.multimodal import (
        decode_image,
        documents_as_ppm,
    )
    from bigdata2016w_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    texts = {r.doc_id: r.text for r in docs.limit(50).collect()}
    payloads = {
        r.media_id: bytes(r.payload)
        for r in documents_as_ppm(docs.limit(50)).collect()
    }
    for mid, payload in payloads.items():
        w, h, mean = decode_image(payload)
        t = texts[mid]
        assert (w, h) == (len(t) % 31 + 2, len(t) % 15 + 2)
        npix = w * h * 3
        pix = t.encode()[:npix].ljust(npix, b" ")
        assert mean == pytest.approx(sum(pix) / npix / 255.0, abs=1e-15)


def test_frame_sample_plan(spark):
    from bigdata2016w_spark.operators.multimodal import frame_sample_plan

    media = spark.createDataFrame(
        [(1, bytearray(b"x" * 2500))], ["media_id", "payload"]
    )
    rows = frame_sample_plan(media, every_n=1).collect()
    # 2500 bytes → 3 "frames" at 1024-byte stride
    assert [r.frame_idx for r in rows] == [0, 1, 2]


def test_postings_sink_roundtrip(spark, sf_dir, tmp_path):
    """Sorted/bloom-filtered postings parquet: write, point-lookup read."""
    from bigdata2016w_spark.operators.retrieval import postings_flat
    from bigdata2016w_spark.sources.catalog import load_table
    from bigdata2016w_spark.sources.sinks import write_postings

    p = postings_flat(load_table(spark, sf_dir, "documents"))
    out = str(tmp_path / "postings")
    write_postings(p, out)
    back = spark.read.parquet(out)
    assert back.where(F.col("term") == "table").count() == \
        p.where(F.col("term") == "table").count()
    assert back.count() == p.count()


def test_range_partitioned_write_layout(spark, tmp_path):
    """RangePartitioner parity: each output file must hold a disjoint,
    internally sorted key range (concatenation in range order = total
    order; min/max stats prune point reads to one file)."""
    from bigdata2016w_spark.sources.sinks import write_range_partitioned

    df = spark.range(0, 10_000).select(
        (F.col("id") * 2654435761 % 10_000).alias("k"),
        F.col("id").alias("v"),
    )
    out = str(tmp_path / "ranged")
    write_range_partitioned(df, out, ["k"], num_partitions=8)

    back = (
        spark.read.parquet(out)
        .select("k", F.input_file_name().alias("f"))
        .collect()
    )
    by_file: dict[str, list[int]] = {}
    for r in back:
        by_file.setdefault(r.f, []).append(r.k)
    assert len(by_file) > 1
    # in-file order preserved by parquet: each file must be sorted
    for ks in by_file.values():
        assert ks == sorted(ks)
    # disjoint ranges across files
    spans = sorted((min(ks), max(ks)) for ks in by_file.values())
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo
    # nothing lost
    assert sum(len(ks) for ks in by_file.values()) == 10_000


def test_text_golden_sink(spark, tmp_path):
    from bigdata2016w_spark.sources.sinks import write_text_golden

    df = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    out = str(tmp_path / "golden")
    write_text_golden(df.coalesce(1), out)
    back = spark.read.option("sep", "\t").csv(out)
    assert sorted(tuple(r) for r in back.collect()) == [("a", "1"), ("b", "2")]
    # overwrite mode: second write replaces, not fails
    write_text_golden(df.coalesce(1), out)


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    """64-file fragmented table -> compaction to the byte-target file
    count with identical contents."""
    from bigdata2016w_spark.sources.catalog import load_table
    from bigdata2016w_spark.sources.sinks import compact_parquet

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "fragmented")
    orders.repartition(64).write.parquet(path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    n_parts_before = len(
        [f for f in __import__("os").listdir(path) if f.endswith(".parquet")]
    )
    assert n_parts_before == 64

    n = compact_parquet(spark, path, target_file_bytes=1 * 1024 * 1024)
    n_parts_after = len(
        [f for f in __import__("os").listdir(path) if f.endswith(".parquet")]
    )
    assert n_parts_after == n < 64
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before
