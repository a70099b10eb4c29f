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


def test_real_decoder_is_stubbed():
    from bigdata2016w_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


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


def test_text_golden_sink(spark, tmp_path):
    from bigdata2016w_spark.sources.sinks import write_text_golden

    df = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    out = str(tmp_path / "golden")
    write_text_golden(df.coalesce(1), out)
    back = spark.read.option("sep", "\t").csv(out)
    assert sorted(tuple(r) for r in back.collect()) == [("a", "1"), ("b", "2")]
    # overwrite mode: second write replaces, not fails
    write_text_golden(df.coalesce(1), out)
