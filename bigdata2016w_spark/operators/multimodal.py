"""Multimodal (image/audio/video) column plumbing — pipeline extension.

Design: media travel as opaque ``binary`` columns next to typed metadata
(the lakehouse pattern), and every decode/feature step is an Arrow-batched
``mapInPandas`` whose *Spark-side contract* — schema, batch shape,
partitioning — is real and tested.

``decode_image`` is a REAL decoder for the two headerful uncompressed
raster formats parseable with numpy alone (no imaging library in this
container): binary PPM (P6) and uncompressed 24/32-bit BMP. The
registered query renders genuine P6 payloads from the documents table
(``documents_as_ppm``) and decodes them with it — header-parsed
dimensions, pixel-averaged intensity, no injected stand-in. Compressed
formats (PNG/JPEG) still need an injected codec via
``image_features(..., decoder=...)``; ``fake_decode_image`` remains for
exercising that injection seam in tests.

At scale this shape matters more than the codec: binary payloads stay in
Arrow record batches end-to-end (no per-row pickling), metadata predicates
prune before any decode runs, and ``spark.sql.files.maxPartitionBytes`` /
``repartition`` control how many media blobs land in one Python worker
batch.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int, float]:
    """Real decoder — (width, height, mean_intensity) for binary PPM (P6)
    and uncompressed 24/32-bit BMP, parsed with numpy alone.

    Compressed formats (PNG/JPEG/...) need a codec library this container
    lacks — inject one via ``image_features(..., decoder=...)``.
    """
    import numpy as np

    if payload[:2] == b"P6":
        # header: b"P6" <ws> width <ws> height <ws> maxval <single ws> raster
        fields, pos = [], 2
        while len(fields) < 3:
            while payload[pos] in b" \t\r\n":
                pos += 1
            if payload[pos] == 0x23:  # '#' comment line
                pos = payload.index(b"\n", pos) + 1
                continue
            end = pos
            while payload[end] not in b" \t\r\n":
                end += 1
            fields.append(int(payload[pos:end]))
            pos = end
        pos += 1  # the single whitespace byte after maxval
        width, height, maxval = fields
        raster = np.frombuffer(payload, np.uint8, count=width * height * 3,
                               offset=pos)
        mean = float(int(raster.sum(dtype=np.int64))
                     / raster.size) / float(maxval)
        return width, height, mean
    if payload[:2] == b"BM":
        data_off = int(np.frombuffer(payload, "<u4", 1, 10)[0])
        width = int(np.frombuffer(payload, "<i4", 1, 18)[0])
        height = abs(int(np.frombuffer(payload, "<i4", 1, 22)[0]))
        bpp = int(np.frombuffer(payload, "<u2", 1, 28)[0])
        if bpp not in (24, 32):
            raise ValueError(f"unsupported BMP bit depth {bpp}")
        step = bpp // 8
        row_bytes = (width * step + 3) & ~3  # rows pad to 4-byte boundary
        px = np.frombuffer(payload, np.uint8, count=row_bytes * height,
                           offset=data_off)
        rows = px.reshape(height, row_bytes)[:, : width * step]
        rgb = rows.reshape(height, width, step)[:, :, :3]  # drop alpha
        mean = float(int(rgb.sum(dtype=np.int64)) / rgb.size) / 255.0
        return width, height, mean
    raise ValueError(
        "unsupported image format (PPM P6 and uncompressed BMP decode "
        "natively; inject decoder= for compressed codecs)"
    )


def fake_decode_image(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in decoder for tests: derives a fake geometry
    and intensity from the payload bytes alone."""
    n = len(payload)
    width = (n % 64) + 1
    height = (n // 64) % 64 + 1
    mean_intensity = (sum(payload[:256]) / max(min(n, 256), 1)) / 255.0
    return width, height, mean_intensity


def image_features(
    media: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, float]] | None = None,
) -> DataFrame:
    """media(media_id long, payload binary) → per-image features.

    Arrow-batched ``mapInPandas``: one Python invocation per record batch,
    bytes arrive zero-copy-ish from the JVM, output conforms to
    IMAGE_FEATURES_SCHEMA.
    """
    decode = decoder or decode_image

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "mean_intensity": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* skeleton: declares the output shape
    (media_id, frame_idx, frame binary) and the partition strategy; frame
    extraction itself is the injected decoder's job.

    Shown here as the explode of a computed frame-index array — the real
    pipeline replaces the payload slicing with codec output.
    """
    n_frames = (F.length("payload") / F.lit(1024)).cast("int") + 1
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias(
            "frame_idx"
        ),
        F.col("payload").alias("frame"),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests: treat document text bytes as opaque payloads
    (the engine has no binary testdata column — FIXTURES.md)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def documents_as_ppm(docs: DataFrame) -> DataFrame:
    """Render each document into a GENUINE binary-PPM (P6) image payload,
    entirely JVM-side: raster dimensions derived from the text length
    (width 2–32, height 2–16), pixel bytes = the text's ASCII bytes
    rpad-truncated to exactly width·height·3. ``decode_image`` then
    parses the actual P6 header — the deterministic binary-column twin of
    an image-bearing lakehouse table, derived from testdata."""
    w = F.length("text") % 31 + 2
    h = F.length("text") % 15 + 2
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"),
    )
    raster = F.expr(
        "rpad(text, (length(text) % 31 + 2) * (length(text) % 15 + 2) * 3, ' ')"
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.concat(header, raster), "UTF-8").alias("payload"),
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("energy", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def decode_audio(payload: bytes) -> tuple[int, int, int, float, int, int, int]:
    """Real RIFF/WAVE PCM parser (numpy alone): walks the chunk list,
    reads ``fmt `` and ``data``, supports 8-bit unsigned and 16-bit
    signed PCM, mono or interleaved multi-channel.

    Returns (n_channels, sample_rate, n_samples_per_channel, duration_s,
    energy, peak, zero_crossings). Energy/peak/crossings run on the
    FIRST channel in exact integer arithmetic (samples centered per the
    PCM convention: −128 for 8-bit, as-is for 16-bit), so the features
    are bit-stable and, for known payloads, SQL-expressible.
    """
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("unsupported audio format (RIFF/WAVE PCM only)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int(np.frombuffer(payload, "<u4", 1, pos + 4)[0])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int(np.frombuffer(fmt, "<u2", 1, 0)[0])
    if audio_format != 1:
        raise ValueError(f"unsupported (non-PCM) audio format {audio_format}")
    n_channels = int(np.frombuffer(fmt, "<u2", 1, 2)[0])
    sample_rate = int(np.frombuffer(fmt, "<u4", 1, 4)[0])
    bits = int(np.frombuffer(fmt, "<u2", 1, 14)[0])
    if bits == 8:
        centered = np.frombuffer(data, np.uint8).astype(np.int64) - 128
    elif bits == 16:
        centered = np.frombuffer(
            data[: len(data) & ~1], "<i2"
        ).astype(np.int64)
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    ch0 = centered[::n_channels]
    n_samples = int(ch0.size)
    energy = int((ch0 * ch0).sum())
    peak = int(np.abs(ch0).max()) if n_samples else 0
    crossings = int(((ch0[:-1] * ch0[1:]) < 0).sum()) if n_samples > 1 else 0
    return (n_channels, sample_rate, n_samples,
            n_samples / sample_rate, energy, peak, crossings)


def audio_features(
    media: DataFrame,
    decoder: Callable[[bytes], tuple] | None = None,
) -> DataFrame:
    """media(media_id long, payload binary) → per-clip PCM features via
    Arrow-batched ``mapInPandas`` (same contract as ``image_features``:
    map-only, no shuffle, decode cost linear in payload bytes)."""
    decode = decoder or decode_audio

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_channels": [f[0] for f in feats],
                    "sample_rate": [f[1] for f in feats],
                    "n_samples": [f[2] for f in feats],
                    "duration_s": [f[3] for f in feats],
                    "energy": [f[4] for f in feats],
                    "peak": [f[5] for f in feats],
                    "zero_crossings": [f[6] for f in feats],
                }
            )

    return media.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


WAV_RATE = 8000


def documents_as_wav(docs: DataFrame) -> DataFrame:
    """Render each document into a GENUINE 8-bit PCM mono RIFF/WAVE
    payload: sample i = ascii(text[i]) + 64 (so the waveform straddles
    the unsigned-PCM midpoint 128 and zero-crossing counts are
    non-trivial). Rendering runs in the same Arrow-batched
    ``mapInPandas`` tier as decoding — binary headers with little-endian
    sizes are a codec concern, not an expression concern. The decoded
    features remain exactly expressible in SQL from the text column,
    which keeps the full render→decode pipeline under the driver's
    value-hash gate."""
    import struct

    def render(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def wav(text: str) -> bytes:
            samples = bytes((ord(c) + 64) & 0xFF for c in text)
            n = len(samples)
            return (
                b"RIFF" + struct.pack("<I", 36 + n) + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE, 1, 8)
                + b"data" + struct.pack("<I", n) + samples
            )

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].values,
                    "payload": [wav(t) for t in pdf["text"]],
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(render, schema)
