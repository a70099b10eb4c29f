"""Oracle parity + semantics for the registry-tail extension queries
(per-source reservoir sample, exact-integer rolling anomalies, bigram LM)."""

import math

import pytest
from pyspark.sql import functions as F

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb

EXT = [
    "documents_reservoir_by_source",
    "events_user_value_anomalies",
    "doc_bigram_surprisal",
    "bpe_apply_closed_form",
]


@pytest.mark.parametrize("name", EXT)
def test_corpus_ext_matches_oracle(name, spark, sf_dir, duck):
    spec = all_specs()[name]
    assert spec.oracle is not None
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_reservoir_sizes_and_stability(spark, sf_dir):
    from bigdata2016w_spark.plans.corpus_ext import (
        RESERVOIR_K, documents_reservoir_by_source)
    from bigdata2016w_spark.sources.catalog import load_table

    out = documents_reservoir_by_source(spark, sf_dir).collect()
    sizes = {}
    for r in out:
        sizes[r.source] = sizes.get(r.source, 0) + 1
    group_n = {
        r.source: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {s: min(RESERVOIR_K, n) for s, n in group_n.items()}
    # the selection must be a pure function of the rows, not the layout
    again = documents_reservoir_by_source(spark, sf_dir)
    assert sorted(map(tuple, out)) == sorted(map(tuple, again.collect()))


def test_anomaly_flags_known_outlier(spark):
    # 19 calm events then a spike: mean=10, sd≈0.94 over the window —
    # 200.0 is far beyond 3σ; the calm rows must not be flagged
    from bigdata2016w_spark.plans.corpus_ext import events_user_value_anomalies
    rows = [(i, 1, float(10 + (i % 3)), f"2024-01-01 00:{i:02d}:00")
            for i in range(19)]
    rows.append((99, 1, 200.0, "2024-01-01 00:59:00"))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, ts string"
    ).select("event_id", "user_id", "value",
             F.col("ts").cast("timestamp_ntz").alias("ts"),
             F.lit("x").alias("event_type"), F.lit("{}").alias("props"))
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = events_user_value_anomalies(spark, d).collect()
    assert [r.event_id for r in out] == [99]
    assert out[0].n_window == 19


def test_bigram_lm_matches_python_fold(spark):
    # tiny corpus, bitwise parity against a literal Python implementation
    from bigdata2016w_spark.plans.corpus_ext import LM_QUANT, bigram_lm_scores
    corpus = {1: "a b a b c", 2: "b c b c", 3: "a a a"}
    docs = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_bigrams, r.avg_bigram_nll)
           for r in bigram_lm_scores(docs).collect()}

    toks = {k: v.split() for k, v in corpus.items()}
    c12, c1 = {}, {}
    for t in toks.values():
        for a, b in zip(t, t[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    v = len({w for t in toks.values() for w in t})
    for k, t in toks.items():
        sus = [
            round(-math.log((c12[(a, b)] + 1) / (c1[a] + v)) * LM_QUANT)
            for a, b in zip(t, t[1:])
        ]
        n = len(sus)
        assert got[k] == (n, round(sum(sus) / n / LM_QUANT, 6))


def test_pack_sequences_matches_oracle(spark, sf_dir, duck):
    spec = all_specs()["documents_pack_sequences"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_pack_sequences_is_a_partition_of_the_token_stream(spark, sf_dir):
    """Within every (source, shard) lane the docs must tile the
    concatenated token stream exactly: each doc starts where the
    previous ended, chunk indices follow from the running offset."""
    from bigdata2016w_spark.plans.corpus_ext import (
        PACK_BUDGET, documents_pack_sequences)

    rows = documents_pack_sequences(spark, sf_dir).collect()
    lanes = {}
    for r in rows:
        lanes.setdefault((r.source, r.shard), []).append(r)
    assert lanes
    for lane in lanes.values():
        lane.sort(key=lambda r: r.doc_id)
        pos = 0
        for r in lane:
            assert r.start_offset == pos % PACK_BUDGET
            assert r.chunk_first == pos // PACK_BUDGET
            assert r.chunk_last == (pos + r.n_tokens - 1) // PACK_BUDGET
            pos += r.n_tokens


def test_audio_features_match_oracle(spark, sf_dir, duck):
    spec = all_specs()["media_audio_features"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_decode_audio_16bit_stereo():
    """The PCM parser must handle 16-bit interleaved stereo too — crafted
    payload, features checked against hand arithmetic on channel 0."""
    import struct

    import numpy as np

    from bigdata2016w_spark.operators.multimodal import decode_audio

    ch0 = np.array([100, -200, 300, -1, 5], dtype="<i2")
    ch1 = np.array([7, 7, 7, 7, 7], dtype="<i2")
    inter = np.empty(10, dtype="<i2")
    inter[0::2], inter[1::2] = ch0, ch1
    data = inter.tobytes()
    payload = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 44100 * 4, 4, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    nch, rate, n, dur, energy, peak, zc = decode_audio(payload)
    assert (nch, rate, n) == (2, 44100, 5)
    assert dur == 5 / 44100
    assert energy == int((ch0.astype(np.int64) ** 2).sum())
    assert peak == 300
    assert zc == 4


def _python_bpe(word_freqs, n_merges):
    """Literal Sennrich-style BPE fold (reference oracle)."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for r in range(1, n_merges + 1):
        pairs = {}
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (l, rt), pf = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, l, rt, pf))
        new = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == l and sym[i + 1] == rt:
                    out.append(l + rt)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
    return merges


def test_bpe_matches_python_fold(spark, sf_dir):
    from collections import Counter

    from bigdata2016w_spark.functions.tokenizer import tokenize
    from bigdata2016w_spark.plans.corpus_ext import bpe_merge_table
    from bigdata2016w_spark.sources.catalog import load_table
    import pyspark.sql.functions as F

    got = [
        (r.round, r.left, r.right, r.pair_freq)
        for r in bpe_merge_table(spark, sf_dir).collect()
    ]
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokenize("text")).alias("w")).collect()
    )
    want = _python_bpe(Counter(r.w for r in toks), 10)
    assert got == want
    assert len(got) == 10


def test_merge_fold_greedy_nonoverlap(spark):
    """Pin the one subtle semantic of the shared JVM merge fold (used by
    both bpe_learn and bpe_apply_closed_form): merges are greedy
    left-to-right and NON-overlapping — 'aaa' under (a,a) is [aa, a],
    never [a, aa] or [aa, aa]; and a merged symbol can immediately feed
    a later merge pass but not the current one."""
    from bigdata2016w_spark.plans.corpus_ext import _merge_fold

    def apply_fold(word, pairs):
        df = spark.createDataFrame([(word,)], "word string").select(
            F.expr("transform(sequence(1, length(word)),"
                   " i -> substring(word, i, 1))").alias("sym")
        )
        for left, right in pairs:
            df = df.select(F.expr(_merge_fold(left, right)).alias("sym"))
        return df.collect()[0].sym

    assert apply_fold("aaa", [("a", "a")]) == ["aa", "a"]
    assert apply_fold("aaaa", [("a", "a")]) == ["aa", "aa"]
    assert apply_fold("aaaaa", [("a", "a")]) == ["aa", "aa", "a"]
    # chained merge: second pass consumes the first pass's output
    assert apply_fold("aaaa", [("a", "a"), ("aa", "aa")]) == ["aaaa"]
    # boundary safety: (b, c) must not fire inside symbol 'ab'
    assert apply_fold("abc", [("a", "b"), ("b", "c")]) == ["ab", "c"]
    # trailing unmerged symbol survives
    assert apply_fold("aba", [("a", "b")]) == ["ab", "a"]


def test_bpe_learns_multichar_units(spark, sf_dir):
    """After a few rounds, merges must chain (some left/right symbol is
    itself a previous merge's output) — the defining BPE behavior."""
    from bigdata2016w_spark.plans.corpus_ext import bpe_merge_table

    rows = bpe_merge_table(spark, sf_dir).collect()
    assert any(len(r.left) > 1 or len(r.right) > 1 for r in rows)


def test_covariance_stats_match_oracle(spark, sf_dir, duck):
    spec = all_specs()["embedding_covariance_stats"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_covariance_stats_reconstruct_numpy_pca(spark, sf_dir):
    """Assembling the stats must reproduce numpy's covariance of the
    quantized data exactly, and its eigenvalues must be a valid PCA
    spectrum (non-negative, trace-preserving)."""
    import numpy as np

    from bigdata2016w_spark.plans.corpus_ext import (
        EMB_QUANT, embedding_covariance_stats)
    from bigdata2016w_spark.sources.catalog import load_table

    rows = embedding_covariance_stats(spark, sf_dir).collect()
    d = max(r.j for r in rows)
    n = rows[0].n
    cov = np.zeros((d, d))
    for r in rows:
        c = (r.sum_xy - r.sum_x * r.sum_y / n) / (n - 1)
        cov[r.i - 1, r.j - 1] = cov[r.j - 1, r.i - 1] = c

    x = np.array(
        [r.embedding for r in
         load_table(spark, sf_dir, "embeddings").collect()]
    )
    xq = np.floor(x * EMB_QUANT)
    want = np.cov(xq, rowvar=False)
    assert np.allclose(cov, want, rtol=0, atol=1e-6 * np.abs(want).max())

    evals = np.linalg.eigvalsh(cov)
    assert (evals > -1e-6 * evals.max()).all()
    assert np.isclose(evals.sum(), np.trace(cov))


def test_hybrid_rrf_matches_oracle(spark, sf_dir, duck):
    spec = all_specs()["hybrid_search_rrf"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_hybrid_rrf_fuses_both_retrievers(spark, sf_dir):
    """The fused list must actually mix the two signals: some results
    from each side, and any doc ranked by both outranks the RRF of a
    doc seen by only one side at equal rank."""
    from bigdata2016w_spark.plans.corpus_ext import hybrid_search_rrf

    rows = hybrid_search_rrf(spark, sf_dir).collect()
    assert rows
    assert any(r.r_lex is not None for r in rows)
    assert any(r.r_vec is not None for r in rows)
    for r in rows:
        expected = (1 / (60 + r.r_lex) if r.r_lex else 0) + (
            1 / (60 + r.r_vec) if r.r_vec else 0
        )
        assert abs(r.rrf_score - expected) < 1e-12


def test_skipgram_matches_oracle(spark, sf_dir, duck):
    spec = all_specs()["skipgram_training_pairs"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_skipgram_positive_counts_are_symmetric_window(spark):
    """On a crafted doc the positive pairs must be exactly the +-2 window
    co-occurrences, and every center must carry label-0 negatives."""
    import tempfile

    from bigdata2016w_spark.plans.corpus_ext import skipgram_training_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d", "en", "s", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        rows = skipgram_training_pairs(spark, d).collect()
    pos = {(r.center, r.context): r.cnt for r in rows if r.label == 1}
    # a: b,c ; b: a,c,d ; c: a,b,d ; d: b,c
    want = {
        ("a", "b"): 1, ("a", "c"): 1,
        ("b", "a"): 1, ("b", "c"): 1, ("b", "d"): 1,
        ("c", "a"): 1, ("c", "b"): 1, ("c", "d"): 1,
        ("d", "b"): 1, ("d", "c"): 1,
    }
    assert pos == want
    negs = [r for r in rows if r.label == 0]
    assert negs and all(r.context != r.center for r in negs)


def test_anomaly_survives_extreme_values_and_matches_oracle(spark, tmp_path):
    """$150k+ events would overflow a raw-int64 z-test product (Spark
    wraps, DuckDB errors); the DECIMAL/HUGEINT widening must keep both
    engines exact and in agreement."""
    import duckdb

    from bigdata2016w_spark.plans.corpus_ext import events_user_value_anomalies
    from bigdata2016w_spark.registry import all_specs
    from tests.oracle import compare_spark_duckdb

    rows = [(i, 1, 150_000.0 + (i % 5), f"2024-01-01 00:{i:02d}:00")
            for i in range(20)]
    rows.append((99, 1, 900_000.0, "2024-01-01 00:30:00"))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, ts string"
    ).selectExpr("event_id", "user_id", "value",
                 "cast(ts as timestamp_ntz) as ts",
                 "'x' as event_type", "'{}' as props")
    d = tmp_path / "big"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    spec = all_specs()["events_user_value_anomalies"]
    compare_spark_duckdb(events_user_value_anomalies(spark, str(d)),
                         con, spec.oracle)
    got = events_user_value_anomalies(spark, str(d)).collect()
    assert [r.event_id for r in got] == [99]
    con.close()


def test_stream_anomaly_rounds_half_away_like_batch(spark, tmp_path):
    """value 10.125 quantizes to 1013 cents under HALF_UP (batch/DuckDB);
    Python's banker's rounding would give 1012 — the stream must match
    the batch on such ties."""
    from bigdata2016w_spark.plans.corpus_ext import events_user_value_anomalies
    from bigdata2016w_spark.streaming.stateful import rolling_anomalies

    rows = [(i, 1, 10.125, f"2024-01-01 00:{i:02d}:00") for i in range(12)]
    rows.append((99, 1, 10.125 + 50.0, "2024-01-01 00:20:00"))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, ts string"
    ).selectExpr("event_id", "user_id", "value",
                 "cast(ts as timestamp_ntz) as ts",
                 "'x' as event_type", "'{}' as props")
    d = tmp_path / "ties"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    want = sorted(
        (r.event_id, r.n_window)
        for r in events_user_value_anomalies(spark, str(d)).collect()
    )
    import pyspark.sql.functions as F

    src = (
        spark.readStream.schema(df.schema)
        .parquet(str(d / "events.parquet"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        rolling_anomalies(src)
        .writeStream.format("memory").queryName("t_ties")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(
        (r.event_id, r.n_window) for r in spark.table("t_ties").collect()
    )
    assert got == want == [(99, 12)]


def test_reservoir_oracle_survives_large_doc_ids(spark, tmp_path):
    """doc_id beyond ~3.4e9 used to overflow the Knuth product: DuckDB
    raises on int64 overflow, so the oracle could not even run. The
    pre-reduction (doc_id % 2^31) must keep both engines running and
    agreeing."""
    import duckdb

    from bigdata2016w_spark.plans.corpus_ext import (
        _RESERVOIR_SQL, documents_reservoir_by_source)
    from tests.oracle import compare_spark_duckdb

    docs = spark.createDataFrame(
        [(4_000_000_000 + i, f"doc {i}", "en", f"s{i % 2}", 5)
         for i in range(30)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path / "bigids"
    d.mkdir()
    docs.write.parquet(str(d / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    compare_spark_duckdb(documents_reservoir_by_source(spark, str(d)),
                         con, _RESERVOIR_SQL)
    con.close()


def test_incremental_agg_matches_full_recompute(spark, sf_dir, duck):
    """The oracle is the FULL recompute; the Spark plan merges stored +
    delta partials — equality proves the algebraic-merge maintenance."""
    spec = all_specs()["orders_incremental_daily_agg"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_null_and_dirty_inputs_handled_uniformly(spark, tmp_path, duck):
    """Dirty-data regression pins: a missing/non-numeric props.k is
    skipped by trending on both engines; a NULL embedding is skipped by
    the covariance stats; a NULL o_orderdate survives the incremental
    split as the day=NULL group."""
    import duckdb

    from bigdata2016w_spark.registry import all_specs
    from tests.oracle import compare_spark_duckdb

    d = tmp_path / "dirty"
    d.mkdir()
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00", 1, "view", 1.0, '{"k": 7}'),
         (2, "2024-01-01 00:02:00", 1, "view", 1.0, '{"k": "oops"}'),
         (3, "2024-01-01 00:03:00", 1, "view", 1.0, '{}'),
         (4, "2024-01-01 00:04:00", 1, "view", 1.0, '{"k": 9}'),
         # NULL ts with a NUMERIC props.k: F.window drops it silently,
         # so the oracle must filter ts IS NOT NULL too (else it keeps
         # a window_start=NULL group and the row counts diverge)
         (5, None, 1, "view", 1.0, '{"k": 7}')],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr("event_id", "cast(ts as timestamp_ntz) as ts", "user_id",
                 "event_type", "value", "props")
    ev.write.parquet(str(d / "events.parquet"))
    emb = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, None), (3, [0.3, float("nan")]),
         (4, [0.5, 0.6])],
        "vec_id long, embedding array<float>",
    ).selectExpr("vec_id", "embedding", "cast(0 as long) as label")
    emb.write.parquet(str(d / "embeddings.parquet"))
    orders = spark.createDataFrame(
        [(1, 1, "O", 10.0, "2024-01-01 00:00:00", "1-URGENT"),
         (2, 1, "O", 20.0, None, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "cast(o_orderdate as timestamp_ntz) as o_orderdate",
                 "o_orderpriority")
    orders.write.parquet(str(d / "orders.parquet"))

    con = duckdb.connect()
    for t in ("events", "embeddings", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet/*.parquet'")
    for name in ("events_trending_keys", "embedding_covariance_stats",
                 "orders_incremental_daily_agg"):
        spec = all_specs()[name]
        compare_spark_duckdb(spec.fn(spark, str(d)), con, spec.oracle)
    # and the incremental plan really kept the NULL-orderdate row
    rows = all_specs()["orders_incremental_daily_agg"].fn(
        spark, str(d)).collect()
    assert sorted(((r.day or "", r.n_orders) for r in rows)) \
        == [("", 1), ("2024-01-01", 1)]
    con.close()


def test_rag_chunks_match_oracle(spark, sf_dir, duck):
    spec = all_specs()["documents_chunk_for_rag"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_rag_chunks_cover_and_overlap(spark, sf_dir):
    """Chunks must cover every token, start every STRIDE tokens, carry
    exactly the sliced text, and overlap by TOKENS - STRIDE."""
    from bigdata2016w_spark.functions.tokenizer import tokenize
    from bigdata2016w_spark.plans.corpus_ext import (
        CHUNK_STRIDE, CHUNK_TOKENS, documents_chunk_for_rag)
    from bigdata2016w_spark.sources.catalog import load_table

    toks = {
        r.doc_id: r.t
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", tokenize("text").alias("t")).collect()
    }
    by_doc = {}
    for r in documents_chunk_for_rag(spark, sf_dir).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {d for d, t in toks.items() if t}
    for doc_id, chunks in by_doc.items():
        t = toks[doc_id]
        chunks.sort(key=lambda r: r.chunk_id)
        for i, r in enumerate(chunks):
            assert r.chunk_id == i and r.start_tok == i * CHUNK_STRIDE
            assert r.chunk_text == " ".join(
                t[r.start_tok:r.start_tok + r.n_tok]
            )
        # full coverage: last chunk reaches the final token
        last = chunks[-1]
        assert last.start_tok + last.n_tok == len(t)
        # every non-final chunk is full-size
        assert all(r.n_tok == CHUNK_TOKENS for r in chunks[:-1])


def test_hourly_unique_users_matches_oracle(spark, sf_dir, duck):
    spec = all_specs()["events_hourly_unique_users"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_hourly_unique_users_null_ts_and_user(spark, tmp_path):
    """NULL ts rows are excluded identically on both engines, and a NULL
    user_id never counts as a distinct user — batch, oracle, and the
    chained-stateful streaming twin must all agree."""
    import duckdb

    from bigdata2016w_spark.plans.corpus_ext import events_hourly_unique_users
    from bigdata2016w_spark.registry import all_specs
    from tests.oracle import compare_spark_duckdb

    d = tmp_path / "nulls"
    d.mkdir()
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00", 7, "view", 1.0, "{}"),
         (2, "2024-01-01 00:02:00", None, "view", 1.0, "{}"),
         (3, None, 9, "view", 1.0, "{}"),
         # an hour whose events are ALL NULL-user must still emit a
         # (window, 0) row on batch, oracle, AND the streaming twin
         (4, "2024-01-01 01:05:00", None, "view", 1.0, "{}"),
         (5, "2024-01-01 01:06:00", None, "view", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr("event_id", "cast(ts as timestamp_ntz) as ts", "user_id",
                 "event_type", "value", "props")
    ev.write.parquet(str(d / "events.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    spec = all_specs()["events_hourly_unique_users"]
    compare_spark_duckdb(events_hourly_unique_users(spark, str(d)),
                         con, spec.oracle)
    rows = events_hourly_unique_users(spark, str(d)).collect()
    assert [(r.window_start, r.unique_users, r.n_events) for r in rows] \
        == [("2024-01-01 00:00:00", 1, 2), ("2024-01-01 01:00:00", 0, 2)]
    con.close()

    from bigdata2016w_spark.streaming.windows import hourly_unique_users

    src = (
        spark.readStream.schema(ev.schema)
        .parquet(str(d / "events.parquet"))
        .selectExpr("event_id", "cast(ts as timestamp) as ts", "user_id",
                    "event_type", "value", "props")
    )
    q = (
        hourly_unique_users(src)
        .writeStream.format("memory").queryName("t_uniq_nulls")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table("t_uniq_nulls").collect()
    assert sorted((r.window_start, r.unique_users) for r in got) \
        == [("2024-01-01 00:00:00", 1), ("2024-01-01 01:00:00", 0)]
