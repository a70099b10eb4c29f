"""SGD spam classifier: learning behavior, determinism, ensemble algebra
(a6; the reference's quality numbers are corpus-specific, so the invariant
tests here replace 1-ROCA% goldens)."""

import pytest
from pyspark.sql import functions as F


def _toy_instances(spark, n=60):
    # separable: spam docs carry features {1,2}, ham docs {3,4}
    rows = []
    for i in range(n):
        spam = i % 2 == 0
        rows.append((f"{i:04d}", 1.0 if spam else 0.0, [1, 2] if spam else [3, 4]))
    return spark.createDataFrame(rows, ["docid", "label", "features"])


def test_learns_separable_data(spark):
    from bigdata2016w_spark.operators.sgd import score, train_sgd

    inst = _toy_instances(spark)
    w = train_sgd(inst)
    scored = score(inst, w)
    acc = scored.where(
        ((F.col("label") == 1.0) & (F.col("prediction") == "spam"))
        | ((F.col("label") == 0.0) & (F.col("prediction") == "ham"))
    ).count() / 60
    assert acc == 1.0
    wm = {r["feature"]: r["weight"] for r in w.collect()}
    assert wm[1] > 0 and wm[2] > 0 and wm[3] < 0 and wm[4] < 0


def test_deterministic_and_matches_python_fold(spark):
    """The applyInPandas fold must equal a plain sequential Python fold in
    docid order (TrainSpamClassifier.scala:35-49 semantics)."""
    import math

    from bigdata2016w_spark.operators.sgd import DELTA, train_sgd

    inst = _toy_instances(spark, n=30)
    got = {r["feature"]: r["weight"] for r in train_sgd(inst).collect()}

    w: dict[int, float] = {}
    for i in range(30):
        feats = [1, 2] if i % 2 == 0 else [3, 4]
        label = 1.0 if i % 2 == 0 else 0.0
        s = sum(w.get(f, 0.0) for f in feats)
        grad = (label - 1.0 / (1.0 + math.exp(-s))) * DELTA
        for f in feats:
            w[f] = w.get(f, 0.0) + grad
    assert got == pytest.approx(w, abs=0.0)  # bitwise: same fold, same order

    again = {r["feature"]: r["weight"] for r in train_sgd(inst).collect()}
    assert again == got


def test_shuffle_trainer_seeded(spark):
    from bigdata2016w_spark.operators.sgd import train_sgd

    inst = _toy_instances(spark, n=30)
    a = {r["feature"]: r["weight"] for r in train_sgd(inst, shuffle_seed=7).collect()}
    b = {r["feature"]: r["weight"] for r in train_sgd(inst, shuffle_seed=7).collect()}
    assert a == b


def test_ensembles(spark):
    from bigdata2016w_spark.operators.sgd import (
        ensemble_average,
        ensemble_vote,
        score,
        train_sgd,
    )

    inst = _toy_instances(spark, n=40)
    scored = [score(inst, train_sgd(inst.where(F.col("docid") >= f"{b:04d}")))
              for b in (0, 10, 20)]
    avg = ensemble_average(scored)
    vote = ensemble_vote(scored)
    row = avg.where(F.col("docid") == "0002").collect()[0]
    parts = [s.where(F.col("docid") == "0002").collect()[0]["spamminess"]
             for s in scored]
    assert row["spamminess"] == pytest.approx(sum(parts) / 3, abs=1e-15)
    vrow = vote.where(F.col("docid") == "0002").collect()[0]
    assert vrow["spamminess"] == 3.0  # all three models agree: spam
    assert vrow["prediction"] == "spam"


def test_instance_reader(spark, tmp_path):
    from bigdata2016w_spark.sources.text_formats import read_ml_instances

    p = tmp_path / "inst.txt"
    p.write_text("doc1 spam 3 7 11\ndoc2 ham 5\n")
    got = sorted(read_ml_instances(spark, str(p)).collect())
    assert got[0]["docid"] == "doc1" and got[0]["label"] == 1.0
    assert got[0]["features"] == [3, 7, 11]
    assert got[1]["label"] == 0.0 and got[1]["features"] == [5]


def test_closed_form_score_and_ensemble_match_oracle(spark, sf_dir, duck):
    """The distributed score/ensemble machinery under SQL-replayable
    closed-form weights — the oracle-backed twins of the rows-only
    sgd_scores/sgd_ensemble (whose weights come from the sequential
    fold). Integer-valued weights keep every sum exact."""
    from bigdata2016w_spark.registry import all_specs
    from tests.oracle import compare_spark_duckdb

    for name in ("sgd_score_closed_form", "sgd_ensemble_closed_form"):
        spec = all_specs()[name]
        compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)
