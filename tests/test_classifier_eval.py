"""Semantics of classifier.classifier_eval: confusion-matrix invariants
across the threshold sweep, and the trained model beating the stand-in
on its own training task — the property that makes the train → eval →
pick-threshold loop worth shipping.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.functions import classifier


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def standin(docs):
    return {
        r["threshold"]: r for r in classifier.classifier_eval(docs).collect()
    }


def test_one_row_per_threshold(standin):
    assert set(standin) == set(classifier.EVAL_THRESHOLDS)


def test_confusion_totals_constant_across_thresholds(docs, standin):
    eval_docs = docs.where(F.col("doc_id") % 5 == 0)
    n = eval_docs.count()
    n_pos = eval_docs.where(F.col("lang") == "en").count()
    for r in standin.values():
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
        assert r["tp"] + r["fn"] == n_pos


def test_monotone_in_threshold(standin):
    seq = [standin[t] for t in sorted(standin)]
    for prev, cur in zip(seq, seq[1:]):
        # raising the threshold can only remove positive predictions
        assert cur["tp"] <= prev["tp"]
        assert cur["fp"] <= prev["fp"]


def test_trained_model_beats_standin_on_its_task(docs):
    """Train in-engine on the full corpus (language-ID task), evaluate
    on the held-out slice: the trained model's best operating point must
    strictly beat the stand-in's best by F1 — the stand-in's weights are
    md5 noise, so anything learned should win."""
    w = classifier.train_hashed_logreg(docs, n_iter=8)
    # trained margins are doubles; sweep around 0 in the trained scale
    trained = classifier.classifier_eval(docs, weights=w)

    def best_f1(rows):
        out = 0.0
        for r in rows.collect():
            p, q = r["precision"], r["recall"]
            if p and q and p + q > 0:
                out = max(out, 2 * p * q / (p + q))
        return out

    standin = classifier.classifier_eval(docs)
    assert best_f1(trained) > best_f1(standin)
