"""Naive Bayes classifier (operators/classify.py): exact model counts on
a hand corpus, bit-exact odds vs a Python replay of the pinned
arithmetic, and rule recovery on the documents fixture."""

from __future__ import annotations

import math

from data_engineering_etl_self_service_spark.operators.classify import (
    nb_score_bernoulli,
    nb_score_multinomial,
    nb_train,
)
from data_engineering_etl_self_service_spark.queries import QUERIES

HAND = [
    # (doc_id, text, label) — label: contains "spam"
    (1, "spam spam eggs", True),
    (2, "spam ham", True),
    (3, "eggs ham toast", False),
    (4, "toast toast eggs ham", False),
    (5, "ham eggs", False),
]


def _hand_df(spark):
    return spark.createDataFrame(
        [(i, t, y) for i, t, y in HAND], "doc_id long, text string, label boolean"
    )


def test_model_counts_exact(spark):
    model, meta = nb_train(_hand_df(spark))
    rows = {r["w"]: r for r in model.collect()}
    # token counts per class
    assert (rows["spam"]["c_pos"], rows["spam"]["c_neg"]) == (3, 0)
    assert (rows["eggs"]["c_pos"], rows["eggs"]["c_neg"]) == (1, 3)
    assert (rows["ham"]["c_pos"], rows["ham"]["c_neg"]) == (1, 3)
    assert (rows["toast"]["c_pos"], rows["toast"]["c_neg"]) == (0, 3)
    # doc frequencies per class
    assert (rows["spam"]["df_pos"], rows["spam"]["df_neg"]) == (2, 0)
    assert (rows["toast"]["df_pos"], rows["toast"]["df_neg"]) == (0, 2)
    m = meta.collect()[0]
    assert (m["t_pos"], m["t_neg"], m["v"]) == (5, 9, 4)
    assert (m["n_pos"], m["n_neg"]) == (2, 3)


def _py_mult_odds(tokens, model, t_pos, t_neg, v, n_pos, n_neg):
    odds = (n_pos + 1.0) / (n_neg + 1.0)
    fold = 1.0
    for w in tokens:
        c_pos, c_neg = model.get(w, (0, 0))
        r = ((c_pos + 1.0) / float(t_pos + v)) / (
            (c_neg + 1.0) / float(t_neg + v)
        )
        fold = fold * r
    return odds * fold


def test_multinomial_odds_bit_exact(spark):
    df = _hand_df(spark)
    model, meta = nb_train(df)
    scored = {
        r["doc_id"]: r["mult_odds"]
        for r in nb_score_multinomial(df, model, meta).collect()
    }
    counts = {
        r["w"]: (r["c_pos"], r["c_neg"]) for r in model.collect()
    }
    m = meta.collect()[0]
    for doc_id, text, _ in HAND:
        exp = _py_mult_odds(
            text.split(), counts, m["t_pos"], m["t_neg"], m["v"],
            m["n_pos"], m["n_neg"],
        )
        assert math.isclose(scored[doc_id], exp, rel_tol=0.0, abs_tol=0.0), (
            doc_id,
            scored[doc_id].hex(),
            exp.hex(),
        )


def test_bernoulli_separates_marker(spark):
    df = _hand_df(spark)
    model, meta = nb_train(df)
    scored = {
        r["doc_id"]: r["bern_odds"]
        for r in nb_score_bernoulli(df, model, meta).collect()
    }
    for doc_id, text, label in HAND:
        assert (scored[doc_id] > 1.0) == label, (doc_id, scored[doc_id])


def test_oov_token_scores(spark):
    df = _hand_df(spark)
    model, meta = nb_train(df)
    test = spark.createDataFrame(
        [(9, "unseen spam")], "doc_id long, text string"
    )
    out = nb_score_multinomial(test, model, meta).collect()
    assert out[0]["n_tokens"] == 2 and out[0]["mult_odds"] > 0.0


def test_fixture_rule_recovery(spark, sf_dir):
    """Held-out decisions substantially recover the marker rule: the
    label generator ('the' in doc) is length-correlated on this corpus
    (long docs almost surely contain any vocab word), which bounds both
    variants away from 100% — the assertion is that the classifier
    LEARNS: accuracy well above the majority-class baseline."""
    out = QUERIES["nb_classifier_scores"](spark, sf_dir).collect()
    assert len(out) > 0
    # both labels are represented in the held-out slice
    assert {r["label"] for r in out} == {True, False}
    acc = sum(r["correct"] for r in out) / len(out)
    majority = max(
        sum(r["label"] for r in out), sum(not r["label"] for r in out)
    ) / len(out)
    assert acc >= 0.85, acc
    assert acc > majority, (acc, majority)
    # the multinomial score is discriminative too
    mult_acc = sum(
        (r["mult_odds"] > 1.0) == r["label"] for r in out
    ) / len(out)
    assert mult_acc >= 0.8, mult_acc
