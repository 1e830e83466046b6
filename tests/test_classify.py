"""Multinomial Naive Bayes classifier tests: hand-computed posteriors,
OOV smoothing, argmax prediction on separable data."""

import math

from pyspark.sql import functions as F

from eva_opentargets_spark.operators.classify import nb_predict, nb_score, nb_train

SCHEMA = "doc_id long, text string, lang string"


def test_nb_train_and_score_match_hand_computation(spark):
    train = spark.createDataFrame(
        [(1, "a a b", "x"), (2, "b b c", "y")], SCHEMA
    )
    test = spark.createDataFrame([(10, "a c", "x")], SCHEMA)
    priors, likelihoods = nb_train(train, label_col="lang")
    out = {r.label: r.score for r in nb_score(test, priors, likelihoods).collect()}

    # class x: tokens a=2, b=1, T=3; class y: b=2, c=1, T=3; V=3, alpha=1
    # P(a|x)=(2+1)/(3+3)=1/2  P(c|x)=(0+1)/6 (OOV)  prior ln(1/2)
    want_x = math.log(0.5) + math.log(3 / 6) + math.log(1 / 6)
    # P(a|y)=1/6 (OOV)  P(c|y)=(1+1)/6
    want_y = math.log(0.5) + math.log(1 / 6) + math.log(2 / 6)
    assert out["x"] == round(want_x, 4)
    assert out["y"] == round(want_y, 4)


def test_nb_predict_recovers_separable_classes(spark):
    """Classes with disjoint marker vocabulary are perfectly recoverable
    on held-out docs that mix markers with shared filler."""
    markers = {"x": "xray xenon xylophone", "y": "yak yellow yarn", "z": "zebra zinc zone"}
    rows = []
    i = 0
    for lab, m in markers.items():
        for k in range(20):
            rows.append((i, f"{m} common filler words {k % 3}", lab))
            i += 1
    train = spark.createDataFrame(rows, SCHEMA)
    test = spark.createDataFrame(
        [(100, "xenon xray common filler", "x"),
         (101, "yarn yak words", "y"),
         (102, "zinc zebra zone filler", "z")],
        SCHEMA,
    )
    priors, likelihoods = nb_train(train, label_col="lang")
    pred = {r.doc_id: r.predicted for r in nb_predict(nb_score(test, priors, likelihoods)).collect()}
    assert pred == {100: "x", 101: "y", 102: "z"}


def test_nb_score_every_doc_gets_every_class(spark):
    train = spark.createDataFrame(
        [(1, "a b", "x"), (2, "c d", "y"), (3, "e f", "z")], SCHEMA
    )
    test = spark.createDataFrame([(10, "a"), (11, "zzz unseen")], "doc_id long, text string")
    priors, likelihoods = nb_train(train)
    out = nb_score(test, priors, likelihoods)
    assert out.count() == 6  # 2 docs x 3 classes
    # fully-OOV doc still scores finite in every class (smoothing)
    assert all(r.score is not None for r in out.filter(F.col("doc_id") == 11).collect())
