"""Model-based quality filter (operators/mlfilter.py): train on labeled
text, compile the coefficients to a column expression, verify the
compiled scorer matches pyspark.ml's own probabilities."""

import pytest
from pyspark.sql import functions as F


GOOD = [
    "the quick brown fox jumps over the lazy dog and runs away home",
    "a clear and well formed sentence with many common english words",
    "students read books in the library while teachers prepare lessons",
    "the committee approved the proposal after a long open discussion",
    "farmers planted wheat and corn across the wide northern valley",
    "the orchestra performed a symphony to a full house last evening",
]
BAD = [
    "00 11 22 33 44 55 66 77 88 99 000 111 2222 3333",
    "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( ))))",
    "XXXXX YYYYY ZZZZZ 12345 67890 !!!!! ?????",
    "9f8e7d 6c5b4a 3210ff eeddcc bbaa99 887766",
    "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17",
    "%% 55 %% 66 %% 77 %% 88 %% 99 %% 00 %%",
]


@pytest.fixture(scope="module")
def labeled(spark):
    rows = ([(i, t, 1) for i, t in enumerate(GOOD)]
            + [(100 + i, t, 0) for i, t in enumerate(BAD)])
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_train_separates_and_filter_keeps_good(spark, labeled):
    from openpolicedata_spark.operators.mlfilter import (
        apply_quality_filter,
        train_quality_filter,
    )

    model = train_quality_filter(labeled, reg_param=0.001)
    assert isinstance(model["intercept"], float)
    out = {r["doc_id"]: r for r in
           apply_quality_filter(labeled, model).collect()}
    good_scores = [out[i]["model_score"] for i in range(len(GOOD))]
    bad_scores = [out[100 + i]["model_score"] for i in range(len(BAD))]
    assert min(good_scores) > max(bad_scores)
    assert all(out[i]["keep"] for i in range(len(GOOD)))
    assert not any(out[100 + i]["keep"] for i in range(len(BAD)))


def test_compiled_scorer_matches_mllib_probabilities(spark, labeled):
    """The codegen expression must reproduce pyspark.ml's own sigmoid
    probabilities — the guarantee that 100 TB inference without the
    model object computes the same filter."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from openpolicedata_spark.operators.mlfilter import (
        feature_names,
        featurize,
        quality_score_model_expr,
        train_quality_filter,
    )

    model = train_quality_filter(labeled, reg_param=0.01)
    # rebuild the mllib model exactly as train did, then compare probs
    names = feature_names()
    feats = featurize(labeled)
    vec = VectorAssembler(inputCols=names, outputCol="__fv__",
                          handleInvalid="keep").transform(feats)
    lr = LogisticRegression(featuresCol="__fv__", labelCol="label",
                            regParam=0.01, elasticNetParam=0.5,
                            maxIter=50, standardization=True)
    fitted = lr.fit(vec)
    probs = {r["doc_id"]: float(r["probability"][1])
             for r in fitted.transform(vec).collect()}
    compiled = {r["doc_id"]: r["s"] for r in labeled.select(
        "doc_id", quality_score_model_expr(model).alias("s")).collect()}
    for k in probs:
        assert abs(probs[k] - compiled[k]) < 1e-9, (k, probs[k], compiled[k])


def test_sparsity_controls_inference_cost(spark, labeled):
    """Elastic-net must zero out a meaningful share of the 64 hashed
    buckets so the compiled expression skips them."""
    from openpolicedata_spark.operators.mlfilter import train_quality_filter

    model = train_quality_filter(labeled, reg_param=0.05)
    zeros = sum(1 for n, w in model["coefficients"].items()
                if n.startswith("f_h") and w == 0.0)
    assert zeros > 32
