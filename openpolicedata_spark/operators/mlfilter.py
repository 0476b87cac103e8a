"""Model-based quality filtering — the classifier stage of a CCNet/LLaMA-
style curation pipeline (a fastText-like linear model over cheap text
features, scoring "looks like the reference corpus" vs "looks like raw
crawl").

Beyond-reference training-pipeline operator. Everything heavy stays in
Spark: features are the repo's own codegen expressions
(`functions.text.quality_metrics` + hashed char-n-gram buckets), training
is `pyspark.ml` LogisticRegression (distributed L-BFGS — one vector per
row, driver holds only the coefficient vector), and scoring compiles the
fitted coefficients BACK INTO a plain column expression so the 100 TB
inference pass is whole-stage codegen with NO model object, NO mllib
dependency at read time, and engine portability (the scoring expression
is a dot product + sigmoid any SQL engine replays).

Determinism: features are deterministic expressions; L-BFGS on a fixed
dataset/partitioning converges to the same coefficients (convex
objective), and the compiled scorer is pure arithmetic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


N_HASH_BUCKETS = 64


def quality_feature_cols(text: Column) -> dict[str, Column]:
    """The dense feature block: the q31 quality metrics plus shape
    signals — all codegen expressions."""
    from openpolicedata_spark.functions.text import quality_metrics

    m = quality_metrics(text)
    # NOTE: digit_ratio/upper_ratio already live in quality_metrics —
    # re-deriving them here would both duplicate the regexp work and
    # train on perfectly collinear feature pairs
    return {
        **{k: v.cast("double") for k, v in m.items()},
        "log_len": F.log1p(F.length(text).cast("double")),
    }


def featurize(df: DataFrame, text_col: str = "text",
              n_buckets: int = N_HASH_BUCKETS) -> DataFrame:
    """Append the feature columns. The char-trigram array is materialized
    once per row (F.filter over an attribute, not a recomputed
    expression) by projecting it first."""
    dense = quality_feature_cols(F.col(text_col))
    from openpolicedata_spark.functions.text import char_ngrams_expr

    # hash every trigram ONCE into its bucket id (a projected attribute),
    # then each of the n_buckets features scans the small int array — the
    # per-bucket F.filter-with-rehash form hashed each trigram n_buckets
    # times inside interpreted HOFs
    with_tri = df.withColumn(
        "__th__",
        F.transform(char_ngrams_expr(F.col(text_col), 3),
                    lambda t: F.pmod(F.xxhash64(t), F.lit(n_buckets))))
    total = F.greatest(F.size(F.col("__th__")), F.lit(1)).cast("double")
    hashed = [
        (F.size(F.filter(F.col("__th__"), lambda x: x == F.lit(i)))
         / total).alias(f"f_h{i}")
        for i in range(n_buckets)
    ]
    # features carry an f_ prefix so they can never collide with the
    # source frame's own columns (documents has its own n_chars)
    return with_tri.select(
        *df.columns,
        *[v.alias(f"f_{k}") for k, v in dense.items()],
        *hashed,
    )


def feature_names(n_buckets: int = N_HASH_BUCKETS) -> list[str]:
    from openpolicedata_spark.functions.text import quality_metrics

    dense = list(quality_metrics(F.lit("x")).keys())
    return ([f"f_{n}" for n in dense] + ["f_log_len"]
            + [f"f_h{i}" for i in range(n_buckets)])


def train_quality_filter(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = N_HASH_BUCKETS,
    reg_param: float = 0.01,
    max_iter: int = 50,
) -> dict:
    """Fit the linear quality model on a labeled frame (label 1 =
    reference-quality, 0 = reject). Returns a plain python dict
    {intercept, coefficients: {feature: weight}} — the ONLY state that
    leaves the cluster; persist it as JSON next to the corpus."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    names = feature_names(n_buckets)
    feats = featurize(labeled, text_col, n_buckets)
    vec = VectorAssembler(inputCols=names, outputCol="__fv__",
                          handleInvalid="keep").transform(feats)
    # elasticNet 0.5: the L1 half drives most hashed-bucket weights to
    # EXACTLY zero, so the compiled inference expression evaluates only
    # the surviving buckets (each is an interpreted HOF filter — sparsity
    # is the inference-cost control)
    lr = LogisticRegression(featuresCol="__fv__", labelCol=label_col,
                            regParam=reg_param, elasticNetParam=0.5,
                            maxIter=max_iter, standardization=True)
    model = lr.fit(vec)
    coef = model.coefficients.toArray()
    return {
        "intercept": float(model.intercept),
        "coefficients": {n: float(c) for n, c in zip(names, coef)},
        "n_buckets": n_buckets,
    }


def quality_score_model_expr(model: dict, text_col: str = "text") -> Column:
    """Compile the fitted model into ONE column expression:
    sigmoid(intercept + Σ w_i · feature_i). Inference at 100 TB is a
    narrow codegen projection — no model object on executors, no mllib
    at read time, and the expression ports to any engine."""
    n_buckets = model["n_buckets"]
    dense = quality_feature_cols(F.col(text_col))
    from openpolicedata_spark.functions.text import char_ngrams_expr

    z = F.lit(model["intercept"])
    bucket_w = {}
    for name, w in model["coefficients"].items():
        if w == 0.0:
            continue
        if name.startswith("f_h") and name[3:].isdigit():
            bucket_w[int(name[3:])] = w
        else:
            z = z + F.lit(w) * dense[name.removeprefix("f_")]
    if bucket_w:
        # ONE pass over the trigrams: each contributes its bucket's
        # weight via a when-chain over the SURVIVING buckets (elastic-net
        # zeros keep the chain short) — one hash per trigram, instead of
        # re-filtering (and re-hashing) the array once per bucket.
        # Single-arg lambdas only: a 2-arg HOF lambda receives the
        # element INDEX as arg 2.
        def w_of(bucket):
            expr = F.lit(0.0)
            for i, w in bucket_w.items():
                expr = F.when(bucket == F.lit(i), F.lit(w)).otherwise(expr)
            return expr

        tri = char_ngrams_expr(F.col(text_col), 3)
        total = F.greatest(F.size(tri), F.lit(1)).cast("double")
        z = z + F.aggregate(
            tri, F.lit(0.0),
            lambda acc, t: acc + w_of(F.pmod(F.xxhash64(t),
                                             F.lit(n_buckets))),
        ) / total
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def apply_quality_filter(df: DataFrame, model: dict, threshold: float = 0.5,
                         text_col: str = "text",
                         score_col: str = "model_score",
                         keep_col: str = "keep") -> DataFrame:
    """Score + keep/drop decision as two appended columns (row-local)."""
    s = quality_score_model_expr(model, text_col)
    return df.withColumn(score_col, s).withColumn(
        keep_col, F.col(score_col) >= threshold)
