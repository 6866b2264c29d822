"""ML feature operators (SURVEY.md §2.7 R38-R41): Word2Vec, synonym search,
PCA, projection — the reference's MLlib recipes (README.md:361-422) on the
modern ml.feature API over DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_word2vec(
    df: DataFrame,
    tokens_col: str = "tokens",
    vector_size: int = 100,
    min_count: int = 2,
    seed: int = 42,
):
    """R38 (README.md:384-387): Word2Vec().setMinCount(2).fit(tokens)."""
    from pyspark.ml.feature import Word2Vec

    w2v = Word2Vec(
        vectorSize=vector_size,
        minCount=min_count,
        seed=seed,
        inputCol=tokens_col,
        outputCol="w2v",
    )
    return w2v.fit(df)


def find_synonyms(model, word: str, k: int = 10) -> DataFrame:
    """R39 (README.md:388-392): top-k cosine neighbors of ``word``."""
    return model.findSynonyms(word, k)


def to_vector(df: DataFrame, array_col: str = "embedding", out: str = "features") -> DataFrame:
    """array<float> column → ml.linalg Vector column (the ML boundary,
    SURVEY.md §1.1)."""
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(out, array_to_vector(F.col(array_col)))


def fit_pca(df: DataFrame, array_col: str = "embedding", k: int = 20):
    """R40 (README.md:410-418): top-k principal components.

    ml.feature.PCA on a vector column — computes the covariance eigenbasis
    distributed (one pass for the Gramian), matching
    RowMatrix.computePrincipalComponents(20)."""
    from pyspark.ml.feature import PCA

    vecs = to_vector(df, array_col)
    return PCA(k=k, inputCol="features", outputCol="pca").fit(vecs)


def pca_project(model, df: DataFrame, array_col: str = "embedding") -> DataFrame:
    """R41 (README.md:421): mat.multiply(pc) — project rows onto the
    principal subspace."""
    return model.transform(to_vector(df, array_col))


def quality_classifier_fit(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 4096,
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit a fastText-style discriminative quality classifier: hashed
    bag-of-words features → logistic regression — the model-based corpus
    filter of the CCNet/LLaMA data recipes ("train a linear classifier
    to recognize reference-quality pages, keep what it scores high"),
    complementing the generative LM-perplexity tiers in
    operators/text.py (lm_quality_score: what a reference corpus makes
    LIKELY; this: what separates two labeled corpora).

    ``labeled`` needs ``text_col`` and a 0/1 ``label_col`` (1 = keep
    quality). Returns a fitted PipelineModel (tokenizer → HashingTF →
    IDF → LogisticRegression), all JVM-side; seeds fixed, so the fit is
    deterministic for a given input partitioning.

    Scale shape: training is Spark ML's distributed L-BFGS over the
    hashed feature space (``num_features`` dims, constant per doc);
    per-iteration cost is one tree-aggregated gradient pass — linear in
    docs. No vocabulary state beyond the IDF vector (``num_features``
    doubles, broadcast at scoring time).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, IDF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_qc_toks", pattern=r"\s+"
    )
    tf = HashingTF(
        inputCol="_qc_toks", outputCol="_qc_tf", numFeatures=num_features
    )
    idf = IDF(inputCol="_qc_tf", outputCol="_qc_features")
    lr = LogisticRegression(
        featuresCol="_qc_features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
        standardization=True,
    )
    return Pipeline(stages=[tok, tf, idf, lr]).fit(labeled)


def quality_classifier_score(
    model,
    df: DataFrame,
    text_col: str = "text",
    out: str = "quality_prob",
) -> DataFrame:
    """Score a corpus with a fitted :func:`quality_classifier_fit` model:
    adds ``out`` = P(label=1) and drops the intermediate feature columns.
    One codegen'd map pass over the scan (the model's vectors broadcast
    in the transform closures); filter downstream with
    ``df.filter(F.col(out) >= threshold)`` or feed the probability to
    :func:`~datamunging_spark.operators.text.lm_quality_bands`-style
    banding.
    """
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    return scored.withColumn(
        out, vector_to_array("probability").getItem(1)
    ).drop("_qc_toks", "_qc_tf", "_qc_features", "rawPrediction",
           "probability", "prediction")
