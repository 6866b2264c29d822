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
