"""Broadcast-model scoring: apply a trained linear / logistic model to
an embedding column at corpus scale.

The standard quality-classifier deployment in LLM data pipelines
(fastText/logreg over document embeddings, à la the CCNet and FineWeb
quality filters): the model is a small weight vector trained offline;
inference is one fused map over the corpus.  The weights travel to
executors as a plan literal (the broadcast degenerate case — zero
shuffle, zero joins, whole-stage codegen); the dot product runs in
element order via ``aggregate``/``zip_with``, so the raw score is
bit-identical across engines, and the sigmoid is rounded to 8 decimals
(single libm call — same convention as every float oracle here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.pipeline.similarity import _dot


def linear_scores(
    docs: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
) -> DataFrame:
    """``[id, score, prob, passes]``: score = w·x + b, prob =
    sigmoid(score) rounded to 8 decimals, passes = prob ≥ threshold.

    Raises when a vector's length differs from the model's (zip_with
    would silently null-pad otherwise — a dimension mismatch must be a
    loud failure, not a quietly-wrong score).
    """
    w = F.array(*[F.lit(float(x)) for x in weights])
    vec = F.col(vec_col).cast("array<double>")
    score = _dot(vec, w) + F.lit(float(bias))
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-score)), 8)
    dim_ok = F.size(vec) == F.lit(len(weights))
    checked = F.when(dim_ok, score).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"embedding dimension != model dimension {len(weights)}: got "
                ),
                F.size(vec).cast("string"),
            )
        )
    )
    return docs.select(
        F.col(id_col).alias("id"),
        checked.alias("score"),
        prob.alias("prob"),
        (prob >= F.lit(float(threshold))).alias("passes"),
    )
