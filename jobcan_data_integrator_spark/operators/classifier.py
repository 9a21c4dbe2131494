"""Distributed quality-classifier training: batch-gradient logistic
regression where every gradient step is ONE Spark aggregation.

Training pipelines distill their heuristic quality filters into a tiny
learned scorer (the GPT-3/DCLM-style quality-classifier stage: label a
corpus slice with the heuristics, fit a linear model, score everything
with the model).  This module is that trainer, built so the result is
BIT-STABLE on any engine, any partitioning, any run:

- the link function is the "fast sigmoid" ``0.5 + z / (2 * (1 + |z|))``
  — pure +,*,/,abs IEEE-754 double arithmetic (no ``exp``), so every
  engine computes the identical bits, unlike ``exp`` whose last-ulp
  varies by libm;
- per-row gradient contributions are quantized to integers
  (``floor(g * 1e9)``) BEFORE the sum, so the aggregation is exact
  integer math — float summation order (which varies with
  partitioning) can never change a weight;
- the weight update runs driver-side on the collected integer sums
  (one tiny row per step) with a fixed operation order that DuckDB/
  NumPy replicas reproduce exactly (pinned in tests and in the
  ``tx_quality_score`` gate oracle's unrolled CTE rounds).

Scale shape per step: one full scan with map-side partial aggregation
down to ``1 + n_features`` longs per partition — the classic
all-reduce gradient step expressed as a Catalyst agg.  Scoring is a
narrow zero-shuffle projection.  The 1e9 quantization bounds exact
integer sums up to ~9e9 rows per step; at larger corpora lower the
scale (or train on a deterministic md5-bucket subsample, which is what
a quality classifier wants anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: gradient quantization scale — keep in lockstep with the literal in the
#: tx_quality_score gate oracle (gate/llm.py).
GRAD_SCALE = 1_000_000_000.0


def fast_sigmoid(z: Column) -> Column:
    """``0.5 + z / (2 * (1 + |z|))`` — a sigmoid-shaped link in pure
    IEEE arithmetic (range (0, 1), monotone, σ(0) = 0.5 exactly).
    Chosen over ``exp``-based logistic so results are bit-identical
    across engines; the fitted scores are a monotone transform of the
    usual logistic scores, which is all a filter threshold needs."""
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def _z(feature_cols: list[str], w: list[float]) -> Column:
    """Left-associated dot product — the operand order is part of the
    bit-stability contract (replicas must add in the same order)."""
    expr = F.lit(w[0]) * F.col(feature_cols[0])
    for c, wj in zip(feature_cols[1:], w[1:]):
        expr = expr + F.lit(wj) * F.col(c)
    return expr


def train_logreg(
    feat: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    lr: float = 0.05,
    iters: int = 2,
) -> list[float]:
    """Fit weights by ``iters`` full-batch gradient steps; returns the
    weight list (one per feature column, include an ``x0 = 1.0`` bias
    column yourself).

    Labels must be 0.0/1.0 doubles.  Each step is one Spark job: the
    per-row gradient ``(p - y) * x_j`` is quantized to ``floor(g*1e9)``
    and integer-summed (exact under any partitioning), then the driver
    applies ``w -= lr * (S / (n * 1e9))`` in float64 — a fixed op order
    an SQL or NumPy replica reproduces bit-for-bit."""
    w = [0.0] * len(feature_cols)
    for _ in range(iters):
        p = fast_sigmoid(_z(feature_cols, w))
        aggs = [F.count("*").alias("n")]
        for j, c in enumerate(feature_cols):
            g = ((p - F.col(label_col)) * F.col(c)) * F.lit(GRAD_SCALE)
            aggs.append(F.sum(F.floor(g)).alias(f"s{j}"))
        row = feat.agg(*aggs).collect()[0]
        n = row["n"]
        w = [
            wj - lr * (row[f"s{j}"] / (n * GRAD_SCALE))
            for j, wj in enumerate(w)
        ]
    return w


def score_logreg(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    out_col: str = "classifier_score",
) -> DataFrame:
    """``df`` plus the fitted score — a narrow zero-shuffle projection
    (the 100 TB-corpus scoring pass costs one scan)."""
    return df.withColumn(out_col, fast_sigmoid(_z(feature_cols, weights)))
