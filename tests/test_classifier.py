"""Distributed logistic-regression trainer (operators/classifier.py).

The contract is BIT-stability: integer-quantized gradient sums make the
fit invariant to partitioning, and the fixed-operand-order float math
makes a NumPy replica reproduce weights and scores exactly.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.classifier import (
    GRAD_SCALE,
    score_logreg,
    train_logreg,
)

XS = ["x0", "x1", "x2"]


def _mk(spark, rows, parts=1):
    df = spark.createDataFrame(
        rows, "doc_id long, x0 double, x1 double, x2 double, y double"
    )
    return df.repartition(parts) if parts > 1 else df


def _rows(n=97, seed=3):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        x1, x2 = float(rng.rand()), float(rng.rand())
        y = 1.0 if (x1 + 0.3 * x2 > 0.6) else 0.0
        out.append((i, 1.0, x1, x2, y))
    return out


def _numpy_train(rows, lr=0.05, iters=2):
    x = np.array([[r[1], r[2], r[3]] for r in rows], dtype=np.float64)
    y = np.array([r[4] for r in rows], dtype=np.float64)
    n = len(rows)
    w = [0.0, 0.0, 0.0]
    for _ in range(iters):
        # per-row ops in the SAME order as the Spark expressions
        z = np.zeros(n)
        for j in range(3):
            z = z + w[j] * x[:, j]
        p = 0.5 + z / (2.0 * (1.0 + np.abs(z)))
        s = []
        for j in range(3):
            g = np.floor(((p - y) * x[:, j]) * GRAD_SCALE)
            s.append(int(g.sum()))
        w = [w[j] - lr * (s[j] / (n * GRAD_SCALE)) for j in range(3)]
    return w


def test_weights_match_numpy_bit_exact(spark):
    rows = _rows()
    w_spark = train_logreg(_mk(spark, rows), XS, lr=0.05, iters=2)
    w_np = _numpy_train(rows, lr=0.05, iters=2)
    assert w_spark == w_np  # exact float equality, not approx


def test_fit_is_invariant_to_partitioning(spark):
    rows = _rows(n=211, seed=9)
    w1 = train_logreg(_mk(spark, rows, parts=1), XS)
    w32 = train_logreg(_mk(spark, rows, parts=32), XS)
    assert w1 == w32


def test_scores_separate_the_classes(spark):
    rows = _rows(n=400, seed=1)
    df = _mk(spark, rows)
    w = train_logreg(df, XS, lr=0.5, iters=8)
    scored = score_logreg(df, XS, w)
    means = {
        r["y"]: r["m"]
        for r in scored.groupBy("y").agg(F.avg("classifier_score").alias("m")).collect()
    }
    assert means[1.0] > means[0.0] + 0.05  # the fit actually learned


def test_scoring_is_a_narrow_projection(spark):
    rows = _rows(n=50)
    df = _mk(spark, rows)
    plan = (
        score_logreg(df, XS, [0.1, -0.2, 0.3])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # zero shuffle
