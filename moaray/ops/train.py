"""Distributed model fitting for training-data pipelines.

The quality-classifier half of a data pipeline (CCNet/RedPajama-style:
score documents with a small linear model, filter/bucket on the score).
``lr_fit`` is the classic Ray Data training loop: each full-batch gradient
iteration is ONE streaming pass (``map_batches`` emits per-batch partial
gradient sums — one tiny row per batch — and the driver folds them and
updates the weights). The corpus never materializes; driver state is the
d-vector of weights. At 100 TB, either fit on a bounded deterministic
hash sample (``text.hash_sample``) or accept n_iters streaming passes —
both shapes are explicit here, neither collects rows.

``lr_predict`` broadcasts the weights in the stage closure (a few floats)
and scores batches with one vectorized matmul.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _xy(batch: pa.Table, feature_cols, label_col):
    x = np.column_stack(
        [batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
         for c in feature_cols]
    )
    x = np.column_stack([np.ones(len(x)), x])  # intercept
    y = None
    if label_col is not None:
        y = batch[label_col].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
    return x, y


def lr_fit(ds, feature_cols, label_col, *, lr: float = 0.5,
           n_iters: int = 50, l2: float = 0.0):
    """Full-batch logistic regression by distributed gradient descent.

    Returns ``{"w": float64[d+1], "loss": float}`` (index 0 = intercept).
    Each iteration streams the dataset once; the shuffle-free partial-sum
    pattern (one (grad, loss, n) row per batch) keeps the driver reduce
    O(n_batches × d). Deterministic given the data and hyperparameters up
    to float summation order."""
    cols = list(feature_cols) + [label_col]
    ds = ds.select_columns(cols)
    d = len(feature_cols) + 1
    w = np.zeros(d)

    for _ in range(n_iters):
        w_now = w  # captured by value via default arg below

        def partial(batch: pa.Table, _w=w_now) -> pa.Table:
            x, y = _xy(batch, feature_cols, label_col)
            z = x @ _w
            p = 1.0 / (1.0 + np.exp(-z))
            g = x.T @ (p - y)
            # clip keeps log finite; loss is reporting-only
            eps = 1e-12
            loss = -np.sum(
                y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)
            )
            return pa.table({
                "g": pa.array([g.tolist()], pa.list_(pa.float64())),
                "loss": pa.array([float(loss)], pa.float64()),
                "n": pa.array([len(y)], pa.int64()),
            })

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        g = np.sum([np.asarray(r["g"]) for r in rows], axis=0)
        n = sum(r["n"] for r in rows)
        loss = sum(r["loss"] for r in rows) / max(n, 1)
        w = w - lr * (g / max(n, 1) + l2 * w)

    return {"w": w, "loss": float(loss)}


def lr_predict(ds, model, feature_cols, id_col: str = "doc_id",
               round_digits: int = 6):
    """Score rows under a fitted model: (id, score) with
    score = sigmoid(w · [1, x]) — one matmul per batch, weights ride the
    closure (they are a handful of floats; no actor state needed)."""
    w = np.asarray(model["w"], dtype=np.float64)

    def score(batch: pa.Table) -> pa.Table:
        x, _ = _xy(batch, feature_cols, None)
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        return pa.table({
            id_col: batch[id_col],
            "score": pa.array(np.round(p, round_digits), pa.float64()),
        })

    return ds.select_columns([id_col] + list(feature_cols)).map_batches(
        score, batch_format="pyarrow"
    )
