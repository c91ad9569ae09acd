"""Metric math vs sklearn (upstream tests/test_metric_calculation.py)."""

import numpy as np
import pytest

from nnue_vision_tpu.training.metrics import compute_metrics

sklearn = pytest.importorskip("sklearn")
from sklearn.metrics import (  # noqa: E402
    accuracy_score,
    f1_score,
    precision_score,
    recall_score,
)


def _sklearn_reference(outputs, targets):
    outputs = np.asarray(outputs)
    targets = np.asarray(targets).reshape(-1)
    if outputs.ndim == 1 or outputs.shape[1] == 1:
        preds = (outputs.reshape(-1) > 0.5).astype(int)
        targets = (targets > 0.5).astype(int)
    else:
        preds = outputs.argmax(axis=1)
        targets = targets.astype(int)
    return {
        "acc": accuracy_score(targets, preds),
        "f1": f1_score(targets, preds, average="weighted", zero_division=0),
        "precision": precision_score(
            targets, preds, average="weighted", zero_division=0
        ),
        "recall": recall_score(targets, preds, average="weighted", zero_division=0),
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("classes", [2, 3, 10])
def test_multiclass_matches_sklearn(seed, classes):
    rng = np.random.default_rng(seed)
    outputs = rng.normal(size=(64, classes))
    targets = rng.integers(0, classes, 64)
    ours = compute_metrics(outputs, targets)
    ref = _sklearn_reference(outputs, targets)
    for key in ("acc", "f1", "precision", "recall"):
        assert ours[key] == pytest.approx(ref[key], abs=1e-12), key


def test_binary_single_column_matches_sklearn():
    rng = np.random.default_rng(3)
    outputs = rng.random((40, 1))
    targets = rng.integers(0, 2, 40)
    ours = compute_metrics(outputs, targets)
    ref = _sklearn_reference(outputs, targets)
    for key in ("acc", "f1", "precision", "recall"):
        assert ours[key] == pytest.approx(ref[key], abs=1e-12), key


def test_missing_class_in_predictions():
    """A class with zero predicted samples must not crash (zero_division=0)."""
    outputs = np.zeros((6, 3))
    outputs[:, 0] = 1.0  # always predicts class 0
    targets = np.array([0, 1, 2, 0, 1, 2])
    ours = compute_metrics(outputs, targets)
    ref = _sklearn_reference(outputs, targets)
    for key in ("acc", "f1", "precision", "recall"):
        assert ours[key] == pytest.approx(ref[key], abs=1e-12), key


def test_perfect_predictions():
    targets = np.array([0, 1, 2, 1, 0])
    outputs = np.eye(3)[targets]
    m = compute_metrics(outputs, targets)
    assert m == {"acc": 1.0, "f1": 1.0, "precision": 1.0, "recall": 1.0}
