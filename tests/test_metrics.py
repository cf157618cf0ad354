"""Parity tests for the micro multilabel AP metric against sklearn (which
matches the torchmetrics implementation used by the reference at
TFAM/train_and_eval.py:49)."""

import numpy as np
import pytest
from sklearn.metrics import average_precision_score

import jax.numpy as jnp

from vimoclip_tpu.metrics import (
    MultilabelAveragePrecision,
    TopKAccuracy,
    average_precision_jax,
    average_precision_np,
)


def _random_problem(seed, b=64, c=140, pos_rate=0.04):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, c)).astype(np.float32)
    targets = (rng.random((b, c)) < pos_rate).astype(np.int64)
    targets[0, 0] = 1  # ensure at least one positive
    return logits, targets


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_micro_ap_matches_sklearn(seed):
    logits, targets = _random_problem(seed)
    ours = average_precision_np(logits, targets)
    ref = average_precision_score(targets.ravel(), logits.ravel())
    assert abs(ours - ref) < 1e-9


def test_micro_ap_with_ties():
    # quantized scores force heavy ties — exercises threshold grouping
    rng = np.random.default_rng(3)
    logits = np.round(rng.normal(size=(32, 10)), 1)
    targets = (rng.random((32, 10)) < 0.2).astype(np.int64)
    targets[0, 0] = 1
    ours = average_precision_np(logits, targets)
    ref = average_precision_score(targets.ravel(), logits.ravel())
    assert abs(ours - ref) < 1e-9


def test_streaming_accumulator_equals_one_shot():
    logits, targets = _random_problem(7, b=48)
    metric = MultilabelAveragePrecision(num_labels=140)
    for i in range(0, 48, 16):
        metric.update(logits[i : i + 16], targets[i : i + 16])
    assert abs(metric.compute() - average_precision_np(logits, targets)) < 1e-12
    metric.reset()
    assert metric.compute() == 0.0


def test_jax_ap_close_to_exact_without_ties():
    logits, targets = _random_problem(11, b=32, c=20, pos_rate=0.2)
    exact = average_precision_np(logits, targets)
    approx = float(average_precision_jax(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(exact - approx) < 1e-5  # distinct float scores -> identical


def test_ap_no_positives_is_zero():
    assert average_precision_np(np.ones((4, 4)), np.zeros((4, 4))) == 0.0


def test_topk_accuracy():
    logits = np.array([[0.9, 0.1, 0.0], [0.2, 0.5, 0.3], [0.1, 0.2, 0.7]])
    onehot = np.eye(3)[[0, 2, 2]]
    acc = TopKAccuracy(top_k=1)
    acc.update(logits, onehot)
    assert acc.compute() == pytest.approx(2 / 3)
    acc2 = TopKAccuracy(top_k=2)
    acc2.update(logits, onehot)
    assert acc2.compute() == pytest.approx(1.0)
