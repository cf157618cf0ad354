"""Evaluation metrics, numerically matching the reference's torchmetrics usage.

Reference parity:
- micro multilabel average precision <-
  ``MultilabelAveragePrecision(num_labels=C, average="micro")``
  (/root/reference/TFAM/train_and_eval.py:49). Micro-averaging flattens all
  (sample, class) pairs into one binary ranking problem; the AP definition is
  the non-interpolated sum over distinct-score thresholds
  ``AP = sum_n (R_n - R_{n-1}) * P_n`` (same as sklearn
  ``average_precision_score``, which torchmetrics matches).
- top-1 accuracy <- ``Accuracy(num_classes=12)``
  (/root/reference/TFAM/train_and_eval_frame_diff_MN.py:49).

The streaming accumulators mirror torchmetrics' update()/compute()/reset()
protocol: logits and labels are buffered on host (the reference's metric does
exactly this internally) and the ranking metric is computed once per epoch.
A jit-compatible fixed-shape implementation (``average_precision_jax``) is
provided for on-device use inside pjit'ed eval steps.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def average_precision_np(scores: np.ndarray, targets: np.ndarray) -> float:
    """Binary average precision over flattened scores with tie handling
    identical to sklearn/torchmetrics (thresholds at distinct score values).

    Args:
        scores: any-shape float scores (higher = more confident positive).
            Monotonic transforms (e.g. sigmoid) do not change the result.
        targets: same-shape binary {0,1} ground truth.
    """
    scores = np.asarray(scores, dtype=np.float64).ravel()
    targets = np.asarray(targets).ravel().astype(np.float64)
    total_pos = targets.sum()
    if total_pos == 0:
        return 0.0

    order = np.argsort(-scores, kind="stable")
    sorted_scores = scores[order]
    sorted_targets = targets[order]

    tps = np.cumsum(sorted_targets)
    fps = np.cumsum(1.0 - sorted_targets)

    # Threshold points: last index of each run of equal scores.
    distinct = np.where(np.diff(sorted_scores))[0]
    threshold_idxs = np.r_[distinct, scores.size - 1]

    precision = tps[threshold_idxs] / (tps[threshold_idxs] + fps[threshold_idxs])
    recall = tps[threshold_idxs] / total_pos

    recall_prev = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum((recall - recall_prev) * precision))


def average_precision_jax(scores: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Jit-compatible micro AP on fixed-shape inputs.

    Uses the per-positive-example formulation
    ``AP = (1/P) * sum_{i: y_i=1} precision@rank(i)`` which equals the
    thresholded formulation when scores are distinct; under ties it differs
    by at most the tie-group granularity (floating ties are measure-zero for
    real logits). Suitable for on-device eval; the host-side accumulator uses
    the exact tie-handling version.
    """
    scores = scores.ravel()
    targets = targets.ravel().astype(jnp.float32)
    order = jnp.argsort(-scores)
    sorted_targets = targets[order]
    tps = jnp.cumsum(sorted_targets)
    ranks = jnp.arange(1, scores.size + 1, dtype=jnp.float32)
    precision_at_i = tps / ranks
    total_pos = jnp.maximum(tps[-1], 1.0)
    ap = jnp.sum(precision_at_i * sorted_targets) / total_pos
    return jnp.where(tps[-1] > 0, ap, 0.0)


class MultilabelAveragePrecision:
    """Streaming micro-averaged multilabel AP (torchmetrics-compatible).

    Matches ``torchmetrics.classification.MultilabelAveragePrecision(
    num_labels=C, average="micro")`` as used at
    /root/reference/TFAM/train_and_eval.py:49,87-94.
    """

    def __init__(self, num_labels: int, average: str = "micro"):
        if average != "micro":
            raise NotImplementedError(
                "Only micro averaging is used by the reference (train_and_eval.py:49)."
            )
        self.num_labels = num_labels
        self.reset()

    def reset(self) -> None:
        self._scores: list[np.ndarray] = []
        self._targets: list[np.ndarray] = []

    def update(self, logits, targets) -> None:
        logits = np.asarray(logits, dtype=np.float32)
        targets = np.asarray(targets)
        if logits.shape[-1] != self.num_labels:
            raise ValueError(
                f"expected {self.num_labels} labels, got {logits.shape[-1]}"
            )
        self._scores.append(logits.reshape(-1, self.num_labels))
        self._targets.append(targets.reshape(-1, self.num_labels))

    def compute(self) -> float:
        if not self._scores:
            return 0.0
        scores = np.concatenate(self._scores, axis=0)
        targets = np.concatenate(self._targets, axis=0)
        return average_precision_np(scores, targets)


class DeviceMultilabelAveragePrecision:
    """Micro multilabel AP accumulated ON DEVICE — logits never leave HBM.

    TPU-native alternative to :class:`MultilabelAveragePrecision`: per-batch
    logits/targets stay as device arrays, ``compute`` concatenates them and
    runs the jit'ed :func:`average_precision_jax`, and only the scalar is
    fetched. On this image's tunneled chip host fetches run ~17 MB/s
    (CLAUDE.md), so fetching one float instead of an (N, C) logit matrix is
    the difference between a usable and an unusable eval loop.

    Numerics: exact AP when scores are distinct; under score ties it uses
    the per-positive formulation, which can differ from the
    sklearn/torchmetrics thresholded value by up to the tie-group
    granularity (tests/test_metrics.py pins both properties). Real float32
    logits make ties measure-zero, hence opt-in via
    ``TrainingConfig.device_metric``.

    Memory bound: the accumulator holds every updated row in HBM —
    ``N x num_labels`` float32 for scores plus the same for targets
    (AK val: 6,094 x 140 ~= 7 MB, negligible). A corpus-scale eval would
    grow without limit, so updates past ``capacity`` rows raise loudly
    instead of OOMing silently mid-epoch; raise ``capacity`` explicitly
    (and budget 8 * capacity * num_labels bytes of HBM) for bigger evals,
    or use the host-side :class:`MultilabelAveragePrecision`.
    """

    device_resident = True  # trainers feed raw device arrays, no host fetch

    def __init__(
        self, num_labels: int, average: str = "micro", capacity: int = 1_000_000
    ):
        if average != "micro":
            raise NotImplementedError("reference uses micro averaging only")
        self.num_labels = num_labels
        self.capacity = capacity
        import jax

        self._ap = jax.jit(average_precision_jax)
        self.reset()

    def reset(self) -> None:
        self._scores = []
        self._targets = []
        self._rows = 0

    def update(self, logits, targets) -> None:
        if logits.shape[-1] != self.num_labels:
            raise ValueError(
                f"expected {self.num_labels} labels, got {logits.shape[-1]}"
            )
        rows = int(np.prod(logits.shape[:-1])) if logits.ndim > 1 else 1
        if self._rows + rows > self.capacity:
            raise RuntimeError(
                f"DeviceMultilabelAveragePrecision would exceed its "
                f"{self.capacity}-row device buffer ({self._rows} + {rows} "
                f"rows x {self.num_labels} labels); raise `capacity` "
                f"(costs ~8*capacity*num_labels bytes HBM) or switch to the "
                f"host-side MultilabelAveragePrecision"
            )
        self._rows += rows
        self._scores.append(jnp.reshape(logits, (-1, self.num_labels)))
        self._targets.append(jnp.reshape(targets, (-1, self.num_labels)))

    def compute(self) -> float:
        if not self._scores:
            return 0.0
        scores = jnp.concatenate(self._scores, axis=0)
        targets = jnp.concatenate(self._targets, axis=0)
        return float(self._ap(scores, targets))


class TopKAccuracy:
    """Streaming top-1 (or top-k) accuracy for the single-label MammalNet
    variants (reference ``Accuracy(num_classes=12)``,
    /root/reference/TFAM/train_and_eval_frame_diff_MN.py:49)."""

    def __init__(self, top_k: int = 1):
        self.top_k = top_k
        self.reset()

    def reset(self) -> None:
        self._correct = 0
        self._total = 0

    def update(self, logits, targets) -> None:
        logits = np.asarray(logits)
        targets = np.asarray(targets)
        if targets.ndim == logits.ndim:  # one-hot -> indices
            targets = targets.argmax(axis=-1)
        topk = np.argsort(-logits, axis=-1)[..., : self.top_k]
        self._correct += int((topk == targets[..., None]).any(axis=-1).sum())
        self._total += int(targets.size)

    def compute(self) -> float:
        return self._correct / self._total if self._total else 0.0
