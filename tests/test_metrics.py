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


@pytest.mark.parametrize("k", [1, 2])
def test_topk_accuracy_matches_sklearn_oracle(k):
    """Oracle parity for the metric substituted for the reference's broken
    ``Accuracy(num_classes=12)`` (docs/QUIRKS.md #23): micro top-k accuracy,
    the semantics of ``torchmetrics.Accuracy(task="multiclass")`` /
    ``sklearn.top_k_accuracy_score``."""
    from sklearn.metrics import top_k_accuracy_score

    rng = np.random.default_rng(5)
    logits = rng.normal(size=(96, 12)).astype(np.float32)  # ties measure-zero
    labels = rng.integers(0, 12, size=96)
    acc = TopKAccuracy(top_k=k)
    for i in range(0, 96, 32):  # streamed, integer labels
        acc.update(logits[i:i + 32], labels[i:i + 32])
    ref = top_k_accuracy_score(labels, logits, k=k, labels=np.arange(12))
    assert acc.compute() == pytest.approx(ref, abs=1e-12)
    # one-hot labels (how the reference trainer feeds its metric,
    # train_and_eval_frame_diff_MN.py:88) give the identical result
    acc_oh = TopKAccuracy(top_k=k)
    acc_oh.update(logits, np.eye(12)[labels])
    assert acc_oh.compute() == pytest.approx(ref, abs=1e-12)


def test_topk_accuracy_matches_torchmetrics():
    """Direct torchmetrics oracle — the metric the reference INTENDED
    (its pinned 1.7.1 ``Accuracy(num_classes=12)`` without ``task=`` raises
    at construction; QUIRKS.md #23). Skips where torchmetrics isn't baked in
    (this image); runs wherever it is."""
    torchmetrics = pytest.importorskip("torchmetrics")
    import torch

    rng = np.random.default_rng(6)
    logits = rng.normal(size=(64, 12)).astype(np.float32)
    labels = rng.integers(0, 12, size=64)
    ref_metric = torchmetrics.Accuracy(task="multiclass", num_classes=12)
    ref = float(ref_metric(torch.from_numpy(logits), torch.from_numpy(labels)))
    acc = TopKAccuracy(top_k=1)
    acc.update(logits, labels)
    assert acc.compute() == pytest.approx(ref, abs=1e-6)


def test_device_metric_capacity_overflow_fails_loudly():
    """The device-resident accumulator holds N x C logits in HBM; past its
    row capacity it must raise with guidance, not OOM silently mid-epoch."""
    from vimoclip_tpu.metrics import DeviceMultilabelAveragePrecision

    dev = DeviceMultilabelAveragePrecision(num_labels=4, capacity=10)
    dev.update(jnp.zeros((6, 4)), jnp.zeros((6, 4)))
    with pytest.raises(RuntimeError, match="capacity"):
        dev.update(jnp.zeros((6, 4)), jnp.zeros((6, 4)))
    dev.reset()  # reset clears the row counter too
    dev.update(jnp.zeros((10, 4)), jnp.zeros((10, 4)))


def test_device_metric_matches_host_accumulator():
    """DeviceMultilabelAveragePrecision (on-device accumulation, scalar-only
    fetch) must equal the host metric on real-valued logits."""
    from vimoclip_tpu.metrics import DeviceMultilabelAveragePrecision

    logits, targets = _random_problem(3, b=48, c=10, pos_rate=0.15)
    host = MultilabelAveragePrecision(num_labels=10)
    dev = DeviceMultilabelAveragePrecision(num_labels=10)
    for i in range(0, 48, 16):  # streaming updates, device arrays in
        host.update(logits[i:i + 16], targets[i:i + 16])
        dev.update(jnp.asarray(logits[i:i + 16]), jnp.asarray(targets[i:i + 16]))
    assert abs(dev.compute() - host.compute()) < 1e-5
    dev.reset()
    assert dev.compute() == 0.0


def test_jax_ap_tie_divergence_is_bounded():
    """Documented tie behavior: under heavily quantized scores the on-device
    per-positive formulation may differ from the thresholded
    sklearn/torchmetrics value, but only within the tie-group granularity —
    pin both that it CAN differ and that it stays bounded."""
    rng = np.random.default_rng(7)
    targets = (rng.random((64, 8)) < 0.25).astype(np.float32)
    logits = rng.integers(0, 4, size=(64, 8)).astype(np.float32)  # 4 levels
    exact = average_precision_np(logits, targets)
    approx = float(average_precision_jax(jnp.asarray(logits), jnp.asarray(targets)))
    # max per-tie-group error is bounded by the positive mass in the group;
    # 0.05 is loose for 4 score levels over 512 pairs
    assert abs(exact - approx) < 0.05
    assert exact > 0.1  # sanity: non-degenerate problem


def test_trainer_device_metric_end_to_end(tmp_path):
    """TFAMTrainer with device_metric=True: validation mAP equals the
    host-metric trainer on identical params/data (distinct float logits)."""
    import dataclasses

    from tests.test_tfam_trainer import _make_fixtures, C, D
    from vimoclip_tpu.config import (
        DataConfig, ExperimentConfig, LoggingConfig, TFAMModelConfig,
        TrainingConfig,
    )
    from vimoclip_tpu.train.tfam_trainer import TFAMTrainer

    rgb, motion = _make_fixtures(tmp_path)
    def cfg(device_metric):
        return ExperimentConfig(
            training=TrainingConfig(epochs=1, batch_size=8, num_workers=1,
                                    seed=49, device_metric=device_metric),
            logging=LoggingConfig(),
            data=DataConfig(num_classes=C, train_dataset_path=rgb,
                            val_dataset_path=rgb, flow_dataset_path=motion,
                            length_bucket=8),
            model=TFAMModelConfig(d_model=D, nhead=4, num_layers=1,
                                  dim_feedforward=64, dropout=0.0,
                                  mlp_dropout=0.0),
        )

    t_host = TFAMTrainer(cfg(False), log_dir=str(tmp_path / "l1"),
                         checkpoint_dir=str(tmp_path / "c1"))
    t_dev = TFAMTrainer(cfg(True), log_dir=str(tmp_path / "l2"),
                        checkpoint_dir=str(tmp_path / "c2"))
    t_dev.state = t_dev.state.replace(params=t_host.state.params)
    _, map_host = t_host.validate()
    _, map_dev = t_dev.validate()
    assert abs(map_host - map_dev) < 1e-5


def test_keychain_prng_impl_deterministic():
    """KeyChain(impl='rbg') — the trainers' fast-dropout default — must be
    deterministic per (seed, name, index) and produce usable dropout keys."""
    import jax

    from vimoclip_tpu.prng import KeyChain

    a, b = KeyChain(49, impl="rbg"), KeyChain(49, impl="rbg")
    ka, kb = a("dropout", 3), b("dropout", 3)
    assert jnp.array_equal(jax.random.key_data(ka), jax.random.key_data(kb))
    assert not jnp.array_equal(
        jax.random.key_data(a("dropout", 3)), jax.random.key_data(a("dropout", 4))
    )
    # bits flow into bernoulli (the dropout primitive) without error
    mask = jax.random.bernoulli(ka, 0.9, (16, 16))
    assert 0.5 < float(mask.mean()) <= 1.0
    # the impl actually selects a different generator: key data shapes/
    # contents differ between threefry (2x uint32) and rbg (4x uint32)
    kt = KeyChain(49, impl="threefry2x32")("dropout", 3)
    assert jax.random.key_data(kt).shape != jax.random.key_data(ka).shape
