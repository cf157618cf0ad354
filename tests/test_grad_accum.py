"""Gradient accumulation (training.grad_accum / --grad-accum): N equal
microbatches accumulate on device into ONE optimizer update — the
batch_size loss surface at batch_size/N activation memory.

The equality tests swap the optimizer for SGD(1.0) so updated params ARE
the (negated) gradients: comparing through Adam would amplify f32
summation-order noise by 1/eps on near-zero gradient entries and say
nothing about the accumulation itself."""

import copy

import jax
import numpy as np
import optax
import pytest

from vimoclip_tpu.config import (
    DataConfig,
    ExperimentConfig,
    LoggingConfig,
    TFAMModelConfig,
    TrainingConfig,
)
from vimoclip_tpu.data import EmbeddingWriter
from vimoclip_tpu.train.state import TrainState
from vimoclip_tpu.train.tfam_trainer import TFAMTrainer

D, C = 32, 6


def _make_fixtures(tmp_path, n_videos=24, seed=0):
    rng = np.random.default_rng(seed)
    rgb_path = str(tmp_path / "rgb.h5")
    motion_path = str(tmp_path / "motion.h5")
    centers = rng.normal(size=(C, D)).astype(np.float32)
    with EmbeddingWriter(rgb_path, num_classes=C, embed_dim=D) as wr, \
         EmbeddingWriter(motion_path, embed_dim=D) as wm:
        for i in range(n_videos):
            t = int(rng.integers(6, 14))
            cls = int(rng.integers(0, C))
            emb = centers[cls] + 0.3 * rng.normal(size=(t, D)).astype(np.float32)
            labels = np.zeros(C, dtype=np.float32)
            labels[cls] = 1.0
            wr.write_video(f"v{i:03d}.mp4", emb, labels=labels)
            wm.write_video(
                f"v{i:03d}",
                centers[cls]
                + 0.3 * rng.normal(size=(t - 1, D)).astype(np.float32),
            )
    return rgb_path, motion_path


@pytest.fixture
def config(tmp_path):
    rgb, motion = _make_fixtures(tmp_path)
    return ExperimentConfig(
        training=TrainingConfig(epochs=2, batch_size=8, num_workers=2,
                                lr=3e-3, seed=49),
        logging=LoggingConfig(),
        data=DataConfig(num_classes=C, train_dataset_path=rgb,
                        val_dataset_path=rgb, flow_dataset_path=motion,
                        length_bucket=8),
        # masked_pooling=True: the batch-INVARIANT pooling variant. Under
        # the reference's quirk pooling (batch-max denominators,
        # masked_pooling=False) a microbatch pools over ITS own max valid
        # length, so splitting a batch legitimately changes the loss —
        # exactly like changing the reference's batch size does. Equality
        # is only defined (and pinned here) for the invariant variant; the
        # dropout-recipe test below trains the quirk default.
        model=TFAMModelConfig(d_model=D, nhead=4, num_layers=1,
                              dim_feedforward=64, dropout=0.0,
                              mlp_dropout=0.0, masked_pooling=True),
    )


def _sgd(trainer):
    """Swap the trainer's optimizer for SGD(1.0): after one step,
    old_params - new_params == the gradients the step computed."""
    trainer.state = TrainState.create(trainer.state.params, optax.sgd(1.0))
    trainer._train_step = trainer._build_train_step()
    return trainer


def _one_batch(trainer):
    trainer.train_loader.set_epoch(0)
    batch = next(iter(trainer.train_loader))
    arrays = {k: v for k, v in batch.items() if k != "video_id"}
    return {
        k: jax.device_put(v, trainer.batch_sharding)
        for k, v in arrays.items()
    }


def _tfam_trainer(config, tmp_path, mesh8, tag, accum):
    cfg = copy.deepcopy(config)
    cfg.training.grad_accum = accum
    return TFAMTrainer(
        cfg, log_dir=str(tmp_path / f"l{tag}"),
        checkpoint_dir=str(tmp_path / f"c{tag}"), mesh=mesh8,
    )


def test_tfam_grad_accum_matches_full_batch(config, tmp_path, mesh8):
    """Dropout off: the accumulated step's gradients, loss and logits equal
    the plain full-batch step on the same batch (f32 summation order only)."""
    t1 = _sgd(_tfam_trainer(config, tmp_path, mesh8, "a1", 1))
    t2 = _sgd(_tfam_trainer(config, tmp_path, mesh8, "a2", 2))
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    batch = _one_batch(t1)
    key = t1._dropout_keys("dropout", 0)
    s1, loss1, logits1 = t1._train_step(t1.state, dict(batch), key)
    s2, loss2, logits2 = t2._train_step(t2.state, dict(batch), key)

    assert float(loss2) == pytest.approx(float(loss1), abs=1e-6)
    np.testing.assert_allclose(
        np.asarray(logits2), np.asarray(logits1), atol=1e-5,
        err_msg="accumulated logits lost batch order or values",
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_tfam_grad_accum_trains_reference_recipe(config, tmp_path, mesh8):
    """The dropout-0.1 recipe trains under grad_accum (per-microbatch keys
    split from the step key): finite losses, metric improves."""
    import dataclasses

    config.model = dataclasses.replace(
        config.model, dropout=0.1, mlp_dropout=0.1, masked_pooling=False
    )
    config.training.grad_accum = 2
    trainer = TFAMTrainer(
        config, log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "ckpt"), mesh=mesh8,
    )
    _, map_before = trainer.validate()
    trainer.train()
    _, map_after = trainer.validate()
    assert all(np.isfinite(h["train_loss"]) for h in trainer.history)
    assert map_after > map_before + 0.1, (map_before, map_after)


def test_tfam_grad_accum_composes_with_seq_parallel(config, tmp_path, devices):
    """grad_accum stacks with sequence parallelism: the accumulated ring
    step equals the dense full-batch step (dropout off, invariant pooling).
    The trainer builds its own (data=4, model=1, seq=2) mesh here."""
    dense = _sgd(_tfam_trainer(config, tmp_path, None, "d", 1))

    cfg = copy.deepcopy(config)
    cfg.training.grad_accum = 2
    cfg.training.seq_parallel = 2
    seq = TFAMTrainer(cfg, log_dir=str(tmp_path / "ls"),
                      checkpoint_dir=str(tmp_path / "cs"))
    assert dict(seq.mesh.shape) == {"data": 4, "model": 1, "seq": 2}
    seq = _sgd(seq)

    batch = _one_batch(dense)
    key = dense._dropout_keys("dropout", 0)
    s1, loss1, _ = dense._train_step(dense.state, dict(batch), key)
    s2, loss2, _ = seq._train_step(seq.state, dict(batch), key)
    assert float(loss2) == pytest.approx(float(loss1), abs=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tfam_grad_accum_composes_with_pipe_parallel(config, tmp_path, devices):
    """grad_accum stacks with pipeline parallelism: the accumulated GPipe
    step equals the dense full-batch step (dropout off, invariant pooling)."""
    import dataclasses

    config.model = dataclasses.replace(config.model, num_layers=2)
    # batch 16: each accumulation microbatch (8 rows) splits into 2 GPipe
    # microbatches of 4 rows, which shard over the 4-way data axis
    config.training.batch_size = 16
    dense = _sgd(_tfam_trainer(config, tmp_path, None, "pd", 1))

    cfg = copy.deepcopy(config)
    cfg.training.grad_accum = 2
    cfg.training.pipeline_parallel = 2
    pipe = TFAMTrainer(cfg, log_dir=str(tmp_path / "lp"),
                       checkpoint_dir=str(tmp_path / "cp"))
    assert dict(pipe.mesh.shape) == {"data": 4, "model": 1, "pipe": 2}
    pipe = _sgd(pipe)

    batch = _one_batch(dense)
    key = dense._dropout_keys("dropout", 0)
    s1, loss1, _ = dense._train_step(dense.state, dict(batch), key)
    s2, loss2, _ = pipe._train_step(pipe.state, dict(batch), key)
    assert float(loss2) == pytest.approx(float(loss1), abs=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tfam_grad_accum_validation(config, tmp_path, mesh8):
    config.training.grad_accum = 3  # does not divide batch_size 8
    with pytest.raises(ValueError, match="must divide batch_size"):
        TFAMTrainer(config, log_dir=str(tmp_path / "l"),
                    checkpoint_dir=str(tmp_path / "c"), mesh=mesh8)
    # 8 / 4 = 2 microbatch rows cannot shard over the 4-way data axis
    config.training.grad_accum = 4
    with pytest.raises(ValueError, match="data axis"):
        TFAMTrainer(config, log_dir=str(tmp_path / "l2"),
                    checkpoint_dir=str(tmp_path / "c2"), mesh=mesh8)


def test_grad_accum_yaml_key(tmp_path):
    from vimoclip_tpu.config import load_experiment_config

    path = tmp_path / "cfg.yaml"
    path.write_text("training:\n  batch_size: 8\n  grad_accum: 2\n")
    cfg = load_experiment_config(str(path))
    assert cfg.training.grad_accum == 2
    assert cfg.training.batch_size == 8


def test_student_grad_accum_matches_full_batch(tmp_path, mesh8):
    """The dropout-free student: accumulated step == full-batch step on the
    same batch (grads via the SGD swap, losses exactly)."""
    from vimoclip_tpu.data.segment_dataset import SegmentDataset
    from vimoclip_tpu.data.video_reader import write_video
    from vimoclip_tpu.models.clip_vit import ClipVisionConfig
    from vimoclip_tpu.train.student_trainer import StudentTrainer

    cfg = ClipVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, num_layers=1,
        num_heads=2, intermediate_size=64, projection_dim=16,
    )
    n_cls = 5
    rng = np.random.default_rng(0)
    vdir = tmp_path / "motion"
    vdir.mkdir()
    h5 = str(tmp_path / "teacher.h5")
    with EmbeddingWriter(h5, num_classes=n_cls,
                         embed_dim=cfg.projection_dim) as w:
        for i in range(10):
            t = int(rng.integers(8, 14))
            write_video(
                str(vdir / f"v{i}.mp4"),
                rng.integers(0, 256, (t - 1, 32, 48, 3), dtype=np.uint8),
            )
            labels = np.zeros(n_cls, np.float32)
            labels[rng.integers(0, n_cls)] = 1
            w.write_video(
                f"v{i}.mp4",
                rng.normal(size=(t, cfg.projection_dim)).astype(np.float32),
                labels=labels,
            )

    def make(tag, accum):
        ds = SegmentDataset(h5, str(vdir), sequence_length=6)
        return _sgd(StudentTrainer(
            ds, ds, checkpoint_dir=str(tmp_path / f"ck{tag}"),
            vision_config=cfg, num_classes=n_cls, lr=3e-3, batch_size=8,
            num_workers=1, epochs=1, half_precision=False, mesh=mesh8,
            data_parallel=4, model_parallel=2, seed=49, grad_accum=accum,
        ))

    t1, t2 = make("a1", 1), make("a2", 2)
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    t1.train_loader.set_epoch(0)
    batch = next(iter(t1.train_loader))
    arrays = {
        k: jax.device_put(v, t1.batch_sharding)
        for k, v in batch.items() if k != "video_id"
    }
    s1, tot1, d1, c1, logits1 = t1._train_step(t1.state, dict(arrays))
    s2, tot2, d2, c2, logits2 = t2._train_step(t2.state, dict(arrays))

    assert float(tot2) == pytest.approx(float(tot1), abs=1e-6)
    assert float(d2) == pytest.approx(float(d1), abs=1e-6)
    assert float(c2) == pytest.approx(float(c1), abs=1e-6)
    np.testing.assert_allclose(
        np.asarray(logits2), np.asarray(logits1), atol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_student_grad_accum_validation(tmp_path, mesh8):
    from vimoclip_tpu.data.segment_dataset import SegmentDataset
    from vimoclip_tpu.data.video_reader import write_video
    from vimoclip_tpu.models.clip_vit import ClipVisionConfig
    from vimoclip_tpu.train.student_trainer import StudentTrainer

    cfg = ClipVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, num_layers=1,
        num_heads=2, intermediate_size=64, projection_dim=16,
    )
    vdir = tmp_path / "motion"
    vdir.mkdir()
    h5 = str(tmp_path / "teacher.h5")
    rng = np.random.default_rng(0)
    with EmbeddingWriter(h5, num_classes=3, embed_dim=16) as w:
        write_video(str(vdir / "v0.mp4"),
                    rng.integers(0, 256, (9, 32, 48, 3), dtype=np.uint8))
        w.write_video("v0.mp4",
                      rng.normal(size=(10, 16)).astype(np.float32),
                      labels=np.array([1, 0, 0], np.float32))
    ds = SegmentDataset(h5, str(vdir), sequence_length=6)
    with pytest.raises(ValueError, match="must divide"):
        StudentTrainer(ds, ds, checkpoint_dir=str(tmp_path / "c"),
                       vision_config=cfg, num_classes=3, batch_size=8,
                       mesh=mesh8, grad_accum=3)


def test_membench_artifact_pins_memory_claim():
    """MEMBENCH.json (round 5, VERDICT r4 #3) is the measured evidence for
    SCALING.md's "1/N activation memory" claim: XLA's static buffer
    assignment (``compiled.memory_analysis()``) for the SHIPPED student
    train step on the real chip (tools/bench_memory.py). This always-on
    test pins the artifact's integrity and the claim's shape:

    - batch 32 (the reference recipe, /root/reference/train.py:183) dense
      vs grad_accum=4 → the activation arena ("HLO temp") shrinks by >2×;
    - batch 64 dense demands MORE HBM than the 15.75 GiB v5e has (OOMs at
      compile, evidence string from the allocator), while batch 64 with
      grad_accum=8 compiles AND trains;
    - the temp arena tracks the MICROBATCH (b32/acc4 and b64/acc8, both
      microbatch 8, land within 5% of each other), which is the mechanism
      behind the claim, not an incidental win.
    """
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "MEMBENCH.json")) as f:
        art = json.load(f)
    by = {(r["batch_size"], r["grad_accum"]): r for r in art["results"]}
    assert set(by) == {(32, 1), (32, 4), (64, 1), (64, 8)}

    dense, accum = by[(32, 1)], by[(32, 4)]
    assert dense["status"] == accum["status"] == "ok"
    assert dense["temp_bytes"] > 2 * accum["temp_bytes"], (
        dense["temp_gib"], accum["temp_gib"])
    # same loss surface: accumulated == dense to f32 summation order
    assert abs(dense["total_loss"] - accum["total_loss"]) < 1e-3

    oom, rescued = by[(64, 1)], by[(64, 8)]
    assert oom["status"] == "oom"
    assert "memory space hbm" in oom["oom_evidence"].lower()
    assert rescued["status"] == "ok"
    assert np.isfinite(rescued["total_loss"])

    # microbatch-size invariance: both microbatch-8 arms share the arena
    assert abs(rescued["temp_bytes"] - accum["temp_bytes"]) \
        < 0.05 * accum["temp_bytes"]


def test_bench_memory_subset_merges_into_existing(tmp_path, monkeypatch):
    """A subset re-measure (--arms 32:1) must MERGE into an existing
    artifact, not clobber the committed 4-arm file the integrity test
    above pins; a stalled arm (TimeoutExpired) is recorded, not fatal."""
    import importlib.util
    import json
    import os
    import subprocess as sp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_memory", os.path.join(repo, "tools", "bench_memory.py"))
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)

    out = tmp_path / "MEMBENCH.json"
    existing = {"bench": "x", "results": [
        {"batch_size": b, "grad_accum": n, "status": "ok", "temp_bytes": i}
        for i, (b, n) in enumerate([(32, 1), (32, 4), (64, 1), (64, 8)])
    ]}
    out.write_text(json.dumps(existing))

    class _FakeProc:
        returncode = 0

    def fake_run(cmd, text=True, timeout=None):
        if "--arm-out" not in cmd:
            raise AssertionError(cmd)
        arm_out = cmd[cmd.index("--arm-out") + 1]
        b = int(cmd[cmd.index("--batch-size") + 1])
        n = int(cmd[cmd.index("--grad-accum") + 1])
        if (b, n) == (64, 8):
            raise sp.TimeoutExpired(cmd, timeout)
        with open(arm_out, "w") as f:
            json.dump({"batch_size": b, "grad_accum": n, "status": "ok",
                       "temp_bytes": 999}, f)
        return _FakeProc()

    monkeypatch.setattr(bm.subprocess, "run", fake_run)
    assert bm.main(["--out", str(out), "--arms", "32:1,64:8"]) == 0

    merged = {(r["batch_size"], r["grad_accum"]): r
              for r in json.loads(out.read_text())["results"]}
    assert set(merged) == {(32, 1), (32, 4), (64, 1), (64, 8)}
    assert merged[(32, 1)]["temp_bytes"] == 999          # re-measured
    assert merged[(32, 4)]["temp_bytes"] == 1            # preserved
    assert merged[(64, 1)]["temp_bytes"] == 2            # preserved
    assert "timeout" in merged[(64, 8)]["status"]        # recorded, not fatal
