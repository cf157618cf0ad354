"""Resilience tests: checkpoint portability across mesh geometries (elastic
resume — SURVEY.md §5 notes the reference has no restart logic at all) and
sequence-length capping."""

import numpy as np
import pytest

import jax

from vimoclip_tpu.config import (
    DataConfig,
    ExperimentConfig,
    LoggingConfig,
    TFAMModelConfig,
    TrainingConfig,
)
from vimoclip_tpu.data import EmbeddingWriter, PairedEmbeddingDataset, collate_pad
from vimoclip_tpu.parallel import MeshConfig, create_mesh
from vimoclip_tpu.train.tfam_trainer import TFAMTrainer

D, C = 32, 6


def _fixtures(tmp_path, n=16, seed=3):
    rng = np.random.default_rng(seed)
    rgb, motion = str(tmp_path / "rgb.h5"), str(tmp_path / "mot.h5")
    with EmbeddingWriter(rgb, num_classes=C, embed_dim=D) as wr, \
         EmbeddingWriter(motion, embed_dim=D) as wm:
        for i in range(n):
            t = int(rng.integers(6, 12))
            lab = np.zeros(C, np.float32)
            lab[i % C] = 1
            wr.write_video(f"v{i:02d}.mp4",
                           rng.normal(size=(t, D)).astype(np.float32), labels=lab)
            wm.write_video(f"v{i:02d}",
                           rng.normal(size=(t - 1, D)).astype(np.float32))
    return rgb, motion


def _config(rgb, motion, epochs=1):
    return ExperimentConfig(
        training=TrainingConfig(epochs=epochs, batch_size=8, num_workers=1,
                                lr=1e-3, seed=49),
        logging=LoggingConfig(),
        data=DataConfig(num_classes=C, train_dataset_path=rgb,
                        val_dataset_path=rgb, flow_dataset_path=motion,
                        length_bucket=8),
        model=TFAMModelConfig(d_model=D, nhead=4, num_layers=1,
                              dim_feedforward=64, dropout=0.0, mlp_dropout=0.0),
    )


def test_checkpoint_portable_across_mesh_geometries(tmp_path, devices):
    """Save on a 4x2 (dp x tp) mesh, resume on an 8x1 mesh — the sharded
    FFN weights must redistribute to the new partitioning."""
    rgb, motion = _fixtures(tmp_path)
    ckpt = str(tmp_path / "ckpt")

    mesh_a = create_mesh(MeshConfig(4, 2))
    cfg = _config(rgb, motion, epochs=1)
    t1 = TFAMTrainer(cfg, log_dir=str(tmp_path / "l1"), checkpoint_dir=ckpt,
                     mesh=mesh_a)
    t1.train()
    params_a = jax.device_get(t1.state.params)

    mesh_b = create_mesh(MeshConfig(8, 1))
    cfg2 = _config(rgb, motion, epochs=2)
    cfg2.training.resume = True
    t2 = TFAMTrainer(cfg2, log_dir=str(tmp_path / "l2"), checkpoint_dir=ckpt,
                     mesh=mesh_b)
    # resume restores into the NEW mesh's shardings before training epoch 2
    t2.train()
    assert int(t2.state.step) == 2 * len(t1.train_loader)
    k = t2.state.params["layers_0"]["ffn_dense1"]["kernel"]
    # on the 8x1 mesh the model axis has size 1 -> full kernel per device
    assert k.addressable_shards[0].data.shape == (D, 64)

    # and the restored values actually came from the 4x2 run
    _, extra = t2.ckpt.restore(t2.state, "best")
    assert "epoch" in extra


def test_collate_max_seq_len_caps_and_masks(tmp_path):
    rgb, motion = _fixtures(tmp_path, n=4)
    ds = PairedEmbeddingDataset(rgb, motion)
    batch = collate_pad([ds[i] for i in range(4)], bucket=4, max_seq_len=8)
    assert batch["embeddings"].shape[1] <= 8
    assert batch["mask_rgb"].shape == batch["embeddings"].shape[:2]
    # masks never exceed the capped length
    assert batch["mask_rgb"].sum(1).max() <= 8
    ds.close()


def test_checkpoint_step_retention(tmp_path):
    import jax.numpy as jnp
    import optax

    from vimoclip_tpu.train.state import CheckpointManager, TrainState

    state = TrainState.create({"w": jnp.zeros(3)}, optax.sgd(0.1))
    ckpt = CheckpointManager(str(tmp_path / "c"), keep_steps=2)
    for step in (1, 2, 3, 4):
        ckpt.save(state, f"step_{step}")
    import os

    steps = sorted(d for d in os.listdir(ckpt.directory) if d.startswith("step_"))
    assert steps == ["step_3", "step_4"]
    assert ckpt.latest_step_name() == "step_4"
    # best is never pruned
    ckpt.save_if_best(state, 0.5)
    ckpt.save(state, "step_5")
    assert os.path.isdir(os.path.join(ckpt.directory, "best"))


def test_best_metric_survives_resume_from_step_checkpoint(tmp_path):
    """Regression (ADVICE.md round 1, medium): step checkpoints must carry
    the running best metric so a resumed run cannot overwrite ``best`` with
    a worse post-resume epoch."""
    import jax.numpy as jnp
    import optax

    from vimoclip_tpu.train.state import CheckpointManager, TrainState

    state = TrainState.create({"w": jnp.zeros(3)}, optax.sgd(0.1))
    ckpt = CheckpointManager(str(tmp_path / "c"))
    assert ckpt.save_if_best(state, 0.9)
    ckpt.save(state, "step_1", extra={"epoch": 0})

    # crash + restart: fresh manager restores from the LATEST step ckpt
    ckpt2 = CheckpointManager(str(tmp_path / "c"))
    assert ckpt2.best_metric == -float("inf")
    _, extra = ckpt2.restore(state, ckpt2.latest_step_name())
    assert extra["epoch"] == 0
    assert ckpt2.best_metric == 0.9
    # a worse epoch after resume must NOT replace best
    assert not ckpt2.save_if_best(state, 0.5)
    assert ckpt2.save_if_best(state, 0.95)


def test_default_data_config_has_no_seq_cap():
    """Reference semantics by default: no truncation cap — clips pad to the
    batch max however long (TFAM/data/dataset.py:86-103). The flash
    attention path keeps memory linear in T, so no guard is needed."""
    from vimoclip_tpu.config import DataConfig
    from vimoclip_tpu.data import collate_pad

    assert DataConfig().max_seq_len is None
    items = [
        {
            "video_id": f"v{i}",
            "embeddings": np.ones((t, 4), np.float32),
            "motion_embeddings": np.ones((t - 1, 4), np.float32),
            "labels": np.zeros(3, np.float32),
        }
        for i, t in enumerate([2100, 64])
    ]
    batch = collate_pad(items, bucket=128, max_seq_len=None)
    assert batch["embeddings"].shape[1] == 2176  # 2100 rounded to bucket
    assert batch["mask_rgb"][0].sum() == 2100  # nothing truncated


def test_checkpoint_restores_across_grad_clip_settings(tmp_path):
    """make_adam/make_adamw keep the optax chain structure invariant to
    grad_clip (identity stands in), so tools that don't know the training
    flags (vimo-predict, vimo-export-motion) can always build a matching
    restore template."""
    import jax
    import jax.numpy as jnp

    from vimoclip_tpu.train.state import (
        CheckpointManager, TrainState, make_adam, make_adamw,
    )

    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros(3)}
    # save WITH clipping, restore into a template WITHOUT (and vice versa)
    saved = TrainState.create(params, make_adam(1e-3, grad_clip=1.0))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(saved, "best")
    template = TrainState.create(
        jax.tree.map(jnp.zeros_like, params), make_adam(1e-3)
    )
    restored, _ = mgr.restore(template, "best")
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.ones((3, 3)))

    saved2 = TrainState.create(params, make_adamw(lambda s: 1e-4))
    mgr2 = CheckpointManager(str(tmp_path / "ck2"))
    mgr2.save(saved2, "best")
    template2 = TrainState.create(
        jax.tree.map(jnp.zeros_like, params),
        make_adamw(lambda s: 1e-4, grad_clip=5.0),
    )
    restored2, _ = mgr2.restore(template2, "best")
    np.testing.assert_array_equal(np.asarray(restored2.params["w"]),
                                  np.ones((3, 3)))


def test_legacy_single_element_chain_checkpoint_restores(tmp_path):
    """Regression (ADVICE.md round 2, low): checkpoints written by the
    PRE-fixed-chain revision (grad_clip=None => 1-element optax chain, no
    leading identity) must still restore into today's 2-element template —
    ``CheckpointManager.restore`` retries with the clip-less legacy template
    and re-prepends the stateless identity element."""
    import jax
    import jax.numpy as jnp
    import optax

    from vimoclip_tpu.train.state import (
        CheckpointManager, TrainState, make_adamw,
    )

    params = {"w": jnp.full((3, 3), 2.0), "b": jnp.zeros(3)}
    # the old revision's make_adamw(grad_clip=None): bare 1-element chain
    legacy_tx = optax.chain(
        optax.adamw(lambda s: 1e-4, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=0.1)
    )
    legacy = TrainState.create(params, legacy_tx)
    # advance one step so the adamw moments are non-trivial
    legacy = legacy.apply_gradients(jax.tree.map(jnp.ones_like, params))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(legacy, "best")

    template = TrainState.create(
        jax.tree.map(jnp.zeros_like, params), make_adamw(lambda s: 1e-4)
    )
    restored, _ = mgr.restore(template, "best")
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(legacy.params["w"])
    )
    assert int(restored.step) == 1
    # the adamw moments survived (identity contributes no array leaves, so
    # the two layouts have identical leaf sequences)
    legacy_leaves = jax.tree.leaves(legacy.opt_state)
    new_leaves = jax.tree.leaves(restored.opt_state)
    assert len(legacy_leaves) == len(new_leaves)
    for a, b in zip(legacy_leaves, new_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
