"""Stage-1 distillation trainer end-to-end on synthetic fixtures: tiny CLIP
student, motion videos + teacher embedding HDF5, 8-device mesh. Distillation
loss must drop and best-checkpoint selection must work."""

import numpy as np
import pytest

from vimoclip_tpu.data import EmbeddingWriter
from vimoclip_tpu.data.segment_dataset import SegmentDataset
from vimoclip_tpu.data.video_reader import write_video
from vimoclip_tpu.models.clip_vit import ClipVisionConfig
from vimoclip_tpu.train.student_trainer import StudentTrainer

CFG = ClipVisionConfig(
    image_size=32, patch_size=8, hidden_size=32, num_layers=1,
    num_heads=2, intermediate_size=64, projection_dim=16,
)
C = 5


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    vdir = tmp_path / "motion"
    vdir.mkdir()
    h5 = str(tmp_path / "teacher.h5")
    with EmbeddingWriter(h5, num_classes=C, embed_dim=CFG.projection_dim) as w:
        for i in range(6):
            t = int(rng.integers(8, 14))
            write_video(
                str(vdir / f"v{i}.mp4"),
                rng.integers(0, 256, (t - 1, 32, 48, 3), dtype=np.uint8),
            )
            labels = np.zeros(C, np.float32)
            labels[rng.integers(0, C)] = 1
            w.write_video(
                f"v{i}.mp4",
                rng.normal(size=(t, CFG.projection_dim)).astype(np.float32),
                labels=labels,
            )
    return h5, str(vdir)


def test_student_trainer_end_to_end(corpus, tmp_path, mesh8):
    h5, vdir = corpus
    train_ds = SegmentDataset(h5, vdir, sequence_length=6)
    trainer = StudentTrainer(
        train_ds, train_ds,
        checkpoint_dir=str(tmp_path / "ckpt"),
        vision_config=CFG, num_classes=C, lr=3e-3, batch_size=4,
        num_workers=2, epochs=3, half_precision=False,
        class_pos_weight=9.0, grad_clip=1.0, mesh=mesh8,
        data_parallel=4, model_parallel=2,
    )
    before = trainer.evaluate()
    best = trainer.train()
    after = trainer.evaluate()
    assert np.isfinite(after["total"])
    assert after["total"] < before["total"], (before, after)
    assert best <= before["total"]

    # best checkpoint restores
    state2, extra = trainer.ckpt.restore(trainer.state, "best")
    assert "epoch" in extra


def test_student_trainer_ce_variant(corpus, tmp_path, mesh8):
    h5, vdir = corpus
    ds = SegmentDataset(h5, vdir, sequence_length=6)
    trainer = StudentTrainer(
        ds, ds, checkpoint_dir=str(tmp_path / "ckpt_ce"),
        vision_config=CFG, num_classes=C, lr=1e-3, batch_size=4,
        num_workers=1, epochs=1, half_precision=False,
        class_loss="ce", mesh=mesh8,
    )
    metrics = trainer.train_epoch(0)
    assert np.isfinite(metrics["total"])


def test_mid_epoch_resume_exactly_matches_uninterrupted(corpus, tmp_path, mesh8):
    """Beyond-reference elasticity: crash mid-epoch, resume from the last
    periodic checkpoint, and land on BIT-IDENTICAL parameters vs a run that
    never crashed (deterministic epoch-seeded shuffle + dropout-free
    student + f32). The reference loses the whole epoch (train.py:167)."""
    import jax

    h5, vdir = corpus

    def make(ckpt_dir, **kw):
        return StudentTrainer(
            SegmentDataset(h5, vdir, sequence_length=6),
            SegmentDataset(h5, vdir, sequence_length=6),
            checkpoint_dir=ckpt_dir,
            vision_config=CFG, num_classes=C, lr=3e-3, batch_size=4,
            num_workers=1, epochs=2, half_precision=False,
            class_pos_weight=9.0, mesh=mesh8, data_parallel=4,
            model_parallel=2, seed=49, **kw,
        )

    # --- reference run: no interruption ---
    a = make(str(tmp_path / "a"))
    n_batches = len(a.train_loader)
    assert n_batches >= 3
    a.train()
    params_a = jax.tree.map(np.asarray, a.state.params)
    steps_a = int(a.state.step)

    # --- interrupted run: die after 3 steps of epoch 0 ---
    b = make(str(tmp_path / "b"), checkpoint_every_steps=1)
    real_step = b._train_step
    count = {"n": 0}

    class Crash(RuntimeError):
        pass

    def crashing_step(state, batch):
        if count["n"] == 2:
            raise Crash()
        count["n"] += 1
        return real_step(state, batch)

    b._train_step = crashing_step
    with pytest.raises(Crash):
        b.train()

    # --- fresh process resumes and finishes ---
    c = make(str(tmp_path / "b"), checkpoint_every_steps=1, resume=True)
    c.train()
    params_c = jax.tree.map(np.asarray, c.state.params)
    assert int(c.state.step) == steps_a
    for pa, pc in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_c)):
        np.testing.assert_array_equal(pa, pc)


def test_empty_val_loader_rejected_at_construction(corpus, tmp_path, mesh8):
    """batch_size > val segments with drop_last yields ZERO val batches —
    that misconfiguration is fully known at construction time, so the
    trainer must fail BEFORE a training epoch is spent on it (ADVICE r4),
    not report val loss 0.0 (which save_if_best would record as an
    unbeatable 'best'). evaluate() keeps its own check as a backstop."""
    h5, vdir = corpus
    ds = SegmentDataset(h5, vdir, sequence_length=6)

    def make(batch_size):
        return StudentTrainer(
            ds, ds, checkpoint_dir=str(tmp_path / "ckpt"),
            vision_config=CFG, num_classes=C, lr=3e-3, batch_size=batch_size,
            num_workers=1, epochs=1, half_precision=False, mesh=mesh8,
            data_parallel=4, model_parallel=2,
        )

    with pytest.raises(ValueError, match="batch_size"):
        make(64)

    # the evaluate() backstop still fires if the loader empties later
    trainer = make(8)
    trainer.val_loader = []
    with pytest.raises(ValueError, match="0 batches"):
        trainer.evaluate()


def test_train_returns_restored_best_on_noop_resume(corpus, tmp_path, mesh8):
    """Resuming an already-finished run (no epochs left) must return the
    PERSISTED best val loss, not inf."""
    h5, vdir = corpus

    def make(**kw):
        return StudentTrainer(
            SegmentDataset(h5, vdir, sequence_length=6),
            SegmentDataset(h5, vdir, sequence_length=6),
            checkpoint_dir=str(tmp_path / "ckpt"),
            vision_config=CFG, num_classes=C, lr=3e-3, batch_size=4,
            num_workers=1, epochs=1, half_precision=False, mesh=mesh8,
            data_parallel=4, model_parallel=2, seed=49, **kw,
        )

    best1 = make().train()
    assert np.isfinite(best1)
    best2 = make(resume=True).train()  # start_epoch == epochs: no-op loop
    assert best2 == pytest.approx(best1, rel=1e-6)
