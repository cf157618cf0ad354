"""Preemption-safe training (round 5, VERDICT r4 #5): SIGTERM/SIGINT land a
mid-epoch checkpoint through the tested resume mechanism and the trainer
returns cleanly; resuming continues BIT-identically vs an uninterrupted run.

TPU fleet preemption is the normal case for long jobs; the reference has no
restart logic at all (SURVEY.md §5 — train.py loses the epoch), so this is
framework surface the rebuild owns. Covers: the PreemptionGuard latch, the
student trainer end-to-end (deterministic in-process signal + a REAL
subprocess killed with SIGTERM), and the TFAM trainer."""

import os
import signal
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

from vimoclip_tpu.data import EmbeddingWriter
from vimoclip_tpu.data.segment_dataset import SegmentDataset
from vimoclip_tpu.data.video_reader import write_video
from vimoclip_tpu.models.clip_vit import ClipVisionConfig
from vimoclip_tpu.train.student_trainer import StudentTrainer
from vimoclip_tpu.utils.preemption import PreemptionGuard

CFG = ClipVisionConfig(
    image_size=32, patch_size=8, hidden_size=32, num_layers=1,
    num_heads=2, intermediate_size=64, projection_dim=16,
)
C = 5


def _make_corpus(root):
    rng = np.random.default_rng(0)
    vdir = root / "motion"
    vdir.mkdir()
    h5 = str(root / "teacher.h5")
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


@pytest.fixture
def corpus(tmp_path):
    return _make_corpus(tmp_path)


def _make_trainer(corpus, ckpt_dir, mesh, **kw):
    h5, vdir = corpus
    return StudentTrainer(
        SegmentDataset(h5, vdir, sequence_length=6),
        SegmentDataset(h5, vdir, sequence_length=6),
        checkpoint_dir=ckpt_dir,
        vision_config=CFG, num_classes=C, lr=3e-3, batch_size=4,
        num_workers=1, epochs=2, half_precision=False, mesh=mesh,
        **kw,
    )


def _params_np(trainer):
    return [np.asarray(x) for x in jax.tree.leaves(trainer.state.params)]


# ---------------------------------------------------------------------------
# the guard itself
# ---------------------------------------------------------------------------


def test_guard_latches_and_restores():
    """First signal latches `requested` (no exception); handlers are
    restored on exit; a second signal during the drain re-raises."""
    old = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.requested
        signal.raise_signal(signal.SIGTERM)  # delivered synchronously
        assert guard.requested
    assert signal.getsignal(signal.SIGTERM) is old

    # second signal: the guard un-shields and re-delivers — with a
    # catchable handler installed we observe the re-delivery
    hits = []
    signal.signal(signal.SIGTERM, lambda s, f: hits.append(s))
    try:
        with PreemptionGuard() as guard:
            signal.raise_signal(signal.SIGTERM)
            assert guard.requested and not hits
            signal.raise_signal(signal.SIGTERM)
            assert hits == [signal.SIGTERM]
    finally:
        signal.signal(signal.SIGTERM, old)


def test_guard_is_inert_off_main_thread():
    """From a worker thread the guard installs nothing (signal.signal would
    raise) and degrades to an inert flag."""
    import threading

    out = {}

    def run():
        with PreemptionGuard() as guard:
            out["installed"] = guard._installed
            out["requested"] = guard.requested

    t = threading.Thread(target=run)
    t.start()
    t.join(timeout=10)
    assert out == {"installed": False, "requested": False}


# ---------------------------------------------------------------------------
# student trainer: deterministic in-process preemption + bit-identical resume
# ---------------------------------------------------------------------------


def test_student_preempt_resume_matches_uninterrupted(corpus, tmp_path, mesh8):
    """SIGTERM after step 3: train() checkpoints mid-epoch and RETURNS (no
    exception); a resumed run lands on bit-identical parameters vs a run
    that was never preempted."""
    # --- reference run: no interruption ---
    a = _make_trainer(corpus, str(tmp_path / "a"), mesh8)
    assert len(a.train_loader) >= 3
    a.train()
    assert a.preempted is False  # multi-run drivers key off this latch
    params_a = _params_np(a)
    steps_a = int(a.state.step)

    # --- preempted run: raise SIGTERM inside the step-3 boundary (the
    # handler installed by train()'s PreemptionGuard runs synchronously,
    # so the loop's post-step check fires deterministically) ---
    b = _make_trainer(corpus, str(tmp_path / "b"), mesh8)
    real_step = b._train_step
    count = {"n": 0}

    def signalling_step(state, batch):
        out = real_step(state, batch)
        count["n"] += 1
        if count["n"] == 2:
            signal.raise_signal(signal.SIGTERM)
        return out

    b._train_step = signalling_step
    b.train()  # returns cleanly — no exception, no dead process
    # the consumed SIGTERM is surfaced to multi-run drivers (sweep /
    # fullgeom stop starting NEW arms on it; the grace deadline is ticking)
    assert b.preempted is True
    assert count["n"] == 2  # stopped at the step boundary, not at epoch end
    assert int(b.state.step) == 2
    # the resume checkpoint carries mid-epoch bookkeeping
    latest = b.ckpt.latest_step_name()
    _, extra = b.ckpt.restore(b.state, latest)
    assert extra["batch_in_epoch"] == 2

    # --- fresh process resumes and finishes ---
    c = _make_trainer(corpus, str(tmp_path / "b"), mesh8, resume=True)
    c.train()
    assert c.preempted is False  # the latch resets per train() call
    assert int(c.state.step) == steps_a
    for pa, pc in zip(params_a, _params_np(c)):
        np.testing.assert_array_equal(pa, pc)


# ---------------------------------------------------------------------------
# TFAM trainer: same mechanism
# ---------------------------------------------------------------------------


def test_tfam_preempt_then_resume(tmp_path, mesh8):
    from vimoclip_tpu.config import (
        DataConfig, ExperimentConfig, LoggingConfig, TFAMModelConfig,
        TrainingConfig,
    )
    from vimoclip_tpu.train.tfam_trainer import TFAMTrainer

    D, NC = 32, 6
    rng = np.random.default_rng(3)
    rgb_path = str(tmp_path / "rgb.h5")
    mot_path = str(tmp_path / "motion.h5")
    with EmbeddingWriter(rgb_path, num_classes=NC, embed_dim=D) as wr, \
         EmbeddingWriter(mot_path, embed_dim=D) as wm:
        for i in range(24):
            t = int(rng.integers(6, 14))
            labels = np.zeros(NC, np.float32)
            labels[rng.integers(0, NC)] = 1
            wr.write_video(f"v{i:03d}.mp4",
                           rng.normal(size=(t, D)).astype(np.float32),
                           labels=labels)
            wm.write_video(f"v{i:03d}",
                           rng.normal(size=(t - 1, D)).astype(np.float32))

    def make(tag, resume=False):
        cfg = ExperimentConfig(
            training=TrainingConfig(epochs=2, batch_size=8, num_workers=1,
                                    lr=3e-3, seed=7, resume=resume),
            logging=LoggingConfig(),
            data=DataConfig(num_classes=NC, train_dataset_path=rgb_path,
                            val_dataset_path=rgb_path,
                            flow_dataset_path=mot_path, length_bucket=8),
            model=TFAMModelConfig(d_model=D, nhead=4, num_layers=1,
                                  dim_feedforward=64, dropout=0.0,
                                  mlp_dropout=0.0),
        )
        return TFAMTrainer(cfg, log_dir=str(tmp_path / f"l{tag}"),
                           checkpoint_dir=str(tmp_path / f"c{tag}"),
                           mesh=mesh8)

    a = make("a")
    a.train()
    params_a = _params_np(a)
    steps_a = int(a.state.step)

    b = make("b")
    real_step = b._train_step
    count = {"n": 0}

    def signalling_step(state, arrays, key):
        out = real_step(state, arrays, key)
        count["n"] += 1
        if count["n"] == 2:
            signal.raise_signal(signal.SIGTERM)
        return out

    b._train_step = signalling_step
    b.train()
    assert int(b.state.step) == 2
    _, extra = b.ckpt.restore(b.state, b.ckpt.latest_step_name())
    assert extra["batch_in_epoch"] == 2

    c = make("b", resume=True)
    c.train()
    assert int(c.state.step) == steps_a
    for pa, pc in zip(params_a, _params_np(c)):
        np.testing.assert_array_equal(pa, pc)


# ---------------------------------------------------------------------------
# a REAL training process killed with SIGTERM exits 0 with a resumable
# checkpoint (the fleet-preemption shape end to end)
# ---------------------------------------------------------------------------

_WORKER = textwrap.dedent("""
    import os, sys, time
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    sys.path.insert(0, os.path.dirname(__file__))
    from test_preemption import CFG, C
    from vimoclip_tpu.data.segment_dataset import SegmentDataset
    from vimoclip_tpu.train.student_trainer import StudentTrainer

    h5, vdir, ckpt = sys.argv[1], sys.argv[2], sys.argv[3]
    trainer = StudentTrainer(
        SegmentDataset(h5, vdir, sequence_length=6),
        SegmentDataset(h5, vdir, sequence_length=6),
        checkpoint_dir=ckpt, vision_config=CFG, num_classes=C,
        lr=3e-3, batch_size=4, num_workers=1, epochs=50,
        half_precision=False, data_parallel=4, model_parallel=2,
    )
    real = trainer._train_step
    n = [0]
    def step(state, batch):
        out = real(state, batch)
        n[0] += 1
        print(f"STEP {n[0]}", flush=True)
        time.sleep(0.4)   # give the parent time to SIGTERM mid-epoch
        return out
    trainer._train_step = step
    trainer.train()       # preemption returns here cleanly
    print("CLEAN-EXIT", flush=True)
""")


@pytest.mark.slow
def test_sigterm_kills_training_subprocess_cleanly(tmp_path):
    corpus = _make_corpus(tmp_path)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    # the worker imports this test module for the shared tiny config
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(__file__), env.get("PYTHONPATH", "")]
    )
    ckpt = str(tmp_path / "ckpt")
    proc = subprocess.Popen(
        [sys.executable, str(worker), corpus[0], corpus[1], ckpt],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    lines = []
    try:
        # wait until training is demonstrably mid-epoch, then preempt
        for line in proc.stdout:
            lines.append(line)
            if line.startswith("STEP 2"):
                proc.send_signal(signal.SIGTERM)
                break
        lines.append(proc.stdout.read())
        rc = proc.wait(timeout=240)
    finally:
        if proc.poll() is None:
            proc.kill()
    out = "".join(lines)
    assert rc == 0, f"worker did not exit cleanly:\n{out}"
    assert "CLEAN-EXIT" in out
    # the checkpoint it left behind is resumable mid-epoch
    import glob
    assert glob.glob(os.path.join(ckpt, "step_*")), "no checkpoint saved"
    resumed = _make_trainer(corpus, ckpt, None, resume=True,
                            data_parallel=4, model_parallel=2)
    latest = resumed.ckpt.latest_step_name()
    _, extra = resumed.ckpt.restore(resumed.state, latest)
    assert "batch_in_epoch" in extra or "epoch" in extra
