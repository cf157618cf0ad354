"""Train state, optimizer schedules, and Orbax checkpointing.

Reference parity:
- AdamW(lr=1e-4, weight_decay=0.1) + CosineAnnealingLR(T_max=epochs,
  eta_min=1e-6) stepped once per EPOCH (TFAM/train_and_eval.py:53-56,162) —
  reproduced as an optax step-indexed schedule that changes value at epoch
  boundaries;
- Adam(lr) for stage-1 (train.py:66), optional global-norm grad clipping
  (train.py:105-106);
- checkpoints carry model + optimizer + scheduler + best-metric state
  (train_and_eval.py:133-149).

TPU-native upgrade: Orbax handles sharded arrays natively, and — unlike the
reference, which never resumes training (SURVEY.md §5) — ``CheckpointManager``
supports true train-resume (params, opt state, step, best metric, PRNG key).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import optax
import orbax.checkpoint as ocp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=tx.init(params), tx=tx,
        )

    def apply_gradients(self, grads):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params, opt_state=opt_state)


def cosine_annealing_schedule(
    base_lr: float, epochs: int, steps_per_epoch: int, eta_min: float = 1e-6
) -> optax.Schedule:
    """torch CosineAnnealingLR stepped per epoch:
    lr(e) = eta_min + (base - eta_min) * (1 + cos(pi * e / T_max)) / 2,
    constant within an epoch (scheduler.step() after each epoch,
    train_and_eval.py:162)."""

    def schedule(step):
        epoch = step // steps_per_epoch
        cos = jnp.cos(jnp.pi * epoch / epochs)
        return eta_min + (base_lr - eta_min) * (1.0 + cos) / 2.0

    return schedule


# Both factories keep the chain LENGTH fixed whether or not grad clipping
# is on (identity stands in — its state is EmptyState, same as
# clip_by_global_norm's), so a checkpoint saved with any grad_clip setting
# restores into a template built with any other: restore targets in tools
# that don't know the training flags (vimo-predict, vimo-export-motion)
# always structurally match.


def make_adamw(
    lr,
    weight_decay: float = 0.1,
    grad_clip: float | None = None,
) -> optax.GradientTransformation:
    """AdamW matching torch defaults (betas (0.9, 0.999), eps 1e-8, decoupled
    decay — torch scales decay by lr, as optax.adamw does)."""
    clip = (optax.clip_by_global_norm(grad_clip) if grad_clip is not None
            else optax.identity())
    return optax.chain(
        clip,
        optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay),
    )


def make_adam(lr, grad_clip: float | None = None) -> optax.GradientTransformation:
    """Plain Adam for stage-1 (reference train.py:66)."""
    clip = (optax.clip_by_global_norm(grad_clip) if grad_clip is not None
            else optax.identity())
    return optax.chain(clip, optax.adam(lr))


class CheckpointManager:
    """Orbax-backed checkpointing with best-model tracking and true resume.

    Layout: ``<dir>/best`` holds the best-by-metric state (the reference's
    ``best_model.pth``, train_and_eval.py:145-147); ``<dir>/step_N`` holds
    periodic full states for resume (reference train.py:167 saves per-epoch).
    """

    def __init__(self, directory: str, keep_steps: int | None = None,
                 async_save: bool = False):
        """``keep_steps``: retain only the newest N ``step_*`` checkpoints
        (None = keep all, the reference's per-epoch behavior,
        train.py:167).

        ``async_save``: return from :meth:`save` as soon as Orbax has
        snapshotted the arrays (device->host copy) and let serialization
        run on Orbax's background thread while training continues — the
        standard TPU idiom for hiding multi-second checkpoint writes of
        big states behind compute. Ordering stays safe: Orbax finishes any
        in-flight save before starting the next, commits each checkpoint
        directory atomically (a crash mid-write leaves no restorable
        ``step_N``), and :meth:`wait_until_finished` (called by the
        trainers after the last epoch and before any restore) joins the
        background work. Off by default: synchronous saves are the
        reference-like behavior and what the bit-identical mid-epoch
        resume tests pin by construction."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.best_metric: float = -float("inf")
        self.keep_steps = keep_steps
        self.async_save = async_save

    def _payload(self, state: TrainState) -> dict:
        return {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
        }

    def save(self, state: TrainState, name: str, extra: dict | None = None) -> None:
        path = os.path.join(self.directory, name)
        # StandardCheckpointer is an AsyncCheckpointer: save() returns once
        # the arrays are snapshotted to host and it has WAITED for any
        # previous in-flight save, so back-to-back saves never interleave.
        self._ckptr.save(path, self._payload(state), force=True)
        if not self.async_save:
            self._ckptr.wait_until_finished()
        # Scalar metadata (epoch, best metric) lives in a JSON sidecar — the
        # array tree stays a clean Orbax pytree. The running best metric is
        # stamped into EVERY checkpoint (not just ``best``) so that resuming
        # from a step checkpoint restores best-model tracking; otherwise the
        # first post-resume epoch would always overwrite ``best`` even with a
        # worse metric (round-1 advisor finding, ADVICE.md).
        extra = dict(extra or {})
        if "best_metric" not in extra and self.best_metric != -float("inf"):
            extra["best_metric"] = float(self.best_metric)
        with open(os.path.join(path, "extra.json"), "w") as f:
            json.dump(extra, f)
        if self.keep_steps is not None and name.startswith("step_"):
            self._prune_steps()

    def _step_dirs(self) -> list[str]:
        """Committed ``step_N`` directories only: an async save's
        uncommitted tmp dir is named ``step_N.orbax-checkpoint-tmp-*`` and
        must be neither pruned nor offered for resume."""
        out = []
        for d in os.listdir(self.directory):
            tail = d[len("step_"):]
            if (d.startswith("step_") and tail.isdigit()
                    and os.path.isdir(os.path.join(self.directory, d))):
                out.append(d)
        return out

    def _prune_steps(self) -> None:
        import shutil

        steps = sorted(self._step_dirs(), key=lambda s: int(s.split("_")[1]))
        for stale in steps[: max(0, len(steps) - self.keep_steps)]:
            shutil.rmtree(os.path.join(self.directory, stale), ignore_errors=True)

    def save_if_best(
        self, state: TrainState, metric: float, extra: dict | None = None
    ) -> bool:
        """Keep ``best`` = highest metric (val mAP, train_and_eval.py:143)."""
        if metric > self.best_metric:
            self.best_metric = metric
            extra = dict(extra or {}, best_metric=float(metric))
            self.save(state, "best", extra)
            return True
        return False

    def wait_until_finished(self) -> None:
        """Join any in-flight async save (no-op when none is pending)."""
        self._ckptr.wait_until_finished()

    def restore(self, state: TrainState, name: str = "best") -> tuple[TrainState, dict]:
        # an in-flight async save of the very checkpoint being restored
        # must land first
        self._ckptr.wait_until_finished()
        path = os.path.join(self.directory, name)
        target = self._payload(state)
        try:
            restored = self._ckptr.restore(path, target=target)
        except Exception as primary_err:
            # Legacy fallback (ADVICE r2 #1): before the factories pinned the
            # chain length, grad_clip=None produced a 1-element opt_state
            # chain (no leading identity). Retry against that template and
            # re-prepend the template's identity element — it is stateless
            # (EmptyState), so reusing the fresh value is exact.
            opt = target["opt_state"]
            if not (isinstance(opt, tuple) and len(opt) >= 2):
                raise
            legacy = dict(target, opt_state=opt[1:])
            try:
                restored = self._ckptr.restore(path, target=legacy)
            except Exception:
                # the checkpoint isn't the legacy layout either (wrong
                # geometry, corruption, ...) — surface the ORIGINAL error,
                # not a confusing complaint about the clip-less template
                raise primary_err
            restored = dict(restored)
            restored["opt_state"] = (opt[0],) + tuple(restored["opt_state"])
        new_state = state.replace(
            step=jnp.asarray(restored["step"]),
            params=restored["params"],
            opt_state=restored["opt_state"],
        )
        extra_path = os.path.join(path, "extra.json")
        extra = {}
        if os.path.exists(extra_path):
            with open(extra_path) as f:
                extra = json.load(f)
        if "best_metric" in extra:
            self.best_metric = float(extra["best_metric"])
        return new_state, extra

    def latest_step_name(self) -> str | None:
        steps = self._step_dirs()
        if not steps:
            return None
        return max(steps, key=lambda s: int(s.split("_")[1]))
