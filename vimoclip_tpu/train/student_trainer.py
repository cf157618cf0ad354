"""Stage-1 MoCLIP distillation trainer.

Reference parity (train.py / train_frame_diff.py / train_frame_diff_mn.py —
one trainer here, modality and dataset select via config):

- loss = distillation(student_distill, teacher_rgb[:, :-1, :]) +
  classification (train.py:98-99) — the teacher sequence is truncated by ONE
  frame to align with the T-1 motion frames (the off-by-one SURVEY.md §7
  flags as easy to get wrong);
- AK: pos-weighted BCE (default weight 9, train.py:199); MN: CE on argmax
  labels (train_frame_diff_mn.py:102);
- Adam(lr) + optional global-norm grad clip (train.py:66,105-106);
- per-epoch checkpoint + best-by-val-total-loss (train.py:167-175);
- evaluate() mirrors the loss computation without grads (train.py:14-49).

TPU-native: motion frames ship to device as uint8 (4x less PCIe/ICI traffic
than float32), preprocessing is fused on device, the whole step is one jit
over the (data, model) mesh.
"""

from __future__ import annotations

import functools

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from vimoclip_tpu import losses
from vimoclip_tpu.data import BatchLoader, prefetch_to_device
from vimoclip_tpu.data.segment_dataset import SegmentDataset, collate_segments
from vimoclip_tpu.models.clip_vit import ClipVisionConfig
from vimoclip_tpu.models.student import StudentModel
from vimoclip_tpu.parallel import (
    MeshConfig,
    STUDENT_PARTITION_RULES,
    batch_sharding,
    commit_replicated,
    create_mesh,
    shard_params,
)
from vimoclip_tpu.prng import KeyChain
from vimoclip_tpu.train.state import CheckpointManager, TrainState, make_adam
from vimoclip_tpu.utils.logging import StepTimer, SummaryWriter, progress


class StudentTrainer:
    def __init__(
        self,
        train_dataset: SegmentDataset,
        val_dataset: SegmentDataset,
        checkpoint_dir: str,
        log_dir: str | None = None,
        vision_config: ClipVisionConfig | None = None,
        pretrained_params: dict | None = None,
        num_classes: int = 140,
        alpha: float = 0.1,
        lr: float = 1e-5,
        # Measured batch-scaling on the v5e chip (docs/PERF.md): b2 -> 56%
        # MFU, b4 -> 67%, b8 -> 73% (2,980 frames/s). 8 is the TPU
        # operating point; any value (incl. the reference CLI default 32,
        # train.py:183) stays reachable via the flag.
        batch_size: int = 8,
        num_workers: int = 4,
        epochs: int = 10,
        distill_mode: str = "cosine",
        class_loss: str = "bce",  # bce (AK) | ce (MN)
        class_pos_weight: float | None = 9.0,
        grad_clip: float | None = None,
        seed: int = 49,
        data_parallel: int = -1,
        model_parallel: int = 1,
        half_precision: bool = True,
        mesh=None,
        checkpoint_every_steps: int | None = None,
        resume: bool = False,
        grad_accum: int = 1,
        async_checkpoint: bool = False,
    ):
        """``checkpoint_every_steps``: also checkpoint mid-epoch every N
        steps (stage-1 epochs over the full AK corpus decode every motion
        video — hours of work the reference loses entirely on a crash,
        train.py:167 saves per-epoch only). With ``resume=True`` training
        continues from the latest checkpoint, mid-epoch ones landing on the
        exact next batch (deterministic epoch-seeded shuffle).

        ``grad_accum``: split each batch into N equal microbatches and
        accumulate gradients on device before the single Adam update —
        the ``batch_size`` loss surface at ``batch_size / N`` activation
        memory (the student is dropout-free, so the trajectory matches
        ``grad_accum=1`` up to f32 summation order). Use it to reach the
        reference's batch 32 (train.py:183) on clips/backbones whose
        activations outgrow HBM."""
        self.mesh = mesh if mesh is not None else create_mesh(
            MeshConfig(data_parallel, model_parallel)
        )
        self.grad_accum = int(grad_accum)
        if self.grad_accum > 1:
            from vimoclip_tpu.parallel.mesh import DATA_AXIS as _DA

            n_data = self.mesh.shape[_DA]
            if batch_size % self.grad_accum:
                raise ValueError(
                    f"grad_accum={self.grad_accum} must divide "
                    f"batch_size={batch_size} (equal microbatches keep the "
                    "accumulated gradient identical to the full batch)"
                )
            if (batch_size // self.grad_accum) % n_data:
                raise ValueError(
                    f"batch_size/grad_accum = "
                    f"{batch_size // self.grad_accum} microbatch rows must "
                    f"divide the mesh's data axis ({n_data}) — lower "
                    "grad_accum or raise batch_size"
                )
        self.vision_config = vision_config or ClipVisionConfig.vit_b_32()
        self.model = StudentModel(
            vision_config=self.vision_config,
            num_classes=num_classes,
            alpha=alpha,
            dtype=jnp.bfloat16 if half_precision else jnp.float32,
        )
        self.epochs = epochs
        self.checkpoint_every_steps = checkpoint_every_steps
        self.resume = resume
        self.distill_mode = distill_mode
        self.class_loss = class_loss
        self.class_pos_weight = class_pos_weight
        self.keys = KeyChain(seed)
        self.ckpt = CheckpointManager(checkpoint_dir,
                                      async_save=async_checkpoint)
        self.writer = SummaryWriter(log_dir) if log_dir else None
        self.batch_sharding = batch_sharding(self.mesh)
        self.batch_size = batch_size
        self.val_ds = val_dataset
        if len(val_dataset) < batch_size:
            # known at construction: with drop_last the val loader would
            # yield 0 batches, discovered only AFTER a full training epoch
            # (evaluate() keeps the same check as a backstop)
            raise ValueError(
                f"validation set has {len(val_dataset)} segments < "
                f"batch_size {batch_size}: the drop_last val loader would "
                "produce 0 batches — lower batch_size or add validation data"
            )

        self.train_loader = BatchLoader(
            train_dataset, batch_size, collate_segments, shuffle=True,
            drop_last=True, seed=seed, num_workers=num_workers,
        )
        # drop_last on eval too: a tail batch smaller than the data-parallel
        # axis cannot be sharded (losses are batch-averaged either way).
        self.val_loader = BatchLoader(
            val_dataset, batch_size, collate_segments, shuffle=False,
            drop_last=True, num_workers=num_workers,
        )

        self._preempt = None  # set by train() while a PreemptionGuard is live
        self.preempted = False  # latched by train(); multi-run drivers
        # check it to stop starting NEW runs after a consumed SIGTERM
        params = self._init_params(pretrained_params, train_dataset)
        tx = make_adam(lr, grad_clip=grad_clip)
        self.state = commit_replicated(TrainState.create(params, tx), self.mesh)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def _init_params(self, pretrained: dict | None, train_dataset) -> dict:
        sample = train_dataset[0]
        t, h, w, _ = sample["motion_frames"].shape
        dummy = jnp.zeros((1, t, h, w, 3), jnp.uint8)
        params = self.model.init(self.keys("init"), dummy)["params"]
        if pretrained is not None:
            # CLIP-initialise the backbone (reference loads clip.load weights,
            # student_model.py:44); distill/head branches keep fresh init.
            # Deep-copy: the train step donates state buffers, and aliasing
            # the caller's arrays into state would delete them out from under
            # the caller (e.g. a teacher that keeps using the same weights).
            pretrained = jax.tree.map(
                lambda x: jnp.array(x, copy=True), pretrained
            )
            params = dict(params, visual_encoder=pretrained)
        return shard_params(params, STUDENT_PARTITION_RULES, self.mesh)

    def _losses(self, params, batch):
        _, distill_emb, logits = self.model.apply(
            {"params": params}, batch["motion_frames"]
        )
        # teacher truncated by one frame: T RGB embeddings vs T-1 motion
        # frames (train.py:98)
        teacher = batch["rgb_emb"][:, :-1, :]
        d_loss = losses.distillation_loss(distill_emb, teacher, self.distill_mode)
        if self.class_loss == "ce":
            c_loss = losses.cross_entropy_loss(logits, batch["labels"])
        else:
            c_loss = losses.classification_loss(
                logits, batch["labels"], self.class_pos_weight
            )
        return d_loss, c_loss, logits

    def _build_train_step(self):
        accum = self.grad_accum

        if accum <= 1:
            @functools.partial(jax.jit, donate_argnums=(0,))
            def step(state: TrainState, batch: dict):
                def loss_fn(params):
                    d_loss, c_loss, logits = self._losses(params, batch)
                    return d_loss + c_loss, (d_loss, c_loss, logits)

                (total, (d_loss, c_loss, logits)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params)
                return state.apply_gradients(grads), total, d_loss, c_loss, logits

            return step

        # Gradient accumulation (see __init__ docstring): lax.scan carries
        # one f32 params-sized gradient sum; activations (the dominant
        # stage-1 memory — T frames through a ViT fwd+bwd) exist for ONE
        # microbatch at a time. Equal microbatch sizes make the mean of
        # means the full-batch mean, so dropout-free gradients match
        # grad_accum=1 up to f32 summation order (tests/test_grad_accum.py).
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        mesh = self.mesh
        base_spec = self.batch_sharding.spec

        def split(x):
            y = x.reshape(accum, x.shape[0] // accum, *x.shape[1:])
            return jax.lax.with_sharding_constraint(
                y, NamedSharding(mesh, P(None, *base_spec))
            )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, batch: dict):
            micro = jax.tree.map(split, batch)

            def loss_fn(params, mb):
                d_loss, c_loss, logits = self._losses(params, mb)
                return d_loss + c_loss, (d_loss, c_loss, logits)

            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

            def body(carry, mb):
                g_acc, sums = carry
                (total, (d_loss, c_loss, logits)), grads = grad_fn(
                    state.params, mb
                )
                g_acc = jax.tree.map(jnp.add, g_acc, grads)
                return (g_acc, sums + jnp.stack([total, d_loss, c_loss])), logits

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (g_sum, sums), logits = jax.lax.scan(
                body, (zeros, jnp.zeros((3,), jnp.float32)), micro
            )
            grads = jax.tree.map(lambda g: g / accum, g_sum)
            means = sums / accum
            logits = logits.reshape(-1, logits.shape[-1])
            return (state.apply_gradients(grads), means[0], means[1],
                    means[2], logits)

        return step

    def _build_eval_step(self):
        @jax.jit
        def step(params, batch: dict):
            d_loss, c_loss, _ = self._losses(params, batch)
            return d_loss + c_loss, d_loss, c_loss

        return step

    def _device_batches(self, loader):
        for batch in prefetch_to_device(loader, sharding=self.batch_sharding):
            yield {k: v for k, v in batch.items() if k != "video_id"}

    def train_epoch(self, epoch: int, skip_batches: int = 0) -> dict:
        self.train_loader.set_epoch(epoch, start_batch=skip_batches)
        # Loss sums accumulate ON DEVICE and are fetched once per epoch:
        # a per-step float() would block the host on a device round trip
        # (~20-28 ms through a tunneled rig, CLAUDE.md) and defeat JAX's
        # async dispatch — the device would idle an RTT every step.
        sums_dev = None
        n = 0
        timer = StepTimer()
        batches = self._device_batches(self.train_loader)
        last_logits = last_labels = None
        for batch in progress(batches, desc=f"epoch {epoch+1}",
                              total=len(self.train_loader) - skip_batches):
            self.state, total, d_loss, c_loss, logits = self._train_step(
                self.state, batch
            )
            step_vals = jnp.stack([total, d_loss, c_loss])
            sums_dev = step_vals if sums_dev is None else sums_dev + step_vals
            n += 1
            if self.writer:
                last_logits, last_labels = logits, batch["labels"]
            timer.tick(batch["labels"].shape[0])
            if self._preempt is not None and self._preempt.requested:
                # preemption (SIGTERM/SIGINT): cut a checkpoint through the
                # tested mid-epoch resume mechanism and stop cleanly; at an
                # exact epoch boundary save epoch-end bookkeeping instead
                # (resume then starts the NEXT epoch)
                done = skip_batches + n
                extra = {"epoch": epoch}
                if done < len(self.train_loader):
                    extra["batch_in_epoch"] = done
                self.ckpt.save(self.state, f"step_{int(self.state.step)}",
                               extra=extra)
                break
            if (self.checkpoint_every_steps
                    and n % self.checkpoint_every_steps == 0
                    and skip_batches + n < len(self.train_loader)):
                # mid-epoch: batch_in_epoch = batches consumed this epoch
                self.ckpt.save(
                    self.state, f"step_{int(self.state.step)}",
                    extra={"epoch": epoch, "batch_in_epoch": skip_batches + n},
                )
            if self.writer and n % 10 == 0:
                # one blocking fetch per 10 steps, not per step
                step = int(self.state.step)
                t3 = np.asarray(step_vals)
                self.writer.add_scalar("train/total_loss", float(t3[0]), step)
                self.writer.add_scalar("train/distill_loss", float(t3[1]), step)
                self.writer.add_scalar("train/class_loss", float(t3[2]), step)
        if self.writer and last_logits is not None:
            # last-batch logits/labels dumps, text AND histogram
            # (reference train.py:146-153)
            logits_np, labels_np = np.asarray(last_logits), np.asarray(last_labels)
            self.writer.add_text("Logits/LastBatch", str(logits_np), epoch)
            self.writer.add_text("Labels/LastBatch", str(labels_np), epoch)
            self.writer.add_histogram("Logits/LastBatch", logits_np, epoch)
            self.writer.add_histogram("Labels/LastBatch", labels_np, epoch)
        sums = np.asarray(sums_dev) if n else np.zeros(3)
        out = dict(zip(("total", "distill", "class"), sums / max(n, 1)))
        out["segments_per_sec"] = timer.examples_per_sec
        return out

    def evaluate(self) -> dict:
        sums_dev = None
        n = 0
        for batch in self._device_batches(self.val_loader):
            total, d_loss, c_loss = self._eval_step(self.state.params, batch)
            step_vals = jnp.stack([total, d_loss, c_loss])
            sums_dev = step_vals if sums_dev is None else sums_dev + step_vals
            n += 1
        if n == 0:
            # Silently returning 0.0 would be recorded as an unbeatable
            # "best" val loss by save_if_best — fail pointedly instead.
            raise ValueError(
                f"validation loader produced 0 batches: batch_size "
                f"{self.batch_size} exceeds the {len(self.val_ds)} val "
                "segments (drop_last drops the short tail) — lower "
                "batch_size or add validation data"
            )
        sums = np.asarray(sums_dev)
        return dict(zip(("total", "distill", "class"), sums / n))

    def train(self) -> float:
        start = time.time()
        start_epoch, skip = 0, 0
        if self.resume:
            latest = self.ckpt.latest_step_name()
            if latest:
                self.state, extra = self.ckpt.restore(self.state, latest)
                if "batch_in_epoch" in extra:  # mid-epoch checkpoint
                    start_epoch = int(extra["epoch"])
                    skip = int(extra["batch_in_epoch"])
                else:  # epoch-end checkpoint: continue with the next epoch
                    start_epoch = int(extra.get("epoch", -1)) + 1
                logging.info("resumed from %s (epoch %d, batch %d)",
                             latest, start_epoch, skip)
        # Resume continues the PERSISTED best (restore() above reloads
        # best_metric from extra.json): without this, resuming a run whose
        # remaining epochs never improve would return inf.
        best_val = (
            -self.ckpt.best_metric
            if self.ckpt.best_metric != -float("inf") else float("inf")
        )
        from vimoclip_tpu.utils.preemption import PreemptionGuard

        self.preempted = False
        with PreemptionGuard() as guard:
            self._preempt = guard
            try:
                return self._train_epochs(start_epoch, skip, best_val, start)
            finally:
                self.preempted = guard.requested
                self._preempt = None

    def _train_epochs(self, start_epoch: int, skip: int, best_val: float,
                      start: float) -> float:
        for epoch in range(start_epoch, self.epochs):
            tr = self.train_epoch(epoch, skip_batches=skip)
            skip = 0
            if self._preempt is not None and self._preempt.requested:
                # train_epoch already saved the resume checkpoint — skip
                # eval/best bookkeeping (a preemption deadline is ticking)
                # and return so the process can exit 0
                self.ckpt.wait_until_finished()
                logging.info(
                    "preempted during epoch %d: checkpoint saved; rerun "
                    "with resume=True to continue bit-identically", epoch,
                )
                return best_val
            va = self.evaluate()
            # best-by-val-total-loss (train.py:170-175) — flip sign because
            # CheckpointManager tracks highest-metric
            if self.ckpt.save_if_best(self.state, -va["total"], extra={"epoch": epoch}):
                best_val = va["total"]
                logging.info("new best student at epoch %d (val loss %.4f)",
                             epoch, va["total"])
            self.ckpt.save(self.state, f"step_{int(self.state.step)}",
                           extra={"epoch": epoch})
            if self.writer:
                for k, v in va.items():
                    self.writer.add_scalar(f"val/{k}_loss", v, epoch)
            logging.info(
                "Epoch %d/%d | train total %.4f (distill %.4f, class %.4f) | "
                "val total %.4f | %.1f segments/s",
                epoch + 1, self.epochs, tr["total"], tr["distill"], tr["class"],
                va["total"], tr["segments_per_sec"],
            )
        # join any in-flight async checkpoint before declaring the run done
        self.ckpt.wait_until_finished()
        logging.info("stage-1 training complete in %.1f min", (time.time() - start) / 60)
        return best_val
