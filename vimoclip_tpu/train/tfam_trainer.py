"""Stage-2 trainer/evaluator for the TFAM fusion model — the pipeline's
minimum end-to-end slice (SURVEY.md §7 step 4).

Reference parity (TFAM/train_and_eval.py):
- ``ModelTrainer`` (:41-173): AdamW wd=0.1 + per-epoch cosine annealing to
  eta_min=1e-6, BCE-with-logits (AK multilabel) or CE (MN single-label),
  micro-mAP / accuracy tracked over the whole epoch, best-by-val-metric
  checkpointing, TensorBoard scalars, drop_last loaders.
- ``ModelTester`` (:175-307): loads best checkpoint, computes loss+metric,
  emits per-video top-5 predictions with class names to
  ``results/results_<ts>.json`` and a tabulate console summary.

TPU-native architecture: one jit-compiled train step over a (data, model)
mesh — batch sharded on ``data``, params partitioned by TFAM_PARTITION_RULES;
XLA inserts the gradient all-reduce. Host threads load HDF5 items; batches
are length-bucketed (a handful of compiled programs) and prefetched to
device double-buffered. Orbax checkpoints support true resume.
"""

from __future__ import annotations

import functools

import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from vimoclip_tpu import losses
from vimoclip_tpu.config import ExperimentConfig
from vimoclip_tpu.data import BatchLoader, PairedEmbeddingDataset, collate_pad, prefetch_to_device
from vimoclip_tpu.metrics import MultilabelAveragePrecision, TopKAccuracy
from vimoclip_tpu.models import TFAM
from vimoclip_tpu.parallel import (
    MeshConfig,
    TFAM_PARTITION_RULES,
    batch_sharding,
    create_mesh,
    shard_params,
)
from vimoclip_tpu.prng import KeyChain
from vimoclip_tpu.train.state import CheckpointManager, TrainState, cosine_annealing_schedule, make_adamw
from vimoclip_tpu.utils.logging import StepTimer, SummaryWriter, progress


def _make_metric(config: ExperimentConfig):
    if config.training.metric == "accuracy":
        return TopKAccuracy(top_k=1)
    if config.training.device_metric:
        from vimoclip_tpu.metrics import DeviceMultilabelAveragePrecision

        return DeviceMultilabelAveragePrecision(num_labels=config.num_classes)
    return MultilabelAveragePrecision(num_labels=config.num_classes)


def _metric_update(metric, logits, labels):
    """Feed the metric without forcing a device->host fetch when it
    accumulates on device (metrics.DeviceMultilabelAveragePrecision)."""
    if getattr(metric, "device_resident", False):
        metric.update(logits, labels)
    else:
        metric.update(np.asarray(logits), np.asarray(labels))


def _loss_fn_for(config: ExperimentConfig):
    if config.training.loss == "ce":
        return losses.cross_entropy_loss
    return losses.bce_with_logits


class TFAMTrainer:
    def __init__(
        self,
        config: ExperimentConfig,
        log_dir: str,
        checkpoint_dir: str,
        mesh=None,
    ):
        self.config = config
        tcfg = config.training
        if tcfg.pipeline_parallel > 1 and not (
            config.model.use_cross_attention
            and not config.model.use_only_rgb
            and not config.model.use_only_flow
        ):
            raise ValueError(
                "training.parallelism: pipe requires the cross-attention "
                "fusion mode (parallel.tfam_cross_pipeline_logits pipelines "
                "that path; other modes fit one chip)"
            )
        self.mesh = mesh if mesh is not None else create_mesh(
            MeshConfig(
                tcfg.data_parallel,
                tcfg.model_parallel,
                seq_parallel=tcfg.seq_parallel,
                pipeline_parallel=tcfg.pipeline_parallel,
            )
        )
        # An externally-passed mesh must carry the axes the parallelism
        # config asks for — fail pointedly here instead of a bare
        # KeyError('seq'/'pipe') deep in placement/shard_map setup.
        from vimoclip_tpu.parallel.mesh import PIPE_AXIS, SEQ_AXIS

        for flag, field, value, axis in (
            ("seq", "seq_parallel", tcfg.seq_parallel, SEQ_AXIS),
            ("pipe", "pipeline_parallel", tcfg.pipeline_parallel, PIPE_AXIS),
        ):
            if value > 1 and axis not in self.mesh.shape:
                raise ValueError(
                    f"training.parallelism: {flag}={value} but the provided "
                    f"mesh {dict(self.mesh.shape)} has no {axis!r} axis — "
                    f"build it with create_mesh(MeshConfig({field}={value})) "
                    f"or drop the parallelism setting"
                )
        if tcfg.grad_accum > 1:
            from vimoclip_tpu.parallel.mesh import DATA_AXIS as _DA

            n_data = self.mesh.shape[_DA]
            if tcfg.batch_size % tcfg.grad_accum:
                raise ValueError(
                    f"training.grad_accum={tcfg.grad_accum} must divide "
                    f"batch_size={tcfg.batch_size} (equal microbatches keep "
                    "the accumulated gradient identical to the full batch)"
                )
            if (tcfg.batch_size // tcfg.grad_accum) % n_data:
                raise ValueError(
                    f"batch_size/grad_accum = "
                    f"{tcfg.batch_size // tcfg.grad_accum} microbatch rows "
                    f"must divide the mesh's data axis ({n_data}) — lower "
                    "grad_accum or raise batch_size"
                )
            if tcfg.pipeline_parallel > 1:
                # the pipe path further splits each accumulation microbatch
                # into GPipe microbatches, each of which shards over `data`
                n_micro = tcfg.pipeline_microbatches or tcfg.pipeline_parallel
                rows = tcfg.batch_size // tcfg.grad_accum
                if rows % n_micro or (rows // n_micro) % n_data:
                    raise ValueError(
                        f"batch_size/grad_accum = {rows} rows must split "
                        f"into {n_micro} GPipe microbatches that each "
                        f"divide the data axis ({n_data}) — raise "
                        "batch_size or lower grad_accum/microbatches"
                    )
        if tcfg.seq_parallel > 1:
            # every collated batch pads T up to a length_bucket multiple
            # (capped at max_seq_len), and the ring shards T over the seq
            # axis — validate divisibility HERE instead of the silent
            # batch-only placement fallback + the ring's mid-epoch error
            # (parallel/sequence.py Tq/Tk check)
            n_seq = tcfg.seq_parallel
            bucket = config.data.length_bucket
            if not bucket or bucket % n_seq:
                raise ValueError(
                    f"training.parallelism: seq={n_seq} needs "
                    f"data.length_bucket to be a multiple of it (got "
                    f"{bucket!r}) — padded sequence lengths must shard "
                    "evenly over the seq axis"
                )
            cap = config.data.max_seq_len
            if cap is not None and cap % n_seq:
                raise ValueError(
                    f"training.parallelism: seq={n_seq} needs "
                    f"data.max_seq_len ({cap}) divisible by it — capped "
                    "batches pad to exactly max_seq_len"
                )
        self._dtype = (
            jnp.bfloat16 if config.training.half_precision else jnp.float32
        )
        # attention_impl="auto" works under any mesh: the flash kernel
        # partitions over (batch, heads) via custom_partitioning
        # (ops/pallas/flash_attention.py) with per-(row, head) dropout
        # seeds, so sharded results are bit-identical to unsharded.
        # attention_impl="xla" remains the escape hatch.
        #
        # training.parallelism {seq: N} forces attention_impl="ring" with
        # the trainer's own mesh threaded in: time sharded over the `seq`
        # axis, attention dropout riding the ring with global-coordinate
        # bits invariant to placement at a fixed seq axis size
        # (parallel/sequence.py) — the reference
        # dropout-0.1 recipe trains beyond one chip's HBM.
        import dataclasses

        model_kwargs = {}
        model_cfg = config.model
        if tcfg.seq_parallel > 1 and tcfg.pipeline_parallel == 1:
            model_cfg = dataclasses.replace(model_cfg, attention_impl="ring")
            from vimoclip_tpu.parallel.mesh import DATA_AXIS

            model_kwargs = dict(seq_mesh=self.mesh, seq_batch_axis=DATA_AXIS)
        # seq COMBINED with pipe ({seq: N, pipe: M}) never routes through
        # self.model: _apply's pipelined branch threads seq_axis into
        # tfam_cross_pipeline_logits, whose stages run the inside-shard_map
        # ring body (attention_impl="ring_inner", parallel/pipelining.py).
        self.model = TFAM(
            config=model_cfg, num_classes=config.num_classes,
            dtype=self._dtype, **model_kwargs,
        )
        # Param INIT always runs the plain single-device forward: the ring/
        # pipe paths need mesh-divisible shapes the dummy init inputs don't
        # have, and the attention impl never changes the param tree.
        self._init_model = (
            TFAM(
                config=dataclasses.replace(config.model, attention_impl="xla"),
                num_classes=config.num_classes, dtype=self._dtype,
            )
            if model_kwargs else self.model
        )
        # Init keys stay on the default (threefry) generator so initial
        # weights are identical regardless of dropout_rng_impl; only the
        # dropout stream uses the impl-selected fast generator.
        self.keys = KeyChain(config.training.seed)
        self._dropout_keys = KeyChain(
            config.training.seed, impl=config.training.dropout_rng_impl
        )
        self.metric = _make_metric(config)
        # Publish the metric under its real name: the reference names it per
        # variant ("mAP" for AK multilabel, accuracy for MN —
        # train_and_eval_frame_diff_MN.py:49,88), so an MN run's accuracy must
        # not be labeled "mAP" in TB tags / results JSON / console summaries.
        self.metric_name = (
            "accuracy" if config.training.metric == "accuracy" else "mAP"
        )
        self.loss_fn = _loss_fn_for(config)
        self.writer = SummaryWriter(log_dir)
        self.ckpt = CheckpointManager(
            checkpoint_dir, keep_steps=config.training.keep_checkpoints,
            async_save=config.training.async_checkpoint,
        )
        self.batch_sharding = batch_sharding(self.mesh)
        # Sequence-parallel runs place batch inputs TIME-SHARDED over `seq`
        # up front, so the ring/pipe shard_maps consume them in the layout
        # their in_specs declare instead of paying an on-device reshard
        # (XLA's "involuntary full rematerialization" fallback) every step.
        # Placement only — jit output is identical either way.
        if tcfg.seq_parallel > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from vimoclip_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS

            time_sharded = NamedSharding(self.mesh, P(DATA_AXIS, SEQ_AXIS))
            n_seq = self.mesh.shape[SEQ_AXIS]
            timed_keys = frozenset(
                ("embeddings", "motion_embeddings", "mask_rgb", "mask_motion")
            )

            def place(key, value):
                # fall back to batch-only sharding when T doesn't divide the
                # seq axis (the ring raises its pointed error downstream)
                if (key in timed_keys and value.ndim >= 2
                        and value.shape[1] % n_seq == 0):
                    return time_sharded
                return self.batch_sharding

            self._batch_placement = place
        else:
            self._batch_placement = self.batch_sharding

        dcfg = config.data
        self.train_ds = PairedEmbeddingDataset(
            dcfg.train_dataset_path, dcfg.motion_dataset_path,
            num_frames=dcfg.num_frames, max_frames=dcfg.max_frames,
        )
        self.val_ds = PairedEmbeddingDataset(
            dcfg.val_dataset_path, dcfg.motion_dataset_path,
            num_frames=dcfg.num_frames, max_frames=dcfg.max_frames,
        )
        collate = lambda items: collate_pad(
            items, bucket=dcfg.length_bucket, max_seq_len=dcfg.max_seq_len
        )
        tcfg = config.training
        self.train_loader = BatchLoader(
            self.train_ds, tcfg.batch_size, collate, shuffle=True,
            drop_last=True, seed=tcfg.seed, num_workers=tcfg.num_workers,
        )
        self.val_loader = BatchLoader(
            self.val_ds, tcfg.batch_size, collate, shuffle=False,
            drop_last=True, num_workers=tcfg.num_workers,
        )

        self._preempt = None  # set by train() while a PreemptionGuard is live
        self.preempted = False  # latched by train(); multi-run drivers
        # (run_experiments, run_table2_fullgeom) check it to stop starting
        # NEW runs after a SIGTERM the guard consumed
        self.state = self._init_state()
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        # per-epoch metric trajectory, appended by train() — the programmatic
        # equivalent of the reference's per-epoch log lines
        # (train_and_eval.py:151-162)
        self.history: list[dict] = []

    # ------------------------------------------------------------------
    def _init_state(self) -> TrainState:
        tcfg = self.config.training
        d = self.config.model.d_model
        dummy_rgb = jnp.zeros((1, 4, d), jnp.float32)
        dummy_motion = jnp.zeros((1, 3, d), jnp.float32)
        params = self._init_model.init(
            self.keys("init"), dummy_rgb, dummy_motion,
            jnp.ones((1, 4), bool), jnp.ones((1, 3), bool),
        )["params"]
        params = shard_params(params, TFAM_PARTITION_RULES, self.mesh)
        schedule = cosine_annealing_schedule(
            tcfg.lr, tcfg.epochs, max(len(self.train_loader), 1), tcfg.eta_min
        )
        self._schedule = schedule
        tx = make_adamw(schedule, weight_decay=tcfg.weight_decay)
        from vimoclip_tpu.parallel import commit_replicated

        return commit_replicated(TrainState.create(params, tx), self.mesh)

    def _apply(self, params, batch, deterministic, rngs=None):
        tcfg = self.config.training
        if tcfg.pipeline_parallel > 1:
            # training.parallelism {pipe: N}: the encoder layers run as
            # GPipe stages over the mesh's `pipe` axis; dropout (when
            # training) uses per-(stage, microbatch) keys
            # (parallel/pipelining.py).
            from vimoclip_tpu.parallel import tfam_cross_pipeline_logits
            from vimoclip_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS

            return tfam_cross_pipeline_logits(
                params, self.config.model, self.mesh,
                batch["embeddings"], batch["motion_embeddings"],
                batch["mask_rgb"], batch["mask_motion"],
                n_micro=tcfg.pipeline_microbatches,
                batch_axis=DATA_AXIS,
                seq_axis=SEQ_AXIS if tcfg.seq_parallel > 1 else None,
                dtype=self._dtype,
                dropout_rng=None if deterministic else rngs["dropout"],
            )
        return self.model.apply(
            {"params": params},
            batch["embeddings"], batch["motion_embeddings"],
            batch["mask_rgb"], batch["mask_motion"],
            deterministic=deterministic, rngs=rngs,
        )

    def _build_train_step(self):
        loss_fn = self.loss_fn
        accum = self.config.training.grad_accum

        if accum <= 1:
            @functools.partial(jax.jit, donate_argnums=(0,))
            def step(state: TrainState, batch: dict, dropout_key) -> tuple:
                def compute_loss(params):
                    logits = self._apply(
                        params, batch, deterministic=False,
                        rngs={"dropout": dropout_key},
                    )
                    return loss_fn(logits, batch["labels"]), logits

                (loss, logits), grads = jax.value_and_grad(
                    compute_loss, has_aux=True
                )(state.params)
                return state.apply_gradients(grads), loss, logits

            return step

        # Gradient accumulation (training.grad_accum: N): the loader batch
        # splits into N equal microbatches, a lax.scan carries the f32
        # gradient sum (one params-sized accumulator; activations live for
        # ONE microbatch at a time), and a single apply_gradients consumes
        # the mean — the batch_size loss surface at batch_size/N activation
        # memory. Dropout draws a distinct key per microbatch (split from
        # the step key, so mid-epoch resume stays deterministic); with
        # dropout off, gradients equal the unaccumulated step up to f32
        # summation order (tests/test_grad_accum.py pins both).
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        placement = (
            self._batch_placement if callable(self._batch_placement)
            else lambda _k, _v: self._batch_placement
        )
        mesh = self.mesh

        def split(key, x):
            # (B, ...) -> (accum, B/accum, ...), re-asserting the leaf's
            # batch/time sharding one dim deeper so GSPMD keeps microbatches
            # sharded instead of gathering the scanned operand.
            y = x.reshape(accum, x.shape[0] // accum, *x.shape[1:])
            spec = P(None, *placement(key, x).spec)
            return jax.lax.with_sharding_constraint(
                y, NamedSharding(mesh, spec)
            )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, batch: dict, dropout_key) -> tuple:
            micro = {k: split(k, v) for k, v in batch.items()}
            keys = jax.random.split(dropout_key, accum)

            def compute_loss(params, mb, key):
                logits = self._apply(
                    params, mb, deterministic=False, rngs={"dropout": key}
                )
                return loss_fn(logits, mb["labels"]), logits

            grad_fn = jax.value_and_grad(compute_loss, has_aux=True)

            def body(carry, xs):
                g_acc, loss_acc = carry
                mb, key = xs
                (loss, logits), grads = grad_fn(state.params, mb, key)
                g_acc = jax.tree.map(jnp.add, g_acc, grads)
                return (g_acc, loss_acc + loss), logits

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (g_sum, loss_sum), logits = jax.lax.scan(
                body, (zeros, jnp.zeros((), jnp.float32)), (micro, keys)
            )
            grads = jax.tree.map(lambda g: g / accum, g_sum)
            # microbatch-order rows -> original batch order (the split was
            # contiguous, so a plain reshape restores it)
            logits = logits.reshape(-1, logits.shape[-1])
            return state.apply_gradients(grads), loss_sum / accum, logits

        return step

    def _build_eval_step(self):
        loss_fn = self.loss_fn

        @jax.jit
        def step(params, batch: dict) -> tuple:
            logits = self._apply(params, batch, deterministic=True)
            return loss_fn(logits, batch["labels"]), logits

        return step

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int, skip_batches: int = 0) -> tuple[float, float]:
        self.metric.reset()
        self.train_loader.set_epoch(epoch, start_batch=skip_batches)
        total_loss, n = 0.0, 0
        every = self.config.training.checkpoint_every_steps
        timer = StepTimer()
        batches = prefetch_to_device(self.train_loader, sharding=self._batch_placement)
        last_logits = last_labels = None
        for batch in progress(batches, desc=f"epoch {epoch+1}",
                              total=len(self.train_loader) - skip_batches):
            key = self._dropout_keys("dropout", int(self.state.step))
            arrays = {k: v for k, v in batch.items() if k != "video_id"}
            self.state, loss, logits = self._train_step(self.state, arrays, key)
            total_loss += float(loss)
            n += 1
            last_logits, last_labels = logits, batch["labels"]
            _metric_update(self.metric, logits, batch["labels"])
            timer.tick(batch["labels"].shape[0])
            if self._preempt is not None and self._preempt.requested:
                # preemption (SIGTERM/SIGINT): cut a checkpoint through the
                # tested mid-epoch resume mechanism and stop cleanly; at an
                # exact epoch boundary save epoch-end bookkeeping instead
                done = skip_batches + n
                extra = {"epoch": epoch}
                if done < len(self.train_loader):
                    extra["batch_in_epoch"] = done
                self.ckpt.save(self.state, f"step_{int(self.state.step)}",
                               extra=extra)
                break
            if (every and n % every == 0
                    and skip_batches + n < len(self.train_loader)):
                self.ckpt.save(
                    self.state, f"step_{int(self.state.step)}",
                    extra={"epoch": epoch, "batch_in_epoch": skip_batches + n},
                )
        train_loss = total_loss / max(n, 1)
        train_metric = self.metric.compute()
        self.writer.add_scalar("Loss/train", train_loss, epoch)
        self.writer.add_scalar(f"{self.metric_name}/train", train_metric, epoch)
        self.writer.add_scalar("perf/train_clips_per_sec", timer.examples_per_sec, epoch)
        if last_logits is not None:  # final-batch dumps, reference train.py:146-153
            logits_np, labels_np = np.asarray(last_logits), np.asarray(last_labels)
            self.writer.add_histogram("train/final_batch_logits", logits_np, epoch)
            self.writer.add_histogram("train/final_batch_labels", labels_np, epoch)
            self.writer.add_text("train/final_batch_logits", str(logits_np), epoch)
            self.writer.add_text("train/final_batch_labels", str(labels_np), epoch)
        return train_loss, train_metric

    def validate(self, epoch: int | None = None) -> tuple[float, float]:
        self.metric.reset()
        total_loss, n = 0.0, 0
        for batch in prefetch_to_device(self.val_loader, sharding=self._batch_placement):
            arrays = {k: v for k, v in batch.items() if k != "video_id"}
            loss, logits = self._eval_step(self.state.params, arrays)
            total_loss += float(loss)
            n += 1
            _metric_update(self.metric, logits, batch["labels"])
        val_loss = total_loss / max(n, 1)
        val_metric = self.metric.compute()
        if epoch is not None:
            self.writer.add_scalar("Loss/val", val_loss, epoch)
            self.writer.add_scalar(f"{self.metric_name}/val", val_metric, epoch)
        return val_loss, val_metric

    def train(self) -> float:
        tcfg = self.config.training
        start_epoch, skip = 0, 0
        if tcfg.resume:
            latest = self.ckpt.latest_step_name()
            if latest:
                self.state, extra = self.ckpt.restore(self.state, latest)
                if "batch_in_epoch" in extra:  # mid-epoch checkpoint
                    start_epoch = int(extra["epoch"])
                    skip = int(extra["batch_in_epoch"])
                else:
                    start_epoch = int(extra.get("epoch", -1)) + 1
                logging.info("resumed from %s at epoch %d batch %d",
                             latest, start_epoch, skip)
        start = time.time()
        best = self.ckpt.best_metric
        from vimoclip_tpu.utils.preemption import PreemptionGuard

        self.preempted = False
        with PreemptionGuard() as guard:
            self._preempt = guard
            try:
                return self._train_epochs(start_epoch, skip, best, start)
            finally:
                self.preempted = guard.requested
                self._preempt = None

    def _train_epochs(self, start_epoch: int, skip: int, best: float,
                      start: float) -> float:
        tcfg = self.config.training
        for epoch in range(start_epoch, tcfg.epochs):
            train_loss, train_map = self.train_epoch(epoch, skip_batches=skip)
            skip = 0
            if self._preempt is not None and self._preempt.requested:
                # train_epoch already saved the resume checkpoint — skip
                # eval/best bookkeeping (a preemption deadline is ticking)
                self.ckpt.wait_until_finished()
                self.writer.close()
                logging.info(
                    "preempted during epoch %d: checkpoint saved; rerun "
                    "with training.resume to continue bit-identically",
                    epoch,
                )
                return best
            val_loss, val_map = self.validate(epoch)
            if self.ckpt.save_if_best(self.state, val_map, extra={"epoch": epoch}):
                logging.info("new best model at epoch %d (%s=%.4f)",
                             epoch, self.metric_name, val_map)
                best = val_map
            self.ckpt.save(self.state, f"step_{int(self.state.step)}", extra={"epoch": epoch})
            lr = float(self._schedule(int(self.state.step)))
            self.history.append({
                "epoch": epoch, "train_loss": train_loss, "train_map": train_map,
                "val_loss": val_loss, "val_map": val_map, "lr": lr,
            })
            self.writer.add_scalar("Learning Rate", lr, epoch)
            logging.info(
                "Epoch %d/%d | Train Loss: %.4f | Train %s: %.4f | "
                "Val Loss: %.4f | Val %s: %.4f | LR: %.2e",
                epoch + 1, tcfg.epochs, train_loss, self.metric_name, train_map,
                val_loss, self.metric_name, val_map, lr,
            )
        # join any in-flight async checkpoint before declaring the run done
        self.ckpt.wait_until_finished()
        self.writer.close()
        logging.info("training complete in %.2f minutes", (time.time() - start) / 60)
        return best


class TFAMTester:
    """Evaluation + per-video top-k prediction reports
    (reference ModelTester, train_and_eval.py:175-307)."""

    def __init__(self, trainer: TFAMTrainer, results_dir: str = "results"):
        self.t = trainer
        self.results_dir = results_dir
        self.class_names: dict[str, str] = {}
        path = trainer.config.data.class_names_dir
        if path and os.path.exists(path):
            from vimoclip_tpu.extraction import load_class_names

            self.class_names = {
                str(k): v for k, v in load_class_names(path).items()
            }

    def load_best(self) -> None:
        self.t.state, _ = self.t.ckpt.restore(self.t.state, "best")
        logging.info("best model loaded from %s", self.t.ckpt.directory)

    def load_torch_checkpoint(self, path: str) -> None:
        """Evaluate a REFERENCE-trained checkpoint (best_model.pth,
        train_and_eval.py:133-149) with this stack (torch_compat
        .tfam_params_from_checkpoint — shared with the vimo-predict CLI)."""
        from vimoclip_tpu.models.torch_compat import tfam_params_from_checkpoint

        params = tfam_params_from_checkpoint(
            path,
            num_layers=self.t.config.model.num_layers,
            d_model=self.t.config.model.d_model,
        )
        from vimoclip_tpu.parallel import TFAM_PARTITION_RULES, shard_params

        params = shard_params(params, TFAM_PARTITION_RULES, self.t.mesh)
        self.t.state = self.t.state.replace(params=params)
        logging.info("reference torch checkpoint loaded from %s", path)

    def evaluate(self, save_predictions: bool = False, top_k: int = 5) -> dict:
        self.t.metric.reset()
        results = {
            "videos": [],
            "metrics": {},
            "config": {
                "model": "TFAM",
                "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
            },
        }
        total_loss, n = 0.0, 0
        for batch in prefetch_to_device(
            self.t.val_loader, sharding=self.t._batch_placement
        ):
            arrays = {k: v for k, v in batch.items() if k != "video_id"}
            loss, logits = self.t._eval_step(self.t.state.params, arrays)
            total_loss += float(loss)
            n += 1
            logits_np = np.asarray(logits)
            labels_np = np.asarray(batch["labels"])
            _metric_update(self.t.metric, logits_np, labels_np)
            probs = 1.0 / (1.0 + np.exp(-logits_np))
            for i, vid in enumerate(batch["video_id"]):
                order = np.argsort(probs[i])[::-1][:top_k]
                rec = {
                    "video_id": vid,
                    "true_labels": [
                        {"class_id": str(c), "class_name": self.class_names.get(str(c), f"class_{c}")}
                        for c in np.where(labels_np[i] == 1)[0]
                    ],
                    "predictions": {
                        str(c): {
                            "class_name": self.class_names.get(str(c), f"class_{c}"),
                            "probability": round(float(probs[i, c]), 4),
                        }
                        for c in order
                    },
                }
                results["videos"].append(rec)
        results["metrics"]["loss"] = total_loss / max(n, 1)
        results["metrics"][self.t.metric_name] = self.t.metric.compute()
        if save_predictions:
            os.makedirs(self.results_dir, exist_ok=True)
            out = os.path.join(
                self.results_dir, f"results_{time.strftime('%Y%m%d-%H%M%S')}.json"
            )
            with open(out, "w") as f:
                json.dump(results, f, indent=2)
            logging.info("results saved to %s", out)
        self._print_summary(results, top_k)
        return results

    def _print_summary(self, results: dict, top_k: int) -> None:
        from tabulate import tabulate

        print("\n" + "=" * 60)
        print(f"Evaluation summary ({results['config']['timestamp']})")
        print("=" * 60)
        name = self.t.metric_name
        print(f"Loss: {results['metrics']['loss']:.4f}")
        print(f"{name}:  {results['metrics'][name]:.4f}")
        print(f"Videos evaluated: {len(results['videos'])}")
        for video in results["videos"][:3]:
            print(f"\nVideo ID: {video['video_id']}")
            rows = [
                [p["class_name"], f"{p['probability']:.4f}",
                 "Yes" if any(l["class_id"] == cid for l in video["true_labels"]) else "No"]
                for cid, p in video["predictions"].items()
            ]
            print(tabulate(rows, headers=["Class", "Probability", "Correct"], tablefmt="pretty"))
