"""Configuration system: YAML configs (stage-2 TFAM) + typed dataclasses.

Mirrors the reference's two mechanisms (SURVEY.md §5):
- stage-1 argparse CLIs (reference train.py:178-216) — built per-CLI in
  ``vimoclip_tpu.cli`` on top of these dataclasses;
- stage-2 YAML schema with ``training/logging/data/model`` sections
  (reference TFAM/cfg_AK/config_default.yaml, TFAM/train_and_eval.py:313-371)
  including run-directory derivation
  ``<config_name>/{logs,checkpoints}/<timestamp>``.

Deliberate fix vs reference: the reference parses ``training.lr`` but then
hardcodes AdamW lr=1e-4 (train_and_eval.py:53). Here the YAML value is
honored; the default (1e-4) matches the reference's effective behavior.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from datetime import datetime
from typing import Any

import yaml


@dataclasses.dataclass
class TrainingConfig:
    mode: str = "both"  # train | test | both
    seed: int = 49  # reference cfg_AK/config_default.yaml:3
    lr: float = 1e-4
    weight_decay: float = 0.1
    eta_min: float = 1e-6
    epochs: int = 30
    batch_size: int = 8
    num_workers: int = 4
    device: str = "tpu"
    # TPU-native additions (defaults preserve reference behavior)
    loss: str = "bce"  # bce (AK multilabel) | ce (MammalNet single-label)
    metric: str = "map"  # map | accuracy
    # Accumulate the epoch mAP on device and fetch one scalar instead of
    # every logit matrix (metrics.DeviceMultilabelAveragePrecision) —
    # tie-handling caveat documented there.
    device_metric: bool = False
    # PRNG bit generator for the DROPOUT key stream only (init keys always
    # use the default threefry, so initial weights do not depend on this):
    # "rbg" halves the TFAM train step on TPU vs "threefry2x32" (t^2
    # attention-dropout masks dominate); dropout bits deterministic per impl.
    dropout_rng_impl: str = "rbg"
    data_parallel: int = -1
    model_parallel: int = 1
    # Sequence parallelism: shard TIME over a mesh `seq` axis and run ring
    # attention (parallel/sequence.py) inside the train/eval steps — for
    # videos whose attention state outgrows one chip. Trains the full
    # reference recipe including attention dropout (global-coordinate
    # counter PRNG). YAML: `training.parallelism: {seq: N}`.
    seq_parallel: int = 1
    # Pipeline parallelism: shard the TFAM encoder layers into GPipe stages
    # over a mesh `pipe` axis (parallel/pipelining.py) — for fusion models
    # whose params/activations outgrow one chip along depth. Cross-attention
    # fusion mode only. YAML: `training.parallelism: {pipe: N}`.
    pipeline_parallel: int = 1
    # Microbatches per pipelined step (defaults to the stage count — the
    # minimum that keeps every stage busy outside the bubble).
    pipeline_microbatches: int | None = None
    # Gradient accumulation: split each loader batch into N equal
    # microbatches, accumulate gradients across them on device
    # (lax.scan), and apply ONE optimizer update — the loss surface of
    # `batch_size` at the activation memory of `batch_size / N`. Use it
    # to train recipe batch sizes whose activations outgrow one chip's
    # HBM (e.g. the reference's stage-1 batch 32, train.py:183, on long
    # clips). Optimizer/schedule semantics are unchanged: updates per
    # epoch, cosine steps and checkpoints all count full batches.
    # Microbatch losses are equal-weighted means; with dropout, each
    # microbatch draws its own key split from the step key. Exactness
    # caveat: the reference's unmasked pooling divides by the BATCH-max
    # valid length (TFAMModelConfig.masked_pooling=False, the quirk
    # default), so a microbatch's pooling denominator is its own max —
    # batch-context-dependent exactly like the reference's own batch-size
    # choice. With `model.masked_pooling: true` (the batch-invariant
    # fix) the accumulated gradient equals the full-batch gradient up to
    # f32 summation order (tests/test_grad_accum.py pins it).
    # YAML: `training.grad_accum: N`.
    grad_accum: int = 1
    half_precision: bool = False  # bfloat16 activations
    resume: bool = False  # true train-resume (reference never resumes, SURVEY §5)
    # also checkpoint mid-epoch every N steps; resume lands on the exact
    # next batch (deterministic shuffle + step-derived dropout keys)
    checkpoint_every_steps: int | None = None
    # retain only the newest N step checkpoints (None = keep every epoch,
    # the reference behavior, train.py:167)
    keep_checkpoints: int | None = None
    # Async checkpointing: save() returns once the state is snapshotted to
    # host and Orbax serializes on its background thread while the next
    # epoch trains (directories commit atomically; the trainer joins the
    # writer after the last epoch and before any restore). Off = the
    # reference-like synchronous save. YAML: `training.async_checkpoint`.
    async_checkpoint: bool = False


@dataclasses.dataclass
class LoggingConfig:
    log_dir: str = "logs"
    checkpoint_dir: str = "checkpoints"


@dataclasses.dataclass
class DataConfig:
    num_classes: int = 140
    class_names_dir: str = ""
    train_dataset_path: str = ""
    val_dataset_path: str = ""
    flow_dataset_path: str = ""
    frame_diff_dataset_path: str = ""
    num_frames: int | None = None  # sparse temporal subsampling
    max_frames: int | None = None  # drop videos with >= max_frames
    # TPU-native addition: pad sequence lengths up to multiples of this bucket
    # so XLA compiles a handful of shapes instead of one per batch.
    length_bucket: int = 128
    # Optional hard cap on padded sequence length (videos beyond it are
    # TRUNCATED). None = reference semantics: pad to the batch max with no
    # cap (TFAM/data/dataset.py:86-103). The default attention_impl="auto"
    # keeps attention memory linear in T on TPU (flash kernel from t>=2048
    # eval / t>=256 dropout-training), so long clips need no guard there;
    # set a cap for attention_impl="xla" runs or off-TPU (CPU) runs, where
    # the (T, T) score tensor grows quadratically.
    max_seq_len: int | None = None

    @property
    def motion_dataset_path(self) -> str:
        return self.flow_dataset_path or self.frame_diff_dataset_path


@dataclasses.dataclass
class TFAMModelConfig:
    d_model: int = 512
    nhead: int = 8
    num_layers: int = 4
    dim_feedforward: int = 2048
    use_cross_attention: bool = True
    use_pe: bool = False
    use_only_rgb: bool = False
    use_only_flow: bool = False
    concat_dim: int = 1
    dropout: float = 0.1
    mlp_dropout: float = 0.1
    activation: str = "relu"  # FFN activation (reference AttentionLayer default)
    masked_pooling: bool = False  # reference pools over pads (AMO_CLIP.py:170)
    # Attention implementation: "auto" picks the measured winner per shape on
    # TPU — the Pallas online-softmax kernel with FUSED on-chip-PRNG dropout
    # for training steps (t>=256) and long sequences (t>=2048), XLA elsewhere
    # (docs/PERF.md crossover table). "xla" pins reference numerics
    # everywhere; "flash" forces the kernel. Like dropout_rng_impl, only the
    # dropout BIT STREAM differs between impls — weights/logits numerics are
    # the same attention math. Multi-device meshes are fine: the kernel
    # partitions over (batch, heads) via custom_partitioning with
    # per-(row, head) dropout seeds, so sharded == unsharded bit-exactly.
    # "ring" shards TIME over a mesh "seq" axis (sequence parallelism,
    # parallel/sequence.py) for videos beyond one chip's HBM; attention
    # dropout rides the ring (global-coordinate counter PRNG), and the
    # trainer threads the mesh automatically under
    # `training.parallelism: {seq: N}` — programmatic callers pass
    # TFAM(..., seq_mesh=...), never YAML.
    attention_impl: str = "auto"
    # Head-projection scheduling in MHA (ops/attention.py): "split" =
    # Dense then reshape+transpose (reference structure); "fused" = head
    # split/merge folded into the projection einsums — identical params
    # and math, measured experiment vs the TFAM trace's "data formatting"
    # slice (docs/PERF.md).
    head_proj: str = "split"


@dataclasses.dataclass
class ExperimentConfig:
    training: TrainingConfig
    logging: LoggingConfig
    data: DataConfig
    model: TFAMModelConfig
    config_path: str = ""

    @property
    def num_classes(self) -> int:
        return self.data.num_classes


def _build(cls, section: dict[str, Any] | None):
    section = dict(section or {})
    fields = {f.name: f for f in dataclasses.fields(cls)}
    known = {}
    for k, v in section.items():
        # Tolerate reference-era extra keys (e.g. config_test.yaml's unused
        # `testing:` block / `device`) without failing.
        if k not in fields:
            continue
        # YAML parses exponent-form floats without a dot ("1e-4", "1e-6")
        # as strings; coerce by declared field type.
        if fields[k].type in ("float", float) and isinstance(v, str):
            v = float(v)
        if fields[k].type in ("int", int) and isinstance(v, str):
            v = int(v)
        known[k] = v
    return cls(**known)


_PARALLELISM_KEYS = {
    "data": "data_parallel",
    "model": "model_parallel",
    "seq": "seq_parallel",
    "pipe": "pipeline_parallel",
    "microbatches": "pipeline_microbatches",
}


def load_experiment_config(path: str) -> ExperimentConfig:
    with open(path, "r") as f:
        cfg = yaml.safe_load(f) or {}
    training_section = dict(cfg.get("training") or {})
    # `training.parallelism: {data: -1, model: 1, seq: 2, pipe: 2}` — the
    # mesh geometry block (round 4); flat `data_parallel:`-style keys keep
    # working, the nested block wins when both are present.
    par = training_section.pop("parallelism", None)
    if par is None:  # absent or YAML-null — both mean "defaults"
        par = {}
    if not isinstance(par, dict):
        raise ValueError(
            f"{path}: training.parallelism must be a mapping with keys "
            f"{sorted(_PARALLELISM_KEYS)}, got {par!r}"
        )
    for key, field in _PARALLELISM_KEYS.items():
        value = par.get(key)
        if value is None:  # absent or YAML null — keep the field's default
            continue
        try:
            training_section[field] = int(value)
        except (TypeError, ValueError):
            raise ValueError(
                f"{path}: training.parallelism.{key} must be an integer, "
                f"got {value!r}"
            ) from None
    unknown = set(par) - set(_PARALLELISM_KEYS)
    if unknown:  # a typo here silently trains unparallelised — unlike the
        # unknown-SECTION tolerance (QUIRKS #7), warn loudly
        logging.warning(
            "training.parallelism: ignoring unknown keys %s (known: %s)",
            sorted(unknown), sorted(_PARALLELISM_KEYS),
        )
    training = _build(TrainingConfig, training_section)
    return ExperimentConfig(
        training=training,
        logging=_build(LoggingConfig, cfg.get("logging")),
        data=_build(DataConfig, cfg.get("data")),
        model=_build(TFAMModelConfig, cfg.get("model")),
        config_path=path,
    )


def derive_run_dirs(config: ExperimentConfig, run_name: str | None = None) -> tuple[str, str]:
    """Timestamped run dirs ``<config_name>/{logs,checkpoints}/<ts>``
    (reference TFAM/train_and_eval.py:366-371)."""
    run_name = run_name or datetime.now().strftime("%Y%m%d-%H%M%S")
    base = config.config_path.split(".yaml")[0] if config.config_path else "run"
    log_dir = os.path.join(base, config.logging.log_dir, run_name)
    ckpt_dir = os.path.join(base, config.logging.checkpoint_dir, run_name)
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(ckpt_dir, exist_ok=True)
    return log_dir, ckpt_dir
