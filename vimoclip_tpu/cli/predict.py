"""Single-command inference: raw video file(s) -> top-k action predictions.

The reference has NO inference path for one video — producing a prediction
requires manually chaining extract_embeddings.py -> inference*.py ->
TFAM/train_and_eval*.py through HDF5 files (SURVEY.md §1). This CLI fronts
``serving.ViMoCLIPPredictor``: the full fused cascade (CLIP teacher +
on-device frame-diff + MoCLIP student + TFAM fusion) in one process, one
device pass per frame.

Weights come from:
- ``--teacher-weights``: CLIP visual tower (safetensors / torch state dict /
  HF dir; models.pretrained.load_clip_vision),
- ``--student-checkpoint-dir``: stage-1 CheckpointManager dir (uses 'best'),
- ``--tfam-checkpoint-dir`` (CheckpointManager 'best') OR
  ``--tfam-torch-checkpoint`` (a reference-format best_model.pth,
  TFAM/train_and_eval.py:133-149) with ``--tfam-config`` YAML for geometry.
"""

from __future__ import annotations

import argparse
import json
import logging
import os

from vimoclip_tpu.utils.logging import setup_logging


def add_model_args(p: argparse.ArgumentParser) -> None:
    """The weight/config/turbo flags shared by vimo-predict and vimo-serve
    (cli/serve.py builds the identical predictor from them)."""
    p.add_argument("--teacher-weights", required=True,
                   help="CLIP visual weights (safetensors/.pt/.pth/HF dir)")
    p.add_argument("--student-checkpoint-dir", default=None,
                   help="stage-1 student CheckpointManager dir (uses 'best')")
    p.add_argument("--student-torch-checkpoint", default=None,
                   help="reference-format student_best.pth instead "
                        "(train.py:174; DataParallel 'module.' prefix "
                        "handled)")
    p.add_argument("--student-clip-weights", default=None,
                   help="vision config source for the student tower "
                        "(like vimo-export-motion's --clip-weights); "
                        "default ViT-B/32")
    p.add_argument("--tfam-config", required=True,
                   help="stage-2 YAML config (model geometry + class names)")
    p.add_argument("--tfam-checkpoint-dir", default=None,
                   help="stage-2 CheckpointManager dir (uses 'best')")
    p.add_argument("--tfam-torch-checkpoint", default=None,
                   help="reference-format best_model.pth instead")
    p.add_argument("--motion-videos-dir", default=None,
                   help="precomputed motion videos matched by filename; "
                        "default: on-device frame-diff of the RGB frames")
    p.add_argument("--student-num-classes", type=int, default=None,
                   help="classifier width the stage-1 checkpoint was "
                        "trained with (restore target must match the "
                        "stored tree; default: the TFAM config's "
                        "num_classes)")
    p.add_argument("--top-k", type=int, default=5)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--output", default=None, help="write predictions JSON here")
    p.add_argument("--frame-batch", type=int, default=128)
    p.add_argument("--float32", action="store_true")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="opt-in dynamic-int8 matmuls in both ViT towers "
                        "(ops/quant.py) — approximate, NOT the parity path")
    p.add_argument("--token-merge", type=int, default=0, metavar="R",
                   help="opt-in ToMe token merging in the TEACHER tower "
                        "(ops/tome.py; the student's t=50 has too few "
                        "tokens to pay off) — approximate, NOT the parity "
                        "path")
    p.add_argument("--verify-fidelity", type=int, default=0, metavar="N",
                   help="before predicting, run N frames sampled from the "
                        "first video through BOTH the exact and the "
                        "--quantize/--token-merge towers and report the "
                        "cosine — YOUR checkpoints' fidelity, not the "
                        "random-init pin (fidelity.py); aborts below "
                        "--fidelity-threshold")
    p.add_argument("--fidelity-threshold", type=float, default=0.97,
                   help="minimum per-frame cosine the --verify-fidelity "
                        "probe must reach (default 0.97)")
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard each fixed-shape frame batch over this many "
                        "devices (the extractor's mesh scheme; frame-batch "
                        "must divide by it)")
    p.add_argument("--quirk-batch-pooling", action="store_true",
                   help="restore the reference's batch-max pooling for "
                        "multi-video requests (predictions then depend on "
                        "what a clip is co-batched with, AMO_CLIP.py:170); "
                        "default is batch-invariant masked pooling, "
                        "bit-identical for single videos — serving.py")


def validate_model_args(p: argparse.ArgumentParser, args) -> None:
    if (args.tfam_checkpoint_dir is None) == (args.tfam_torch_checkpoint is None):
        p.error("exactly one of --tfam-checkpoint-dir / "
                "--tfam-torch-checkpoint is required")
    if (args.student_checkpoint_dir is None) == \
            (args.student_torch_checkpoint is None):
        p.error("exactly one of --student-checkpoint-dir / "
                "--student-torch-checkpoint is required")


def build_predictor(args, probe_video: str | None = None):
    """Load all three stages' weights and construct the fused predictor
    (shared by vimo-predict and vimo-serve). ``probe_video`` feeds the
    optional --verify-fidelity guard rail."""
    from vimoclip_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vimoclip_tpu.config import load_experiment_config
    from vimoclip_tpu.models import TFAM
    from vimoclip_tpu.models.clip_vit import ClipVisionConfig
    from vimoclip_tpu.models.pretrained import load_clip_vision
    from vimoclip_tpu.models.student import StudentModel
    from vimoclip_tpu.serving import ViMoCLIPPredictor
    from vimoclip_tpu.train.state import CheckpointManager, TrainState, make_adam

    cfg = load_experiment_config(args.tfam_config)

    teacher_config, teacher_params = load_clip_vision(args.teacher_weights)

    # stage-1 student 'best' (reference: student_best.pth, inference.py:79-87)
    if args.student_clip_weights:
        student_config, _ = load_clip_vision(args.student_clip_weights)
    else:
        student_config = ClipVisionConfig.vit_b_32()
    if args.quantize or args.token_merge:
        import dataclasses

        # like extract_embeddings: flags add to, never clobber, whatever the
        # loaded configs already carry
        teacher_config = dataclasses.replace(
            teacher_config,
            matmul_quant=args.quantize or teacher_config.matmul_quant,
            token_merge_r=args.token_merge or teacher_config.token_merge_r,
        )
        student_config = dataclasses.replace(
            student_config,
            matmul_quant=args.quantize or student_config.matmul_quant,
        )
    if args.student_checkpoint_dir:
        student = StudentModel(
            vision_config=student_config,
            num_classes=args.student_num_classes or cfg.num_classes,
        )
        dummy = jnp.zeros(
            (1, 2, student_config.image_size, student_config.image_size, 3),
            jnp.uint8,
        )
        sparams = student.init(jax.random.key(0), dummy)["params"]
        sstate = TrainState.create(sparams, make_adam(1e-5))
        sstate, _ = CheckpointManager(args.student_checkpoint_dir).restore(
            sstate, "best"
        )
        student_params = sstate.params
    else:
        # reference-format student_best.pth (train.py:174) directly — a
        # reference user's existing stage-1 artifact needs no conversion;
        # without --student-clip-weights the backbone geometry is inferred
        # from the checkpoint's own shapes
        from vimoclip_tpu.models.torch_compat import (
            student_params_from_checkpoint,
        )

        inferred, student_params = student_params_from_checkpoint(
            args.student_torch_checkpoint,
            student_config if args.student_clip_weights else None,
        )
        if inferred is not student_config:
            import dataclasses

            student_config = dataclasses.replace(
                inferred, matmul_quant=student_config.matmul_quant
            )

    # stage-2 TFAM 'best' (orbax) or reference torch checkpoint
    if args.tfam_checkpoint_dir:
        tfam = TFAM(config=cfg.model, num_classes=cfg.num_classes)
        d = cfg.model.d_model
        fparams = tfam.init(
            jax.random.key(1), jnp.zeros((1, 4, d)), jnp.zeros((1, 3, d)),
            jnp.ones((1, 4), bool), jnp.ones((1, 3), bool),
        )["params"]
        # The restore target must mirror the trainer's saved tree: TFAM
        # trains with a SCHEDULED AdamW (cosine), whose optax state carries
        # a schedule-count leaf a float-lr AdamW lacks — so build the
        # template with a (trivial) callable schedule.
        from vimoclip_tpu.train.state import make_adamw

        fstate = TrainState.create(
            fparams,
            make_adamw(lambda step: cfg.training.lr,
                       weight_decay=cfg.training.weight_decay),
        )
        fstate, _ = CheckpointManager(args.tfam_checkpoint_dir).restore(
            fstate, "best"
        )
        fparams = fstate.params
    else:
        from vimoclip_tpu.models.torch_compat import tfam_params_from_checkpoint

        fparams = tfam_params_from_checkpoint(
            args.tfam_torch_checkpoint,
            num_layers=cfg.model.num_layers, d_model=cfg.model.d_model,
        )

    if args.verify_fidelity and probe_video is not None:
        from vimoclip_tpu.fidelity import check_encoder_fidelity

        if teacher_config.matmul_quant or teacher_config.token_merge_r:
            check_encoder_fidelity(
                teacher_params, teacher_config, probe_video,
                args.verify_fidelity, args.fidelity_threshold,
                half_precision=not args.float32, encoder_name="teacher ViT",
            )
        if student_config.matmul_quant or student_config.token_merge_r:
            from vimoclip_tpu.fidelity import sample_motion_probe_frames

            tower = student_params.get("visual_encoder", student_params)
            # In this cascade the student only ever sees frame_diff()
            # outputs (serving.py), whose near-black sparse statistics
            # stress int8/ToMe very differently from RGB — probe on THAT
            # distribution, not on raw probe-video frames.
            check_encoder_fidelity(
                tower, student_config, probe_video,
                args.verify_fidelity, args.fidelity_threshold,
                half_precision=not args.float32,
                encoder_name="student ViT (frame-diff probe)",
                frames=sample_motion_probe_frames(
                    probe_video, args.verify_fidelity
                ),
            )

    class_names: dict[int, str] = {}
    path = cfg.data.class_names_dir
    if path and os.path.exists(path):
        from vimoclip_tpu.extraction import load_class_names

        class_names = load_class_names(path)

    mesh = None
    if args.data_parallel > 1:
        from vimoclip_tpu.parallel import MeshConfig, create_mesh

        mesh = create_mesh(MeshConfig(args.data_parallel, 1))

    return ViMoCLIPPredictor(
        teacher_params=teacher_params, teacher_config=teacher_config,
        student_params=student_params, student_config=student_config,
        tfam_params=fparams, tfam_config=cfg.model,
        num_classes=cfg.num_classes, class_names=class_names,
        frame_batch=args.frame_batch,
        length_bucket=cfg.data.length_bucket,
        max_seq_len=cfg.data.max_seq_len,
        half_precision=not args.float32,
        batch_invariant=not args.quirk_batch_pooling,
        mesh=mesh,
    )


def find_motion_match(motion_videos_dir: str | None, video: str) -> str | None:
    """Match a precomputed motion video by filename stem (reference keying:
    flow key = rgb key minus extension, TFAM/data/dataset.py:65)."""
    if not motion_videos_dir:
        return None
    stem = os.path.splitext(os.path.basename(video))[0]
    for ext in (".mp4", ".avi", ".mkv", ".webm"):
        cand = os.path.join(motion_videos_dir, stem + ext)
        if os.path.exists(cand):
            return cand
    return None


def prediction_record(video: str, pred) -> dict:
    """The per-video JSON record shape — ONE definition shared by
    vimo-predict's --output file and vimo-serve's responses, so daemon
    consumers parse both unchanged (cli/serve.py imports this)."""
    return {
        "video": video,
        "predictions": [
            {"class_id": cid, "class_name": name,
             "probability": round(prob, 4)}
            for cid, name, prob in pred.top_classes
        ],
    }


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(
        description="Predict actions for raw videos (full fused cascade)"
    )
    p.add_argument("videos", nargs="+", help="video file(s)")
    add_model_args(p)
    args = p.parse_args(argv)
    validate_model_args(p, args)

    setup_logging()
    predictor = build_predictor(args, probe_video=args.videos[0])

    results = []
    for video in args.videos:
        motion_path = find_motion_match(args.motion_videos_dir, video)
        pred = predictor.predict(
            video, motion_video_path=motion_path,
            top_k=args.top_k, max_frames=args.max_frames,
        )
        results.append(prediction_record(video, pred))
        top = pred.top_classes[0]
        logging.info("%s -> %s (p=%.3f)", video, top[1], top[2])
        for cid, name, prob in pred.top_classes:
            print(f"  {name:<30s} {prob:.4f}")

    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)
        logging.info("predictions written to %s", args.output)


if __name__ == "__main__":
    main()
