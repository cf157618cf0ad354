"""Stage-1 MoCLIP distillation CLI — the surface of the reference's
``python train.py`` / ``train_frame_diff.py`` / ``train_frame_diff_mn.py``
(argparse defaults mirror train.py:178-216), one CLI with modality/dataset
flags instead of three near-duplicate scripts."""

from __future__ import annotations

import argparse
import logging

from vimoclip_tpu.utils.logging import setup_logging


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="Train the MoCLIP motion student")
    # reference defaults (train.py:178-216)
    p.add_argument("--epochs", type=int, default=10)
    # TPU operating point from the measured scaling curve (docs/PERF.md:
    # b2 56% MFU -> b8 73% MFU); the reference's default is 32
    # (train.py:183) and remains reachable here.
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--grad-accum", type=int, default=1,
                   help="accumulate gradients over N equal microbatches "
                        "before each Adam update: the --batch-size loss "
                        "surface at batch_size/N activation memory (reach "
                        "the reference's batch 32, train.py:183, on clips "
                        "whose activations outgrow HBM)")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--grad-clip", type=float, default=None)
    p.add_argument("--distill-mode", choices=["mse", "cosine"], default="cosine")
    p.add_argument("--num-classes", type=int, default=140)
    p.add_argument("--sequence-length", type=int, default=30)
    p.add_argument("--residual-alpha", type=float, default=0.1)
    p.add_argument("--class-pos-weight", type=float, default=9.0)
    p.add_argument("--seed", type=int, default=49)
    # paths
    p.add_argument("--train-embeddings", required=True, help="teacher HDF5 (train)")
    p.add_argument("--val-embeddings", required=True, help="teacher HDF5 (val)")
    p.add_argument("--motion-videos-dir", required=True,
                   help="flow or frame-diff video directory")
    p.add_argument("--checkpoint-dir", default="checkpoints/student")
    p.add_argument("--log-dir", default="logs/student")
    p.add_argument("--clip-weights", default=None,
                   help="CLIP init for the backbone (student_model.py:44); "
                        "random init if omitted")
    # dataset variants
    p.add_argument("--dataset", choices=["ak", "mammalnet"], default="ak",
                   help="mammalnet = CE loss, nested trimmed_videos/ groups, "
                        "224x224 resize (train_frame_diff_mn.py)")
    p.add_argument("--float32", action="store_true")
    p.add_argument("--checkpoint-every-steps", type=int, default=None,
                   help="also checkpoint mid-epoch every N steps (stage-1 "
                        "epochs decode the whole motion corpus; a crash "
                        "without this loses the epoch)")
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest checkpoint, including "
                        "mid-epoch ones (exact-batch resume)")
    p.add_argument("--data-parallel", type=int, default=-1)
    p.add_argument("--model-parallel", type=int, default=1)
    args = p.parse_args(argv)

    setup_logging()
    from vimoclip_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    from vimoclip_tpu.data.segment_dataset import SegmentDataset
    from vimoclip_tpu.models.clip_vit import ClipVisionConfig
    from vimoclip_tpu.train.student_trainer import StudentTrainer

    nested = "trimmed_videos" if args.dataset == "mammalnet" else None
    spatial = (224, 224) if args.dataset == "mammalnet" else None
    train_ds = SegmentDataset(
        args.train_embeddings, args.motion_videos_dir,
        sequence_length=args.sequence_length, nested_prefix=nested,
        spatial_size=spatial,
    )
    val_ds = SegmentDataset(
        args.val_embeddings, args.motion_videos_dir,
        sequence_length=args.sequence_length, nested_prefix=nested,
        spatial_size=spatial,
    )
    logging.info("train segments: %d, val segments: %d", len(train_ds), len(val_ds))

    vision_config, pretrained = None, None
    if args.clip_weights:
        from vimoclip_tpu.models.pretrained import load_clip_vision

        vision_config, pretrained = load_clip_vision(args.clip_weights)
    else:
        vision_config = ClipVisionConfig.vit_b_32()

    trainer = StudentTrainer(
        train_ds, val_ds,
        checkpoint_dir=args.checkpoint_dir, log_dir=args.log_dir,
        vision_config=vision_config, pretrained_params=pretrained,
        num_classes=args.num_classes, alpha=args.residual_alpha,
        lr=args.lr, batch_size=args.batch_size, num_workers=args.num_workers,
        epochs=args.epochs, distill_mode=args.distill_mode,
        class_loss="ce" if args.dataset == "mammalnet" else "bce",
        class_pos_weight=args.class_pos_weight, grad_clip=args.grad_clip,
        seed=args.seed, data_parallel=args.data_parallel,
        model_parallel=args.model_parallel,
        half_precision=not args.float32,
        checkpoint_every_steps=args.checkpoint_every_steps,
        resume=args.resume,
        grad_accum=args.grad_accum,
    )
    best = trainer.train()
    logging.info("best val total loss: %.4f", best)


if __name__ == "__main__":
    main()
