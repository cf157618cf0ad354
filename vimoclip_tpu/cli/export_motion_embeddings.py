"""Motion-embedding export CLI — the surface of the reference's
``python inference.py`` (flow, whole-video) and ``inference_frame_diff.py``
(streaming, resumable, memory-guarded) in one tool (SURVEY.md #12/#13)."""

from __future__ import annotations

import argparse
import logging

from vimoclip_tpu.utils.logging import setup_logging


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="Export student motion embeddings to HDF5")
    p.add_argument("--videos-dir", required=True, help="motion (flow/diff) video dir")
    p.add_argument("--output", required=True, help="output HDF5 path")
    p.add_argument("--checkpoint-dir", default=None,
                   help="student CheckpointManager dir (uses 'best')")
    p.add_argument("--torch-checkpoint", default=None,
                   help="reference-format student_best.pth instead "
                        "(train.py:174; DataParallel 'module.' prefix "
                        "handled) — a reference user's existing stage-1 "
                        "artifact drives this exporter unconverted")
    p.add_argument("--clip-weights", default=None,
                   help="vision config source; inferred from checkpoint if omitted")
    p.add_argument("--chunk-size", type=int, default=128,
                   help="streaming decode/forward chunk (frames)")
    p.add_argument("--compression", choices=["lzf", "gzip", "none"], default="lzf")
    p.add_argument("--min-free-gb", type=float, default=2.0,
                   help="RAM watchdog floor (inference_frame_diff.py:32-69)")
    p.add_argument("--overwrite", action="store_true",
                   help="recreate output instead of resuming")
    p.add_argument("--resize", type=int, nargs=2, default=None, metavar=("H", "W"))
    p.add_argument("--num-classes", type=int, default=140,
                   help="classifier width the checkpoint was trained with "
                        "(the head is not used for export, but the restore "
                        "target must match the stored tree)")
    p.add_argument("--float32", action="store_true")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="opt-in dynamic-int8 matmuls for the student's ViT "
                        "blocks (ops/quant.py; same param tree, so the "
                        "checkpoint restores unchanged) — approximate, NOT "
                        "the parity path")
    p.add_argument("--token-merge", type=int, default=0, metavar="R",
                   help="opt-in ToMe token merging in the student's ViT "
                        "(ops/tome.py; measured at ViT-B/32's 50-token "
                        "geometry: r=4 1.38x at cosine 0.984, r=8 1.86x at "
                        "0.966 — docs/PERF.md ledger 16 / tools/bench_tome.py "
                        "--model b32) — approximate, NOT the parity path")
    p.add_argument("--verify-fidelity", type=int, default=0, metavar="N",
                   help="before exporting, run N frames sampled from the "
                        "first motion video through BOTH the exact and the "
                        "--quantize/--token-merge student tower and report "
                        "the cosine — YOUR checkpoint's fidelity, not the "
                        "random-init pin (fidelity.py); aborts below "
                        "--fidelity-threshold")
    p.add_argument("--fidelity-threshold", type=float, default=0.97,
                   help="minimum per-frame cosine the --verify-fidelity "
                        "probe must reach (default 0.97)")
    args = p.parse_args(argv)
    if (args.checkpoint_dir is None) == (args.torch_checkpoint is None):
        p.error("exactly one of --checkpoint-dir / --torch-checkpoint "
                "is required")

    setup_logging()
    from vimoclip_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from vimoclip_tpu.export import MotionEmbeddingExporter, find_motion_videos
    from vimoclip_tpu.models.clip_vit import ClipVisionConfig
    from vimoclip_tpu.models.student import StudentModel
    from vimoclip_tpu.train.state import CheckpointManager, TrainState, make_adam

    if args.clip_weights:
        from vimoclip_tpu.models.pretrained import load_clip_vision

        vision_config, _ = load_clip_vision(args.clip_weights)
    else:
        vision_config = ClipVisionConfig.vit_b_32()
    if args.quantize or args.token_merge:
        import dataclasses

        vision_config = dataclasses.replace(
            vision_config,
            matmul_quant=args.quantize or vision_config.matmul_quant,
            token_merge_r=args.token_merge or vision_config.token_merge_r,
        )

    # Restore the best student checkpoint (inference.py:79-87 loads
    # student_best.pth; here CheckpointManager/best, or the reference's
    # own torch file directly).
    if args.checkpoint_dir:
        model = StudentModel(vision_config=vision_config,
                             num_classes=args.num_classes)
        import jax.numpy as jnp

        dummy = jnp.zeros(
            (1, 2, vision_config.image_size, vision_config.image_size, 3),
            jnp.uint8,
        )
        params = model.init(jax.random.key(0), dummy)["params"]
        state = TrainState.create(params, make_adam(1e-5))
        ckpt = CheckpointManager(args.checkpoint_dir)
        state, _ = ckpt.restore(state, "best")
        student_params = state.params
    else:
        # without --clip-weights the backbone geometry is inferred from
        # the checkpoint's own shapes
        from vimoclip_tpu.models.torch_compat import (
            student_params_from_checkpoint,
        )

        inferred, student_params = student_params_from_checkpoint(
            args.torch_checkpoint,
            vision_config if args.clip_weights else None,
        )
        if inferred is not vision_config:
            import dataclasses

            vision_config = dataclasses.replace(
                inferred,
                matmul_quant=vision_config.matmul_quant,
                token_merge_r=vision_config.token_merge_r,
            )

    videos = find_motion_videos(args.videos_dir)
    logging.info("found %d motion videos", len(videos))

    if args.verify_fidelity and (
        vision_config.matmul_quant or vision_config.token_merge_r
    ):
        if not videos:
            raise SystemExit("--verify-fidelity: no motion videos to probe")
        from vimoclip_tpu.fidelity import check_encoder_fidelity

        tower = student_params.get("visual_encoder", student_params)
        check_encoder_fidelity(
            tower, vision_config, videos[0],
            args.verify_fidelity, args.fidelity_threshold,
            half_precision=not args.float32, encoder_name="student ViT",
        )

    exporter = MotionEmbeddingExporter(
        student_params, vision_config,
        chunk_size=args.chunk_size,
        half_precision=not args.float32,
        compression=None if args.compression == "none" else args.compression,
        min_free_gb=args.min_free_gb,
    )
    exporter.export(
        videos, args.output, overwrite=args.overwrite,
        resize_to=tuple(args.resize) if args.resize else None,
    )


if __name__ == "__main__":
    main()
