"""Teacher-embedding extraction CLI — the surface of the reference's
``python extract_embeddings.py`` (AK, ViT-B/16) and
``extract_embeddings_mammalNet.py`` (MN, ViT-B/32, SURVEY.md #1/#2), unified
with flags instead of near-duplicate scripts."""

from __future__ import annotations

import argparse
import logging
import time

from vimoclip_tpu.utils.logging import setup_logging


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="Extract CLIP frame embeddings to HDF5")
    p.add_argument("--data-root", required=True, help="video directory")
    p.add_argument("--annotation-file", required=True,
                   help="'<video> label...' lines (train_multi.txt format)")
    p.add_argument("--class-file", required=True, help="id,name csv (ak_action.csv)")
    p.add_argument("--output", required=True, help="output HDF5 path")
    p.add_argument("--clip-weights", required=True,
                   help="CLIP checkpoint: safetensors / torch state dict / HF dir")
    p.add_argument("--max-frames", type=int, default=None,
                   help="uniform frame subsampling cap (extract_embeddings.py:77-81)")
    p.add_argument("--batch-size", type=int, default=256,
                   help="device batch (frames)")
    p.add_argument("--split", default="val", choices=["train", "val", "test"])
    p.add_argument("--dataset-name", default="AnimalKingdom")
    p.add_argument("--no-compression", action="store_true",
                   help="disable gzip (faster writes)")
    p.add_argument("--dedup-threshold", type=float, default=None,
                   help="opt-in temporal-redundancy gating: frames whose "
                        "mean |pixel delta| to the last embedded frame is "
                        "below this (uint8 units, e.g. 1.0) reuse its "
                        "embedding instead of running the ViT")
    p.add_argument("--float32", action="store_true",
                   help="full-precision forward (default bfloat16)")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="opt-in dynamic-int8 matmuls for the ViT encoder "
                        "blocks (ops/quant.py): ~2x MXU rate on v5e at a "
                        "small, test-pinned embedding error — NOT the "
                        "parity path")
    p.add_argument("--token-merge", type=int, default=0, metavar="R",
                   help="opt-in ToMe token merging (ops/tome.py): merge R "
                        "spatially-redundant patch tokens after every "
                        "encoder block (r=16 halves ViT-B/16 block FLOPs "
                        "at the paper's sub-point accuracy cost) — NOT "
                        "the parity path")
    p.add_argument("--verify-fidelity", type=int, default=0, metavar="N",
                   help="before extracting, run N frames sampled from the "
                        "first annotated video through BOTH the exact and "
                        "the --quantize/--token-merge encoder and report "
                        "the cosine — YOUR checkpoint's fidelity, not the "
                        "random-init pin (fidelity.py); aborts below "
                        "--fidelity-threshold")
    p.add_argument("--fidelity-threshold", type=float, default=0.97,
                   help="minimum per-frame cosine the --verify-fidelity "
                        "probe must reach (default 0.97)")
    p.add_argument("--num-shards", type=int, default=1,
                   help="split the annotation list over this many extraction "
                        "jobs (pair with --shard-index; merge outputs with "
                        "vimo-h5-merge)")
    p.add_argument("--shard-index", type=int, default=0)
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard each frame batch over this many devices "
                        "(one ViT forward spans the mesh's data axis)")
    args = p.parse_args(argv)

    setup_logging()
    from vimoclip_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    from vimoclip_tpu.extraction import create_hdf5_dataset
    from vimoclip_tpu.models.pretrained import load_clip_vision

    config, params = load_clip_vision(args.clip_weights)
    if args.quantize or args.token_merge:
        import dataclasses

        config = dataclasses.replace(
            config,
            matmul_quant=args.quantize or config.matmul_quant,
            token_merge_r=args.token_merge or config.token_merge_r,
        )
        logging.info("approximate encoder options: quantize=%s token_merge=%d",
                     args.quantize, args.token_merge)
    if args.verify_fidelity and (config.matmul_quant or config.token_merge_r):
        import os

        from vimoclip_tpu.extraction import load_annotations
        from vimoclip_tpu.fidelity import (
            check_encoder_fidelity,
            sample_video_frames,
        )

        # probe THIS shard's corpus (the global first video may belong to
        # another job), and tolerate unreadable files the way extraction
        # itself does (warn + skip, extraction.py:524-527) — only a real
        # below-threshold fidelity result aborts
        annotations = load_annotations(args.annotation_file)
        if args.num_shards > 1:
            annotations = annotations[args.shard_index::args.num_shards]
        for vid, _ in annotations:
            probe_path = os.path.join(args.data_root, vid)
            try:
                frames = sample_video_frames(probe_path, args.verify_fidelity)
            except Exception as e:  # noqa: BLE001 — decode fault tolerance
                logging.warning(
                    "fidelity probe: cannot read %s (%s); trying the next "
                    "annotated video", probe_path, e,
                )
                continue
            check_encoder_fidelity(
                params, config, probe_path,
                args.verify_fidelity, args.fidelity_threshold,
                half_precision=not args.float32,
                encoder_name="teacher ViT", frames=frames,
            )
            break
        else:
            raise RuntimeError(
                "--verify-fidelity: no readable video in this shard's "
                "annotation list to probe"
            )
    mesh = None
    if args.data_parallel > 1:
        from vimoclip_tpu.parallel import MeshConfig, create_mesh

        mesh = create_mesh(MeshConfig(args.data_parallel, 1))
        logging.info("extraction mesh: %d-way data parallel", args.data_parallel)
    logging.info("CLIP visual tower: patch %d, %d layers, proj %d",
                 config.patch_size, config.num_layers, config.projection_dim)

    start = time.time()
    errors = create_hdf5_dataset(
        data_root=args.data_root,
        annotation_file=args.annotation_file,
        class_file=args.class_file,
        output_hdf5=args.output,
        params=params,
        config=config,
        max_frames=args.max_frames,
        batch_size=args.batch_size,
        split=args.split,
        dataset_name=args.dataset_name,
        clip_model_name=f"ViT-B/{config.patch_size}",
        compression=None if args.no_compression else "gzip",
        dedup_threshold=args.dedup_threshold,
        mesh=mesh,
        # --float32 was parsed but never plumbed before round 2 — the same
        # trap as the reference's ignored YAML lr (docs/QUIRKS.md #3).
        half_precision=not args.float32,
        num_shards=args.num_shards,
        shard_index=args.shard_index,
    )
    logging.info("done in %.1fs; %d errors", time.time() - start, len(errors))
    for vid, err in errors.items():
        logging.warning("  %s: %s", vid, err)


if __name__ == "__main__":
    main()
