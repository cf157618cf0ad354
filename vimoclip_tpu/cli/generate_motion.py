"""Offline motion-video generation CLI — frame-diff (on-device XLA absdiff)
and optical flow; the surface of the reference's
``utils/generate_frame_diff_video.py`` and ``utils/generate_of_videos.py``.

Flow backends: ``farneback`` (in-repo OpenCV, generate_of_videos.py:51) or
``raft`` — any ptlflow model per the paper's recipe (reference
README.md:81-162), loaded from ptlflow when installed or from a serialized
torch module via ``--flow-weights`` (vimoclip_tpu.motion.PtlflowAdapter).
"""

from __future__ import annotations

import argparse

from vimoclip_tpu.utils.logging import setup_logging


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="Generate motion-modality videos")
    p.add_argument("--list-file", required=True, help="one relative video path per line")
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--kind", choices=["frame_diff", "flow"], default="frame_diff")
    p.add_argument("--flow-backend", choices=["farneback", "raft"],
                   default="farneback",
                   help="flow estimator for --kind flow (raft = ptlflow-style "
                        "torch model, the paper's backbone)")
    p.add_argument("--flow-weights", default=None,
                   help="raft backend: ptlflow checkpoint name/path, or a "
                        "serialized torch module when ptlflow is absent")
    p.add_argument("--flow-model", default="raft",
                   help="ptlflow architecture name for --flow-backend raft "
                        "(e.g. raft, gma, flowformer); used only when "
                        "ptlflow is installed")
    p.add_argument("--flow-device", default="cpu",
                   help="torch device for the raft backend")
    p.add_argument("--no-skip-existing", action="store_true")
    args = p.parse_args(argv)

    setup_logging()
    from vimoclip_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    from vimoclip_tpu.motion import load_flow_backend, process_video_list

    flow_fn = None
    if args.kind == "flow":
        flow_fn = load_flow_backend(
            args.flow_backend, weights=args.flow_weights,
            device=args.flow_device, model_name=args.flow_model,
        )
    errors = process_video_list(
        args.list_file, args.input_dir, args.output_dir, kind=args.kind,
        skip_existing=not args.no_skip_existing, flow_fn=flow_fn,
    )
    if errors:
        print(f"{len(errors)} videos failed")


if __name__ == "__main__":
    main()
