"""Offline motion-video generation CLI — frame-diff (on-device XLA absdiff)
and Farnebäck optical flow; the surface of the reference's
``utils/generate_frame_diff_video.py`` and ``utils/generate_of_videos.py``.
RAFT/ptlflow (the paper's flow backbone, README.md:81-162) plugs in via
``--kind flow`` with a custom flow_fn at the library level."""

from __future__ import annotations

import argparse

from vimoclip_tpu.utils.logging import setup_logging


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="Generate motion-modality videos")
    p.add_argument("--list-file", required=True, help="one relative video path per line")
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--kind", choices=["frame_diff", "flow"], default="frame_diff")
    p.add_argument("--no-skip-existing", action="store_true")
    args = p.parse_args(argv)

    setup_logging()
    from vimoclip_tpu.motion import process_video_list

    errors = process_video_list(
        args.list_file, args.input_dir, args.output_dir, kind=args.kind,
        skip_existing=not args.no_skip_existing,
    )
    if errors:
        print(f"{len(errors)} videos failed")


if __name__ == "__main__":
    main()
