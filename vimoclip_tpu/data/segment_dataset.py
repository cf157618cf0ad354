"""Stage-1 segment dataset: fixed-length windows of (RGB embeddings, motion
frames) for MoCLIP distillation.

Reference parity (dataset.py / dataset_frame_diff.py — identical up to key
names, SURVEY.md #3/#4):

- Each video is split into non-overlapping ``sequence_length`` windows; the
  index of (video_id, start, seg_len) tuples is built once from HDF5 shapes
  (dataset.py:33-57).
- Item: RGB embedding slice padded by repeating the last frame
  (dataset.py:77-91); ``seg_len - 1`` motion frames from the motion video
  (motion has T-1 frames for T RGB frames), clamped at EOF and padded by
  repeating the last frame (dataset.py:96-127).
- The MN variant reads groups nested under ``trimmed_videos/`` and resizes
  frames to ``spatial_size`` (dataset_frame_diff_mn.py:42,82-91).

TPU-first difference: instead of decoding the WHOLE motion video per
__getitem__ (dataset.py:98 — the reference's #1 data-plane sin), only the
needed window is decoded via seek (read_video_window). An OPT-IN
per-process LRU of fully-decoded videos (``decode_cache_videos``) serves
sequential multi-segment access (unshuffled eval sweeps); it is OFF by
default because under the trainer's shuffled loader the hit rate is ~0
and every miss would full-decode a video to serve one <=30-frame window
— strictly worse than the seek path.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict

import cv2
import numpy as np

from vimoclip_tpu.data.hdf5_schema import read_embeddings, read_labels, sequence_lengths
from vimoclip_tpu.data.video_reader import (
    read_video,
    read_video_window,
    video_frame_count,
)


def build_segment_index(
    lengths: dict[str, int], sequence_length: int
) -> list[tuple[str, int, int]]:
    """(video_id, start, seg_len) for non-overlapping windows; the final
    short remainder becomes one padded segment (dataset.py:48-57)."""
    segments = []
    for vid, t in lengths.items():
        if t == 0:
            continue
        start = 0
        while start < t:
            seg_len = min(sequence_length, t - start)
            segments.append((vid, start, seg_len))
            start += seg_len
    return segments


def _pad_repeat_last(x: np.ndarray, target: int) -> np.ndarray:
    if x.shape[0] >= target:
        return x[:target]
    if x.shape[0] == 0:
        return np.zeros((target,) + x.shape[1:], dtype=x.dtype)
    reps = np.repeat(x[-1:], target - x.shape[0], axis=0)
    return np.concatenate([x, reps], axis=0)


class SegmentDataset:
    """Map-style dataset of distillation segments."""

    def __init__(
        self,
        embeddings_path: str,
        motion_videos_dir: str,
        sequence_length: int = 30,
        nested_prefix: str | None = None,
        spatial_size: tuple[int, int] | None = None,
        decode_cache_videos: int = 0,
    ):
        self.embeddings_path = embeddings_path
        self.motion_videos_dir = motion_videos_dir
        self.sequence_length = sequence_length
        self.nested_prefix = nested_prefix
        self.spatial_size = spatial_size
        lengths = sequence_lengths(embeddings_path, nested_prefix)
        self.segments = build_segment_index(lengths, sequence_length)
        self._cache: OrderedDict[str, np.ndarray] = OrderedDict()
        self._cache_size = decode_cache_videos
        # BatchLoader maps __getitem__ across worker THREADS: cache
        # mutations need a lock, and readers must hold a local reference —
        # another worker's insert can evict an entry between this worker's
        # insert and its read.
        self._cache_lock = threading.Lock()

    def __len__(self) -> int:
        return len(self.segments)

    def _h5_key(self, video_id: str) -> str:
        return f"{self.nested_prefix}/{video_id}" if self.nested_prefix else video_id

    def _motion_window(self, video_id: str, start: int, n: int) -> np.ndarray:
        path = os.path.join(self.motion_videos_dir, video_id)
        if self._cache_size > 0:
            with self._cache_lock:
                video = self._cache.get(video_id)
                if video is not None:
                    self._cache.move_to_end(video_id)  # LRU, not FIFO
            if video is None:
                try:
                    video = read_video(path)  # decode outside the lock
                except IOError as e:
                    raise ValueError(
                        f"motion video for {video_id!r} decoded 0 frames "
                        f"({path}) — regenerate it or drop the video"
                    ) from e
                with self._cache_lock:
                    self._cache[video_id] = video
                    self._cache.move_to_end(video_id)
                    while len(self._cache) > self._cache_size:
                        self._cache.popitem(last=False)
            t = video.shape[0]
            start = min(start, max(t - 1, 0))  # clamp like dataset.py:112-113
            return video[start : min(start + n, t)]
        # Seek path (default): clamp the start the same way (the final padded
        # RGB segment requests motion frames past the T-1 motion stream).
        total = video_frame_count(path)
        if total > 0:
            start = min(start, total - 1)
        try:
            return read_video_window(path, start, n)
        except IOError as e:
            if start > 0:
                # The container didn't report a frame count, so the EOF
                # clamp above couldn't run and the final padded segment can
                # request exactly one-past-the-end — step back one frame,
                # the same place the clamp would have landed.
                try:
                    return read_video_window(path, start - 1, n)
                except IOError:
                    pass
            raise ValueError(
                f"motion video for {video_id!r} decoded 0 frames at "
                f"window start {start} ({path}) — regenerate it or drop "
                "the video"
            ) from e

    def __getitem__(self, idx: int) -> dict:
        video_id, start, seg_len = self.segments[idx]
        key = self._h5_key(video_id)
        rgb = read_embeddings(self.embeddings_path, key, start, start + seg_len)
        rgb = _pad_repeat_last(rgb, self.sequence_length)
        labels = read_labels(self.embeddings_path, key)

        # Motion stream has T-1 frames; padded segments use the full
        # sequence_length - 1 (dataset.py:102-106).
        motion_len = (
            self.sequence_length - 1 if seg_len < self.sequence_length else seg_len - 1
        )
        motion = self._motion_window(video_id, start, motion_len)
        if self.spatial_size is not None and motion.size:
            h, w = self.spatial_size
            motion = np.stack(
                [cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR) for f in motion]
            )
        motion = _pad_repeat_last(motion, motion_len)

        return {
            "video_id": video_id,
            "rgb_emb": rgb.astype(np.float32),
            "motion_frames": motion,
            "labels": labels.astype(np.float32),
        }


def collate_segments(items: list[dict]) -> dict:
    """Stack fixed-shape segments (collate_fn, dataset.py:137-148)."""
    return {
        "video_id": [it["video_id"] for it in items],
        "rgb_emb": np.stack([it["rgb_emb"] for it in items]),
        "motion_frames": np.stack([it["motion_frames"] for it in items]),
        "labels": np.stack([it["labels"] for it in items]),
    }
