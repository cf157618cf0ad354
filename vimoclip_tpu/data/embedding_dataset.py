"""Paired RGB/motion embedding dataset for the TFAM stage.

Reference parity (TFAM/data/dataset.py, dataset_frame_diff.py — identical up
to key names, SURVEY.md #15/#16):

- one item = the FULL (T, 512) RGB sequence + full (T-1, 512) motion
  sequence of one video, loaded from two HDF5 files; motion key = RGB key
  with the file extension stripped (``key.split(".")[0]``, dataset.py:65);
- optional ``num_frames`` sparse subsampling (linspace + truncation,
  dataset.py:7-12) and ``max_frames`` filtering (drop videos with
  T >= max_frames, dataset.py:27-45);
- ``collate_pad`` pads both streams to the batch max and returns boolean
  validity masks (True = real frame, dataset.py:76-112).

TPU-first addition: ``bucket`` rounds padded lengths up to a multiple, so
jit compiles a handful of programs instead of one per distinct batch-max
length. ``bucket=None`` reproduces the reference's exact per-batch-max
padding.
"""

from __future__ import annotations

import threading

import numpy as np
import h5py

from vimoclip_tpu.ops.batching import pad_to_batch, round_up_bucket as _bucketed


def sparse_sample_indices(total_frames: int, num_frames: int) -> np.ndarray:
    """torch.linspace(0, T-1, n).long() semantics (truncation toward zero)."""
    return np.linspace(0, total_frames - 1, num_frames).astype(np.int64)


class PairedEmbeddingDataset:
    """Map-style dataset over (RGB embeddings h5, motion embeddings h5)."""

    def __init__(
        self,
        rgb_path: str,
        motion_path: str,
        num_frames: int | None = None,
        max_frames: int | None = None,
    ):
        self.rgb_path = rgb_path
        self.motion_path = motion_path
        self.num_frames = num_frames

        with h5py.File(rgb_path, "r") as f:
            # Flat AK layout: every top-level group holds `embeddings`.
            # Nested MN layout: groups sit one level under trimmed_videos/
            # (extract_embeddings_mammalNet.py:97,113 creates
            # "trimmed_videos/<id>.mp4" groups). The reference's OWN MN
            # stage-2 dataset lists only top-level keys over that nested
            # file (TFAM/data/dataset_frame_diff.py:26) and so sees a
            # single unusable group — broken as-committed (QUIRKS.md #24);
            # here one level of nesting is descended.
            keys: list[str] = []
            for k, node in f.items():
                if not isinstance(node, h5py.Group):
                    continue
                if "embeddings" in node:
                    keys.append(k)
                else:
                    keys.extend(
                        f"{k}/{c}" for c, sub in node.items()
                        if isinstance(sub, h5py.Group) and "embeddings" in sub
                    )
            if max_frames:
                keys = [
                    k for k in keys if f[k]["embeddings"].shape[0] < max_frames
                ]
            self.keys = keys
        # file handles opened lazily (loader threads share them; h5py
        # serialises access internally, but the open itself needs a lock)
        self._rgb_file: h5py.File | None = None
        self._motion_file: h5py.File | None = None
        self._open_lock = threading.Lock()

    def __len__(self) -> int:
        return len(self.keys)

    def _files(self):
        if self._motion_file is None:
            with self._open_lock:
                if self._motion_file is None:
                    self._rgb_file = h5py.File(self.rgb_path, "r")
                    self._motion_file = h5py.File(self.motion_path, "r")
        return self._rgb_file, self._motion_file

    def __getitem__(self, idx: int) -> dict:
        rgb_f, motion_f = self._files()
        video_id = self.keys[idx]
        g = rgb_f[video_id]
        embeddings = g["embeddings"][:].astype(np.float32)
        labels = g["labels"][:].astype(np.float32)

        motion_id = video_id.split(".")[0]  # dataset.py:65
        if motion_id not in motion_f:
            # MN: nested rgb keys (trimmed_videos/<id>.mp4) pair with the
            # FLAT motion ids the exporter writes (basename keys,
            # inference_frame_diff.py:371)
            motion_id = motion_id.rsplit("/", 1)[-1]
        motion = motion_f[motion_id]["embeddings"][:].astype(np.float32)

        if self.num_frames:
            if embeddings.shape[0] > self.num_frames:
                embeddings = embeddings[
                    sparse_sample_indices(embeddings.shape[0], self.num_frames)
                ]
            if motion.shape[0] > self.num_frames:
                motion = motion[
                    sparse_sample_indices(motion.shape[0], self.num_frames)
                ]

        return {
            "video_id": video_id,
            "embeddings": embeddings,
            "motion_embeddings": motion,
            "labels": labels,
        }

    def close(self):
        for f in (self._rgb_file, self._motion_file):
            if f is not None:
                f.close()
        self._rgb_file = self._motion_file = None


def collate_pad(
    items: list[dict], bucket: int | None = None, max_seq_len: int | None = None
) -> dict:
    """Pad variable-length sequences + build validity masks (True = real).

    Matches collate_fn_pad (TFAM/data/dataset.py:76-112); ``bucket`` rounds
    the padded length up to shape-bucket boundaries for XLA.
    """
    lens_rgb = np.array([it["embeddings"].shape[0] for it in items])
    lens_mot = np.array([it["motion_embeddings"].shape[0] for it in items])
    t_rgb = _bucketed(int(lens_rgb.max()), bucket, max_seq_len)
    t_mot = _bucketed(int(lens_mot.max()), bucket, max_seq_len)
    # truncate anything beyond the cap (cap only active with max_seq_len)
    lens_rgb = np.minimum(lens_rgb, t_rgb)
    lens_mot = np.minimum(lens_mot, t_mot)

    rgb = np.stack([pad_to_batch(it["embeddings"][:t_rgb], t_rgb) for it in items])
    motion = np.stack(
        [pad_to_batch(it["motion_embeddings"][:t_mot], t_mot) for it in items]
    )
    labels = np.stack([it["labels"] for it in items])
    mask_rgb = np.arange(t_rgb)[None, :] < lens_rgb[:, None]
    mask_motion = np.arange(t_mot)[None, :] < lens_mot[:, None]
    return {
        "video_id": [it["video_id"] for it in items],
        "embeddings": rgb,
        "motion_embeddings": motion,
        "labels": labels,
        "mask_rgb": mask_rgb,
        "mask_motion": mask_motion,
    }
