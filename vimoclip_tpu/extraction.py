"""Teacher-embedding extraction pipeline — the throughput-critical path.

Reference behavior (extract_embeddings.py, extract_embeddings_mammalNet.py):
decode each video, CLIP-preprocess each frame via PIL, run the frozen CLIP
ViT, write per-video HDF5 groups — fully serialized per video
(SURVEY.md §3.1). The TPU-native pipeline overlaps all four phases:

  decode workers (threads, OpenCV/libav)  ->  frame queue
  -> fixed-size uint8 batches -> device (prefetched, double-buffered)
  -> fused on-device preprocess + jit bf16 ViT forward (one static shape)
  -> async HDF5 writer thread (gzip off the hot path)

Frames from consecutive videos are packed into one fixed (batch, H, W, 3)
shape so XLA compiles exactly one program and the MXU never starves; a
scatter step on host reassembles per-video embedding arrays.
"""

from __future__ import annotations

import logging
import os
import queue
import threading
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from vimoclip_tpu.data.hdf5_schema import AsyncWriter, EmbeddingWriter
from vimoclip_tpu.data.video_reader import iter_video_chunks
from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
from vimoclip_tpu.ops.preprocess import clip_preprocess


def load_annotations(annotation_file: str) -> list[tuple[str, list[int]]]:
    """``<video_id> label1 label2 ...`` lines (extract_embeddings.py:46-47);
    also accepts the MN csv form ``trimmed_videos/<id>.mp4 label``."""
    out = []
    with open(annotation_file, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            out.append((parts[0], [int(x) for x in parts[1:]]))
    return out


def load_class_map(class_file: str) -> dict[int, str]:
    """``id,name`` csv with header (ak_action.csv layout,
    extract_embeddings.py:40-43)."""
    df = pd.read_csv(class_file)
    return {int(r["id"]): r["name"] for _, r in df.iterrows()}


def multi_hot(labels: list[int], num_classes: int) -> np.ndarray:
    mh = np.zeros(num_classes, dtype=np.float32)
    for l in labels:
        if 0 <= l < num_classes:
            mh[l] = 1.0
        else:
            logging.warning("label %d outside class map", l)
    return mh


def uniform_indices(total_frames: int, max_frames: int | None) -> np.ndarray:
    """Reference subsampling: step = T // max, first max indices
    (extract_embeddings.py:77-81)."""
    if max_frames is None or total_frames <= max_frames:
        return np.arange(total_frames)
    step = total_frames // max_frames
    return np.arange(0, total_frames, step)[:max_frames]


@dataclass
class _FrameBlock:
    video_id: str
    frames: np.ndarray  # (n, H, W, 3) uint8
    final: bool  # last block of this video


class ClipExtractor:
    """Batched CLIP embedding extractor over a video corpus."""

    def __init__(
        self,
        params: dict,
        config: ClipVisionConfig,
        batch_size: int = 256,
        half_precision: bool = True,
        decode_workers: int = 4,
        frame_queue_blocks: int = 32,
    ):
        self.config = config
        self.batch_size = batch_size
        self.decode_workers = decode_workers
        self.frame_queue_blocks = frame_queue_blocks
        dtype = jnp.bfloat16 if half_precision else jnp.float32
        encoder = ClipVisionEncoder(config, dtype=dtype)
        self.params = params

        @jax.jit
        def embed(params, frames):
            pixels = clip_preprocess(frames, config.image_size, dtype=dtype)
            return encoder.apply({"params": params}, pixels).astype(jnp.float32)

        self._embed = embed

    # ------------------------------------------------------------------
    def _decode_into(
        self,
        jobs: "queue.Queue[tuple[str, str] | None]",
        blocks: "queue.Queue[_FrameBlock | None]",
        errors: dict,
        chunk: int,
    ):
        while True:
            job = jobs.get()
            if job is None:
                return
            video_id, path = job
            try:
                last = None
                for frames in iter_video_chunks(path, chunk_size=chunk):
                    if last is not None:
                        blocks.put(_FrameBlock(video_id, last, final=False))
                    last = frames
                if last is None:
                    raise IOError("no frames decoded")
                blocks.put(_FrameBlock(video_id, last, final=True))
            except Exception as e:  # per-video fault tolerance
                # (extract_embeddings.py:113-115)
                errors[video_id] = str(e)
                blocks.put(_FrameBlock(video_id, np.zeros((0, 1, 1, 3), np.uint8), True))

    def extract(
        self,
        videos: list[tuple[str, str]],  # (video_id, path)
        on_video_done,  # callback(video_id, embeddings (T, D))
        frame_shape: tuple[int, int] | None = None,
    ) -> dict[str, str]:
        """Run the pipeline; returns {video_id: error} for failed videos.

        ``frame_shape`` fixes (H, W); videos with other shapes are resized
        on host at decode time (rare — AK is uniformly 640x360).
        """
        jobs: queue.Queue = queue.Queue()
        blocks: queue.Queue = queue.Queue(maxsize=self.frame_queue_blocks)
        errors: dict[str, str] = {}
        for v in videos:
            jobs.put(v)
        workers = []
        for _ in range(self.decode_workers):
            jobs.put(None)
            t = threading.Thread(
                target=self._decode_into,
                args=(jobs, blocks, errors, self.batch_size),
                daemon=True,
            )
            t.start()
            workers.append(t)

        import cv2

        pending: dict[str, list[np.ndarray]] = {}  # vid -> embedded frames
        final_seen: set[str] = set()
        finished = 0
        buf_frames: list[np.ndarray] = []
        buf_owner: list[str] = []
        shape = frame_shape

        def flush() -> None:
            """Embed the buffered frames as one fixed-size device batch
            (tail padded to keep the compiled shape) and scatter results."""
            nonlocal buf_frames, buf_owner
            if not buf_frames:
                return
            stack = np.stack(buf_frames)
            n = stack.shape[0]
            if n < self.batch_size:
                pad = np.zeros(
                    (self.batch_size - n,) + stack.shape[1:], dtype=stack.dtype
                )
                stack = np.concatenate([stack, pad])
            emb = np.asarray(self._embed(self.params, jnp.asarray(stack)))[:n]
            for vid, e in zip(buf_owner, emb):
                pending.setdefault(vid, []).append(e)
            buf_frames, buf_owner = [], []

        def finish_ready() -> None:
            """Complete every video whose frames are all embedded."""
            nonlocal finished
            in_buffer = set(buf_owner)
            for vid in [v for v in final_seen if v not in in_buffer]:
                final_seen.discard(vid)
                if vid in errors:
                    continue
                chunks = pending.pop(vid, [])
                emb = (
                    np.stack(chunks)
                    if chunks
                    else np.zeros((0, self.config.projection_dim), np.float32)
                )
                on_video_done(vid, emb)
                finished += 1

        finals_received = 0
        while finals_received < len(videos):
            block = blocks.get()
            if block.final:
                finals_received += 1
            if block.video_id in errors:
                pending.pop(block.video_id, None)
                continue
            if block.frames.size:
                frames = block.frames
                if shape is None:
                    shape = frames.shape[1:3]
                if frames.shape[1:3] != tuple(shape):
                    frames = np.stack(
                        [cv2.resize(f, (shape[1], shape[0])) for f in frames]
                    )
                buf_frames.extend(frames)
                buf_owner.extend([block.video_id] * len(frames))
            if block.final:
                final_seen.add(block.video_id)
            while len(buf_frames) >= self.batch_size:
                keep_f, keep_o = buf_frames[self.batch_size:], buf_owner[self.batch_size:]
                buf_frames, buf_owner = buf_frames[: self.batch_size], buf_owner[: self.batch_size]
                flush()
                buf_frames, buf_owner = keep_f, keep_o
            finish_ready()
        flush()
        finish_ready()
        for t in workers:
            t.join()
        return errors


def create_hdf5_dataset(
    data_root: str,
    annotation_file: str,
    class_file: str,
    output_hdf5: str,
    params: dict,
    config: ClipVisionConfig,
    max_frames: int | None = None,
    batch_size: int = 256,
    split: str = "val",
    dataset_name: str = "AnimalKingdom",
    clip_model_name: str = "ViT-B/16",
    compression: str | None = "gzip",
) -> dict[str, str]:
    """End-to-end extraction to the reference HDF5 layout — the public
    surface of extract_embeddings.py:23."""
    class_map = load_class_map(class_file)
    num_classes = len(class_map)
    annotations = load_annotations(annotation_file)

    videos, labels_by_vid, skipped = [], {}, {}
    for vid, labels in annotations:
        path = os.path.join(data_root, vid)
        if not os.path.exists(path):
            logging.warning("video not found: %s", path)
            skipped[vid] = "not found"
            continue
        videos.append((vid, path))
        labels_by_vid[vid] = multi_hot(labels, num_classes)

    os.makedirs(os.path.dirname(output_hdf5) or ".", exist_ok=True)
    writer = AsyncWriter(
        EmbeddingWriter(
            output_hdf5, num_classes=num_classes, dataset_name=dataset_name,
            split=split, clip_model=clip_model_name, compression=compression,
            embed_dim=config.projection_dim,
        )
    )
    extractor = ClipExtractor(params, config, batch_size=batch_size)

    total_by_vid = {}

    def done(vid, emb):
        if max_frames is not None:
            idx = uniform_indices(len(emb), max_frames)
            total = len(emb)
            emb = emb[idx]
        else:
            total = len(emb)
        writer.submit(vid, emb, labels_by_vid[vid], original_frames=total)

    errors = extractor.extract(videos, done)
    writer.close()
    errors.update(skipped)
    return errors
