"""Motion-embedding export: run the trained student over motion videos and
write per-video (T, D) embedding HDF5 — the bridge from stage 1 to stage 2.

Reference parity:
- writes the RAW student embeddings (first tuple element, NOT the distill
  branch: inference.py:106, inference_frame_diff.py:275);
- groups keyed by video basename without extension (inference.py:99);
- streaming chunked decode with bounded memory, resizable lzf/gzip datasets,
  flush-per-chunk durability (inference_frame_diff.py:183-312);
- resume: existing groups skipped (:253-256,374-376); per-video errors and
  low-RAM skips persisted as group attrs and the run continues (:391-407);
- RAM watchdog (:32-69) — host memory check between chunks.

TPU-native: frames cross to the device as uint8 and the
preprocess+ViT forward is one jit program; chunk size is fixed so XLA
compiles exactly one shape (tail chunks padded, pad rows dropped on host).
"""

from __future__ import annotations

import glob
import logging
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from vimoclip_tpu.data.video_reader import iter_video_chunks
from vimoclip_tpu.ops.batching import pad_to_batch
from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
from vimoclip_tpu.ops.preprocess import clip_preprocess


class LowMemoryError(RuntimeError):
    """Raised when free host RAM drops below the floor
    (inference_frame_diff.py:32-38)."""


def free_ram_gb() -> float:
    try:
        import psutil

        return psutil.virtual_memory().available / 1e9
    except Exception:
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemAvailable"):
                        return int(line.split()[1]) / 1e6
        except Exception:
            pass
    return float("inf")


def memory_guard(min_free_gb: float) -> None:
    free = free_ram_gb()
    if free < min_free_gb:
        raise LowMemoryError(f"free RAM {free:.1f} GB < floor {min_free_gb} GB")


def find_motion_videos(videos_dir: str, extensions=(".mp4", ".avi", ".mkv")) -> list[str]:
    """Glob the motion-video corpus RECURSIVELY (the reference does too,
    inference_frame_diff.py:84-86 ``**/*.*`` — MammalNet corpora nest under
    ``trimmed_videos/``; flat AK layouts are unaffected)."""
    paths: list[str] = []
    for ext in extensions:
        paths.extend(
            glob.glob(os.path.join(videos_dir, "**", f"*{ext}"),
                      recursive=True)
        )
    return sorted(paths)


class MotionEmbeddingExporter:
    def __init__(
        self,
        student_params: dict,
        vision_config: ClipVisionConfig,
        chunk_size: int = 128,
        half_precision: bool = True,
        compression: str | None = "lzf",
        min_free_gb: float = 2.0,
    ):
        self.vision_config = vision_config
        self.chunk_size = chunk_size
        self.compression = compression
        self.min_free_gb = min_free_gb
        dtype = jnp.bfloat16 if half_precision else jnp.float32
        encoder = ClipVisionEncoder(vision_config, dtype=dtype)
        # The exporter needs only the visual tower (raw embeddings branch).
        # Params are a jit ARGUMENT, not a closure constant — closing over
        # them would bake ~350 MB of weights into the compiled program
        # (extraction.py and serving.py follow the same rule).
        params = jax.device_put(
            student_params.get("visual_encoder", student_params)
        )

        @jax.jit
        def embed(params, frames):
            pixels = clip_preprocess(frames, vision_config.image_size, dtype=dtype)
            return encoder.apply({"params": params}, pixels).astype(jnp.float32)

        self._embed = lambda frames: embed(params, frames)

    def _embed_chunk(self, frames: np.ndarray) -> np.ndarray:
        n = frames.shape[0]
        # pad the tail chunk so XLA keeps one compiled shape
        frames = pad_to_batch(frames, self.chunk_size)
        return np.asarray(self._embed(jnp.asarray(frames)))[:n]

    def export(
        self,
        video_paths: list[str],
        output_h5: str,
        overwrite: bool = False,
        resize_to: tuple[int, int] | None = None,
    ) -> dict[str, int]:
        """Returns {"processed": n, "skipped": n, "errors": n}
        (the final counts report, inference_frame_diff.py:412)."""
        mode = "w" if overwrite else "a"
        counts = {"processed": 0, "skipped": 0, "errors": 0}
        # Groups are keyed by extension-stripped BASENAME (the reference's
        # key scheme, consumed by the TFAM dataset's stem matching) while
        # find_motion_videos globs recursively — so a/clip.mp4 and
        # b/clip.mp4 would silently collide: the second would read as a
        # resume skip and never be exported. Fail up front instead.
        stems: dict[str, str] = {}
        for path in video_paths:
            stem = os.path.splitext(os.path.basename(path))[0]
            if stem in stems and stems[stem] != path:
                raise ValueError(
                    f"duplicate video id {stem!r}: {stems[stem]} and {path} "
                    "would overwrite each other in the HDF5 (groups are "
                    "keyed by basename stem, the reference scheme) — "
                    "rename one or export the subdirectories separately"
                )
            stems[stem] = path
        with h5py.File(output_h5, mode) as h5f:
            for path in video_paths:
                video_id = os.path.splitext(os.path.basename(path))[0]
                if video_id in h5f:
                    g = h5f[video_id]
                    # A group is trusted on resume if it says complete=True,
                    # OR if it carries total_frames but no 'complete' attr at
                    # all — that is a finalized group from the reference
                    # pipeline (inference_frame_diff.py writes total_frames,
                    # never 'complete'). Our own crash-truncated groups have
                    # complete=False (stamped before the first chunk) or, in
                    # the SIGKILL-between-create-and-stamp window, neither
                    # attr — both retried (round-1 ADVICE finding).
                    finalized = g.attrs.get(
                        "complete", "total_frames" in g.attrs
                    )
                    if "embeddings" in g and finalized:
                        counts["skipped"] += 1
                        continue
                    del h5f[video_id]  # retry incomplete/failed groups
                try:
                    self._export_one(h5f, video_id, path, resize_to)
                    counts["processed"] += 1
                except LowMemoryError as e:
                    g = h5f.require_group(video_id)
                    g.attrs["skipped_low_ram"] = str(e)
                    g.attrs["complete"] = False
                    counts["errors"] += 1
                    logging.warning("[%s] low RAM: %s", video_id, e)
                except Exception as e:
                    g = h5f.require_group(video_id)
                    g.attrs["error"] = str(e)
                    g.attrs["complete"] = False
                    counts["errors"] += 1
                    logging.warning("[%s] failed: %s", video_id, e)
        logging.info(
            "export done: %d processed, %d skipped (resume), %d errors",
            counts["processed"], counts["skipped"], counts["errors"],
        )
        return counts

    def _export_one(self, h5f, video_id, path, resize_to) -> None:
        import cv2

        group = h5f.create_group(video_id)
        # Durability marker BEFORE any data: a crash mid-write (even SIGKILL,
        # where no exception handler runs) leaves complete=False and the
        # group is retried on resume instead of skipped with partial data.
        group.attrs["complete"] = False
        h5f.flush()
        dset = None
        total = 0
        for frames in iter_video_chunks(path, chunk_size=self.chunk_size):
            memory_guard(self.min_free_gb)
            if resize_to is not None and frames.shape[1:3] != resize_to:
                frames = np.stack(
                    [cv2.resize(f, (resize_to[1], resize_to[0])) for f in frames]
                )
            emb = self._embed_chunk(frames)
            if dset is None:
                dset = group.create_dataset(
                    "embeddings",
                    shape=(0, emb.shape[1]),
                    maxshape=(None, emb.shape[1]),
                    chunks=(max(1, min(self.chunk_size, 1024)), emb.shape[1]),
                    dtype="float32",
                    compression=self.compression,
                )
            dset.resize((total + emb.shape[0], emb.shape[1]))
            dset[total:] = emb
            total += emb.shape[0]
            h5f.flush()
        if dset is None:
            raise IOError("no frames decoded")
        group.attrs["total_frames"] = total
        group.attrs["complete"] = True
