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
from vimoclip_tpu.ops.batching import pad_to_batch
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


def load_class_names(class_file: str) -> dict[int, str]:
    """Class-name lookup for the stage-2/serving surfaces.

    The reference reads ``class_names_dir`` with ``header=None``
    (TFAM/train_and_eval.py:183) even though ak_action.csv HAS an
    ``id,name`` header — the header row just becomes a garbage
    ``'id' -> 'name'`` entry its string-keyed lookups never hit. With
    integer keys that row would crash instead, so this reads headerless
    and SKIPS rows whose id isn't an integer: both headered and headerless
    files parse to the same mapping."""
    df = pd.read_csv(class_file, header=None, names=["id", "name"])
    out: dict[int, str] = {}
    for _, r in df.iterrows():
        try:
            out[int(r["id"])] = str(r["name"])
        except (TypeError, ValueError):
            continue  # header row of a headered file
    return out


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
        dedup_threshold: float | None = None,
        mesh=None,
    ):
        """``dedup_threshold``: opt-in temporal-redundancy gating — frames
        whose mean absolute pixel delta to the previously EMBEDDED frame of
        the same video falls below the threshold (uint8 units, e.g. 1.0)
        reuse that frame's embedding instead of running the ViT. Dense video
        is highly redundant (cf. ResidualViT, arXiv:2509.13255), so this
        buys algorithmic speedup beyond the compute-bound ceiling; outputs
        deviate from exact per-frame embeddings, hence opt-in.

        ``mesh``: optional ``jax.sharding.Mesh`` — the packed frame batch is
        sharded over the ``data`` axis (params replicated), so one extractor
        drives a whole slice; XLA splits each forward across chips with no
        other code change. ``batch_size`` must divide by the data-axis size
        (the tail batch is already padded to ``batch_size``). None = the
        single-device path.
        """
        self.config = config
        self.batch_size = batch_size
        self.decode_workers = decode_workers
        self.frame_queue_blocks = frame_queue_blocks
        self.dedup_threshold = dedup_threshold
        dtype = jnp.bfloat16 if half_precision else jnp.float32
        encoder = ClipVisionEncoder(config, dtype=dtype)
        self._frame_sharding = None
        if mesh is not None:
            from vimoclip_tpu.parallel import batch_sharding, replicated_sharding

            if batch_size % mesh.shape["data"]:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by data axis "
                    f"{mesh.shape['data']}"
                )
            params = jax.device_put(params, replicated_sharding(mesh))
            self._frame_sharding = batch_sharding(mesh)
        self.params = params

        @jax.jit
        def embed(params, frames):
            pixels = clip_preprocess(frames, config.image_size, dtype=dtype)
            return encoder.apply({"params": params}, pixels).astype(jnp.float32)

        self._embed = embed

    def _to_device(self, stack: np.ndarray):
        if self._frame_sharding is not None:
            return jax.device_put(stack, self._frame_sharding)
        return jnp.asarray(stack)

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

    def _start_decoders(self, videos, blocks, errors) -> list[threading.Thread]:
        """Start the decode backend feeding ``blocks``.

        With the native plane built and opted in (VIMO_NATIVE_DECODE=1), the
        C++ corpus pool (data/native.py DecodePool, native/dataplane.cc)
        decodes videos concurrently with zero Python in the decode path; one
        pump thread drains its bounded queue into ``blocks``. Otherwise N
        Python threads run the per-video OpenCV/libav decoder (the GIL is
        released inside decode calls, so they still overlap device compute).
        Both backends emit the same per-video block stream: in-order frames,
        exactly one final block, errors surfaced via ``errors``.
        """
        from vimoclip_tpu.data.video_reader import _native_backend

        native = _native_backend()
        if native is not None and hasattr(native, "DecodePool"):
            def pump():
                # The consumer waits for exactly one final block per video;
                # ANY pump failure must still deliver them or extract()
                # blocks forever — hence the blanket except emitting
                # error-finals for every unfinished video (the same contract
                # the per-video try/except gives the thread backend).
                finals_sent: set[str] = set()
                try:
                    # Small native-side queue: the Python blocks queue
                    # (frame_queue_blocks) is the real buffer; stacking two
                    # full-size queues would double peak decoded-frame RAM.
                    with native.DecodePool(
                        workers=self.decode_workers,
                        chunk_frames=self.batch_size,
                        max_ready=4,
                    ) as pool:
                        for vid, path in videos:
                            pool.submit(vid, path)
                        pool.seal()
                        for vid, frames, final, error in pool:
                            if error is not None:
                                errors[vid] = error
                                finals_sent.add(vid)
                                blocks.put(_FrameBlock(
                                    vid, np.zeros((0, 1, 1, 3), np.uint8), True))
                                continue
                            if final:
                                finals_sent.add(vid)
                            blocks.put(_FrameBlock(vid, frames, final))
                except Exception as e:  # pool died: fail pending videos
                    for vid, _ in videos:
                        if vid not in finals_sent:
                            errors[vid] = f"native decode pool failed: {e}"
                            blocks.put(_FrameBlock(
                                vid, np.zeros((0, 1, 1, 3), np.uint8), True))

            t = threading.Thread(target=pump, daemon=True)
            t.start()
            return [t]

        jobs: queue.Queue = queue.Queue()
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
        return workers

    def extract(
        self,
        videos: list[tuple[str, str]],  # (video_id, path)
        on_video_done,  # callback(video_id, embeddings (T, D) | None)
        frame_shape: tuple[int, int] | None = None,
        frame_filter: dict[str, set] | None = None,
        on_video_chunk=None,  # callback(video_id, chunk (n, D)) — streaming
        on_video_abort=None,  # callback(video_id) — streamed video errored
        stream_rows: int = 2048,
        stream_ok: set[str] | None = None,
    ) -> dict[str, str]:
        """Run the pipeline; returns {video_id: error} for failed videos.

        ``frame_shape`` fixes (H, W); videos with other shapes are resized
        on host at decode time (rare — AK is uniformly 640x360).
        ``frame_filter`` optionally maps video_id -> allowed global frame
        indices; other frames are dropped BEFORE embedding (the reference
        subsamples before running CLIP, extract_embeddings.py:77-84 — at
        max_frames=50 on 450-frame clips this avoids embedding 89% of the
        frames).

        Streaming (``on_video_chunk``): once a video accumulates
        ``stream_rows`` embedded frames they are emitted as an in-order
        chunk and dropped from host memory, bounding RAM to O(stream_rows)
        per in-flight video like the reference MN extractor's resizable
        appends (extract_embeddings_mammalNet.py:114-141). A video that
        streamed >=1 chunk finishes with ``on_video_done(vid, None)`` after
        its remaining rows were emitted; ``on_video_abort`` fires instead if
        it errors mid-decode (partial data already handed out). ``stream_ok``
        restricts streaming to the given ids (callers needing the full array
        post-hoc — e.g. unknown-length subsampling — exclude those).
        Temporal dedup buffers whole videos (embeddings are re-expanded by
        the slot map at finish), so it disables streaming.
        """
        if self.dedup_threshold is not None:
            on_video_chunk = None  # dedup needs the whole-video slot expansion
        blocks: queue.Queue = queue.Queue(maxsize=self.frame_queue_blocks)
        errors: dict[str, str] = {}
        workers = self._start_decoders(videos, blocks, errors)

        import cv2

        pending: dict[str, list[np.ndarray]] = {}  # vid -> embedded frames
        positions: dict[str, int] = {}  # vid -> decoded-frame offset
        # temporal-dedup state: per-video slot map (frame -> embedded index)
        # and the last embedded frame (subsampled) for delta checks
        slots: dict[str, list[int]] = {}
        last_kept: dict[str, np.ndarray] = {}
        final_seen: set[str] = set()
        finished = 0
        # Per-resolution frame buffers: mixed-resolution corpora (MammalNet)
        # are preprocessed at NATIVE size like the reference (each resolution
        # gets its own compiled program via jit's shape cache) instead of
        # being host-resized through a second interpolation.
        buffers: dict[tuple, tuple[list, list]] = {}  # (H, W) -> (frames, owners)
        # One-deep device pipeline: flush() DISPATCHES the batch (JAX async)
        # and the result is fetched only when the next batch is already in
        # flight, so the device computes batch N while the host decodes and
        # packs batch N+1.
        import collections

        inflight: collections.deque = collections.deque()  # (dev_emb, owners, n)
        streamed_rows: dict[str, int] = {}  # vid -> rows already emitted

        def _can_stream(vid: str) -> bool:
            return on_video_chunk is not None and (
                stream_ok is None or vid in stream_ok
            )

        def drain_one() -> None:
            dev_emb, owners, n = inflight.popleft()
            emb = np.asarray(dev_emb)[:n]
            touched = []
            for vid, e in zip(owners, emb):
                if vid in errors:
                    continue  # failed mid-decode: drop dispatched frames
                pending.setdefault(vid, []).append(e)
                touched.append(vid)
            for vid in dict.fromkeys(touched):
                if _can_stream(vid) and len(pending[vid]) >= stream_rows:
                    rows = pending[vid]
                    pending[vid] = []
                    streamed_rows[vid] = streamed_rows.get(vid, 0) + len(rows)
                    on_video_chunk(vid, np.stack(rows))

        def flush(shape_key) -> None:
            """Dispatch one resolution's buffered frames as a fixed-size
            device batch (tail padded to keep the compiled shape)."""
            frames_l, owners = buffers.get(shape_key, ([], []))
            if not frames_l:
                return
            stack = np.stack(frames_l)
            n = stack.shape[0]
            stack = pad_to_batch(stack, self.batch_size)
            inflight.append(
                (self._embed(self.params, self._to_device(stack)), list(owners), n)
            )
            buffers[shape_key] = ([], [])
            while len(inflight) > 1:
                drain_one()

        def drop_errored(vid: str) -> None:
            """Release all state of a failed video (round-1 ADVICE leak:
            errored vids kept pending/slots/last_kept forever)."""
            pending.pop(vid, None)
            slots.pop(vid, None)
            last_kept.pop(vid, None)
            final_seen.discard(vid)
            if streamed_rows.pop(vid, None) is not None and on_video_abort:
                on_video_abort(vid)  # partial chunks were already handed out

        def finish_ready() -> None:
            """Complete every video whose frames are all embedded."""
            nonlocal finished
            in_buffer = {o for _, owners in buffers.values() for o in owners}
            in_buffer |= {o for _, owners, _ in inflight for o in owners}
            for vid in [v for v in final_seen if v not in in_buffer]:
                final_seen.discard(vid)
                if vid in errors:
                    drop_errored(vid)
                    continue
                if vid in streamed_rows:  # streaming path: flush remainder
                    rows = pending.pop(vid, [])
                    if rows:
                        streamed_rows[vid] += len(rows)
                        on_video_chunk(vid, np.stack(rows))
                    streamed_rows.pop(vid)
                    on_video_done(vid, None)
                    finished += 1
                    continue
                chunks = pending.pop(vid, [])
                emb = (
                    np.stack(chunks)
                    if chunks
                    else np.zeros((0, self.config.projection_dim), np.float32)
                )
                vid_slots = slots.pop(vid, None)
                last_kept.pop(vid, None)
                if vid_slots is not None and len(emb):
                    emb = emb[vid_slots]  # expand dedup reuse to full length
                on_video_done(vid, emb)
                finished += 1

        finals_received = 0
        while finals_received < len(videos):
            block = blocks.get()
            if block.final:
                finals_received += 1
            if block.video_id in errors:
                drop_errored(block.video_id)
                continue
            if block.frames.size:
                frames = block.frames
                offset = positions.get(block.video_id, 0)
                positions[block.video_id] = offset + len(frames)
                if frame_filter is not None and block.video_id in frame_filter:
                    allowed = frame_filter[block.video_id]
                    keep = [
                        i for i in range(len(frames)) if offset + i in allowed
                    ]
                    if not keep:
                        if block.final:
                            final_seen.add(block.video_id)
                            finish_ready()
                        continue
                    frames = frames[keep]
                if frame_shape is not None and frames.shape[1:3] != tuple(frame_shape):
                    frames = np.stack(
                        [cv2.resize(f, (frame_shape[1], frame_shape[0]))
                         for f in frames]
                    )
                if self.dedup_threshold is not None:
                    vid = block.video_id
                    vslots = slots.setdefault(vid, [])
                    n_emb = (vslots[-1] + 1) if vslots else 0
                    keep_idx = []
                    for j, f in enumerate(frames):
                        probe = f[::4, ::4].astype(np.int16)
                        prev = last_kept.get(vid)
                        if (prev is not None and prev.shape == probe.shape
                                and float(np.mean(np.abs(probe - prev)))
                                < self.dedup_threshold):
                            vslots.append(n_emb - 1)  # reuse previous embedding
                        else:
                            keep_idx.append(j)
                            vslots.append(n_emb)
                            n_emb += 1
                            last_kept[vid] = probe
                    if not keep_idx:
                        if block.final:
                            final_seen.add(block.video_id)
                            finish_ready()
                        continue
                    frames = frames[keep_idx]
                key = frames.shape[1:3]
                buf_frames, buf_owner = buffers.setdefault(key, ([], []))
                buf_frames.extend(frames)
                buf_owner.extend([block.video_id] * len(frames))
                while len(buf_frames) >= self.batch_size:
                    buffers[key] = (
                        buf_frames[: self.batch_size],
                        buf_owner[: self.batch_size],
                    )
                    keep_f = buf_frames[self.batch_size:]
                    keep_o = buf_owner[self.batch_size:]
                    flush(key)
                    buffers[key] = (keep_f, keep_o)
                    buf_frames, buf_owner = keep_f, keep_o
            if block.final:
                final_seen.add(block.video_id)
            finish_ready()
        for key in list(buffers):
            flush(key)
        while inflight:
            drain_one()
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
    dedup_threshold: float | None = None,
    stream_rows: int = 2048,
    mesh=None,
    half_precision: bool = True,
    num_shards: int = 1,
    shard_index: int = 0,
) -> dict[str, str]:
    """End-to-end extraction to the reference HDF5 layout — the public
    surface of extract_embeddings.py:23.

    ``num_shards``/``shard_index`` process a strided slice of the
    annotation list (corpus split across machines/jobs; each shard writes
    its own file — merge with ``cli/h5_merge.py``). The shard's
    ``video_ids`` index covers its own annotated ids, so merged shards
    reconstruct the reference's full index.
    """
    class_map = load_class_map(class_file)
    num_classes = len(class_map)
    annotations = load_annotations(annotation_file)
    if not 0 <= shard_index < num_shards:
        raise ValueError(f"shard_index {shard_index} not in [0, {num_shards})")
    if num_shards > 1:
        annotations = annotations[shard_index::num_shards]

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
    extractor = ClipExtractor(params, config, batch_size=batch_size,
                              dedup_threshold=dedup_threshold, mesh=mesh,
                              half_precision=half_precision)

    # Subsample BEFORE embedding when the container reports a frame count
    # (reference computes indices first, extract_embeddings.py:77-84);
    # videos with unknown counts fall back to post-hoc subsampling.
    frame_filter: dict[str, set] = {}
    container_total: dict[str, int] = {}
    if max_frames is not None:
        from concurrent.futures import ThreadPoolExecutor

        from vimoclip_tpu.data.video_reader import video_frame_count

        # Container opens are tiny but O(corpus): parallelize over the
        # decode-worker count instead of a serial main-thread scan (30k
        # videos x ~10 ms would idle the chip for minutes at startup).
        with ThreadPoolExecutor(
            max_workers=max(extractor.decode_workers, 1)
        ) as ex:
            totals = ex.map(video_frame_count, [p for _, p in videos])
            for (vid, _), total in zip(videos, totals):
                if total > 0:
                    container_total[vid] = total
                    if total > max_frames:
                        frame_filter[vid] = set(
                            uniform_indices(total, max_frames).tolist()
                        )

    # Streaming eligibility: a video may stream (bounded host RAM, MN-style
    # resizable appends) unless the post-hoc max_frames guard might need its
    # full embedding array. Only pre-filtered videos stream when max_frames
    # is set: a video whose container merely CLAIMS total <= max_frames
    # could decode more (CAP_PROP_FRAME_COUNT is metadata, not truth), and
    # the whole-video path keeps the `len(emb) > max_frames` backstop.
    # Pre-filtered videos are safe either way — the filter admits at most
    # max_frames indices regardless of how many frames actually decode.
    stream_ok: set[str] | None = None
    if max_frames is not None:
        stream_ok = set(frame_filter)

    def done(vid, emb):
        if emb is None:  # fully streamed: finalize labels + attrs
            writer.finalize_video(
                vid, labels=labels_by_vid[vid],
                original_frames=container_total.get(vid),
            )
            return
        if max_frames is not None and vid not in frame_filter and len(emb) > max_frames:
            total = container_total.get(vid, len(emb))
            emb = emb[uniform_indices(len(emb), max_frames)]
        else:
            total = container_total.get(vid, len(emb))
        writer.submit(vid, emb, labels_by_vid[vid], original_frames=total)

    errors = extractor.extract(
        videos, done, frame_filter=frame_filter or None,
        on_video_chunk=writer.submit_chunk,
        on_video_abort=writer.abort_video,
        stream_rows=stream_rows,
        stream_ok=stream_ok,
    )
    # AK index semantics: EVERY annotated id, including failed/missing
    # videos (extract_embeddings.py:118-119).
    writer.writer.set_video_ids([vid for vid, _ in annotations])
    writer.close()
    errors.update(skipped)
    return errors
