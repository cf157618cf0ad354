r"""End-to-end serving: raw video in, action predictions out.

The reference has NO single-video inference path — producing a prediction
requires manually chaining three offline stages through HDF5 files
(SURVEY.md §1). For production deployment this module fuses the full
ViMoCLIP cascade into one in-process predictor:

  RGB video --> CLIP teacher ViT  --------------------\
      \--> frame-diff (on-device XLA op)               +--> TFAM fusion
           --> MoCLIP student ViT  -------------------/       --> sigmoid top-k

- every stage is a jit-compiled TPU program; frames cross the PCIe/ICI
  boundary once, as uint8;
- the motion modality defaults to the on-device frame-diff of the RGB frames
  (the fully in-repo path, SURVEY.md §7); precomputed flow videos can be
  passed instead;
- TFAM runs with the Pallas flash-attention kernel (deterministic serving);
- variable video lengths are bucketed so a handful of compiled programs
  serve any input.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vimoclip_tpu.config import TFAMModelConfig
from vimoclip_tpu.data.video_reader import read_video
from vimoclip_tpu.models import TFAM
from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
from vimoclip_tpu.ops.batching import embed_in_fixed_batches, round_up_bucket
from vimoclip_tpu.ops.preprocess import clip_preprocess, frame_diff


@dataclasses.dataclass
class Prediction:
    video_id: str
    top_classes: list[tuple[int, str, float]]  # (class_id, name, probability)
    probabilities: np.ndarray  # (num_classes,)


class ViMoCLIPPredictor:
    def __init__(
        self,
        teacher_params: dict,
        teacher_config: ClipVisionConfig,
        student_params: dict,
        student_config: ClipVisionConfig,
        tfam_params: dict,
        tfam_config: TFAMModelConfig | None = None,
        num_classes: int = 140,
        class_names: dict[int, str] | None = None,
        frame_batch: int = 128,
        length_bucket: int = 128,
        max_seq_len: int = 2048,
        half_precision: bool = True,
        batch_invariant: bool = True,
        mesh: jax.sharding.Mesh | None = None,
    ):
        self.num_classes = num_classes
        self.embed_dim = teacher_config.projection_dim
        self.class_names = class_names or {}
        self.frame_batch = frame_batch
        self.length_bucket = length_bucket
        self.max_seq_len = max_seq_len
        dtype = jnp.bfloat16 if half_precision else jnp.float32

        # Optional data-parallel serving (the extractor's mesh scheme,
        # extraction.py: params replicated, each fixed-shape frame batch
        # sharded over the mesh's `data` axis — one ViT forward spans the
        # mesh). The tiny fusion step runs replicated.
        self._frame_sharding = self._replicated = None
        if mesh is not None:
            from vimoclip_tpu.parallel import batch_sharding, replicated_sharding

            if frame_batch % mesh.shape["data"]:
                raise ValueError(
                    f"frame_batch {frame_batch} not divisible by data axis "
                    f"{mesh.shape['data']}"
                )
            self._frame_sharding = batch_sharding(mesh)
            self._replicated = replicated_sharding(mesh)
        tfam_config = tfam_config or TFAMModelConfig(attention_impl="flash")
        if batch_invariant and not tfam_config.masked_pooling:
            # Serving predictions must not depend on what a video happens to
            # be co-batched with. The reference's unmasked pooling
            # (AMO_CLIP.py:170, TFAMModelConfig.masked_pooling=False) pools
            # every row over the BATCH-max length, so in predict_videos a
            # short clip's mean would include padded-garbage positions up to
            # the longest co-batched clip. Masked pooling is bit-identical
            # at batch size 1 (both reduce to mean over the clip's own real
            # length — single-video predictions are unchanged) and makes
            # pooled == serial for every batch composition.
            # batch_invariant=False restores strict quirk parity (exposed
            # as `vimo-predict --quirk-batch-pooling`).
            import logging

            logging.getLogger(__name__).info(
                "serving: masked pooling enabled for batch-invariant "
                "predictions (batch_invariant=False restores the "
                "reference's batch-max pooling)"
            )
            tfam_config = dataclasses.replace(tfam_config, masked_pooling=True)

        teacher = ClipVisionEncoder(teacher_config, dtype=dtype)
        student = ClipVisionEncoder(student_config, dtype=dtype)
        # exporters feed TFAM the raw student tower output (inference.py:106)
        student_tower = student_params.get("visual_encoder", student_params)
        tfam = TFAM(config=tfam_config, num_classes=num_classes, dtype=dtype)

        # Params are jit ARGUMENTS, not closure constants: closing over them
        # would bake hundreds of MB of weights into every compiled program
        # (bloated executables; on remote-compile rigs the upload is
        # rejected outright). Device-resident once, passed by reference.
        def _make_embed(enc, params, image_size):
            params = jax.device_put(params, self._replicated)

            @jax.jit
            def embed(params, frames):  # (N, H, W, 3) uint8, N == frame_batch
                pixels = clip_preprocess(frames, image_size, dtype=dtype)
                return enc.apply({"params": params}, pixels).astype(jnp.float32)

            if self._frame_sharding is not None:
                return lambda frames: embed(
                    params, jax.device_put(frames, self._frame_sharding)
                )
            return lambda frames: embed(params, frames)

        self._teacher_embed = _make_embed(
            teacher, teacher_params, teacher_config.image_size
        )
        self._student_embed = _make_embed(
            student, student_tower, student_config.image_size
        )

        tfam_params = jax.device_put(tfam_params, self._replicated)

        @jax.jit
        def fuse(params, rgb_emb, motion_emb, mask_rgb, mask_motion):
            logits = tfam.apply(
                {"params": params}, rgb_emb, motion_emb,
                mask_rgb, mask_motion, deterministic=True,
            )
            return jax.nn.sigmoid(logits)

        if self._replicated is not None:
            self._fuse = lambda *a: fuse(
                tfam_params, *(jax.device_put(x, self._replicated) for x in a)
            )
        else:
            self._fuse = lambda *a: fuse(tfam_params, *a)

    # ------------------------------------------------------------------
    def _embed_frames(self, embed_fn, frames) -> np.ndarray:
        """Batch arbitrary-length frame stacks through a fixed-shape program
        (host numpy or device arrays; device inputs never bounce through
        the host — see ops.batching)."""
        return embed_in_fixed_batches(
            embed_fn, frames, self.frame_batch, self.embed_dim
        )

    def _embed_window_device(self, embed_fn, frames_dev):
        """One <= frame_batch window through a fixed-shape embed program,
        WITHOUT fetching: returns (device embeddings, valid rows)."""
        n = frames_dev.shape[0]
        if n < self.frame_batch:
            frames_dev = jnp.pad(
                frames_dev,
                ((0, self.frame_batch - n),) + ((0, 0),) * (frames_dev.ndim - 1),
            )
        return embed_fn(frames_dev), n

    def embed_video(self, frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(T, H, W, 3) uint8 -> (rgb_emb (T, D), motion_emb (T-1, D)).

        Streams ``frame_batch``-frame windows (one frame of overlap so the
        on-device frame-diff covers window boundaries): every raw frame
        crosses host->device ONCE — round-tripping the diff frames through
        the host would triple the interconnect traffic for the dominant
        payload — and device residency stays bounded by two windows
        (~180 MB at 128 x 360x640) no matter how long the video is.

        One-deep pipeline (round 4, VERDICT r3 #4): window ``i+1``'s upload
        and forwards are dispatched BEFORE window ``i``'s embeddings are
        fetched, so the dominant host->device frame transfer overlaps the
        ViT compute (the extractor's scheme, docs/PERF.md ledger #8).
        Outputs are bit-identical to the serial order — same fixed-shape
        programs over the same windows, only the fetch point moves.
        """
        bs = self.frame_batch
        t = frames.shape[0]
        rgb_out: list[np.ndarray] = []
        mot_out: list[np.ndarray] = []
        pending = None  # (rgb_dev, rgb_n, mot_dev | None, mot_n)

        def flush(p):
            rgb_dev, rn, mot_dev, mn = p
            rgb_out.append(np.asarray(rgb_dev)[:rn])
            if mot_dev is not None:
                mot_out.append(np.asarray(mot_dev)[:mn])

        for i in range(0, t, bs):
            window = jnp.asarray(frames[i : i + bs + 1])  # the one upload
            m = window.shape[0]
            rgb_dev, rn = self._embed_window_device(
                self._teacher_embed, window[: min(bs, m)]
            )
            mot_dev = mot_n = None
            if m >= 2:
                # (m-1) diffs, computed and consumed on device
                mot_dev, mot_n = self._embed_window_device(
                    self._student_embed, frame_diff(window)
                )
            if pending is not None:
                flush(pending)
            pending = (rgb_dev, rn, mot_dev, mot_n)
        if pending is not None:
            flush(pending)
        empty = np.zeros((0, self.embed_dim), np.float32)
        rgb_emb = np.concatenate(rgb_out) if rgb_out else empty
        motion_emb = np.concatenate(mot_out) if mot_out else empty
        return rgb_emb, motion_emb

    def predict_embeddings(
        self,
        rgb_emb: np.ndarray,
        motion_emb: np.ndarray,
        video_id: str = "",
        top_k: int = 5,
    ) -> Prediction:
        t_r = round_up_bucket(len(rgb_emb), self.length_bucket, self.max_seq_len)
        t_m = round_up_bucket(len(motion_emb), self.length_bucket, self.max_seq_len)
        rgb = np.zeros((1, t_r, rgb_emb.shape[1]), np.float32)
        mot = np.zeros((1, t_m, motion_emb.shape[1]), np.float32)
        rgb[0, : len(rgb_emb)] = rgb_emb[:t_r]
        mot[0, : len(motion_emb)] = motion_emb[:t_m]
        mask_r = np.arange(t_r)[None, :] < min(len(rgb_emb), t_r)
        mask_m = np.arange(t_m)[None, :] < min(len(motion_emb), t_m)
        probs = np.asarray(
            self._fuse(jnp.asarray(rgb), jnp.asarray(mot),
                       jnp.asarray(mask_r), jnp.asarray(mask_m))
        )[0]
        order = np.argsort(probs)[::-1][:top_k]
        top = [
            (int(c), self.class_names.get(int(c), f"class_{c}"), float(probs[c]))
            for c in order
        ]
        return Prediction(video_id=video_id, top_classes=top, probabilities=probs)

    def predict(
        self,
        video_path: str,
        motion_video_path: str | None = None,
        top_k: int = 5,
        max_frames: int | None = None,
    ) -> Prediction:
        """Full cascade on one video file."""
        frames = read_video(video_path, max_frames=max_frames)
        if motion_video_path is None:
            if len(frames) < 2:
                raise ValueError(
                    f"{video_path}: {len(frames)} frame(s) decoded — the "
                    "fused cascade needs >= 2 (motion = consecutive-frame "
                    "diffs); raise max_frames or supply motion_video_path"
                )
            rgb_emb, motion_emb = self.embed_video(frames)
        else:
            rgb_emb = self._embed_frames(self._teacher_embed, frames)
            motion = read_video(motion_video_path, max_frames=max_frames)
            motion_emb = self._embed_frames(self._student_embed, motion)
        return self.predict_embeddings(rgb_emb, motion_emb, video_path, top_k)

    def _embed_videos_pooled(
        self, videos: list[np.ndarray]
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Embed several videos through SHARED fixed-shape frame batches.

        Clips of one resolution are concatenated along time and streamed
        through ``embed_video`` as a single pooled stack, so only the pool's
        tail batch pays padding — not every video's (the extractor's
        pack-across-video-boundaries scheme, extraction.py buffers/owners).
        ``embed_video`` on the pool yields per-frame RGB embeddings plus the
        diff embedding of every consecutive pooled pair; per-video arrays
        are direct slices, dropping the one cross-clip boundary diff between
        consecutive videos (V-1 wasted diff embeddings per group — noise
        next to the per-video tail padding it removes). Each frame's
        embedding is independent of its batch neighbours, so results match
        the per-video path exactly."""
        out: list[tuple[np.ndarray, np.ndarray] | None] = [None] * len(videos)
        groups: dict[tuple, list[int]] = {}
        for i, frames in enumerate(videos):
            groups.setdefault(tuple(frames.shape[1:3]), []).append(i)
        for idxs in groups.values():
            stacks = [videos[i] for i in idxs]
            # device-resident inputs concatenate on their own device (the
            # whole point of pooling is to avoid host round-trips)
            cat = np if isinstance(stacks[0], np.ndarray) else jnp
            pooled = cat.concatenate(stacks)
            rgb_all, diff_all = self.embed_video(pooled)
            ofs = 0
            for i in idxs:
                n = len(videos[i])
                mot = diff_all[ofs : ofs + max(n - 1, 0)]
                out[i] = (rgb_all[ofs : ofs + n], mot)
                ofs += n
        return out  # type: ignore[return-value]

    def predict_batch(
        self,
        video_paths: list[str],
        top_k: int = 5,
        max_frames: int | None = None,
    ) -> list[Prediction]:
        """Serve a batch of video files: frames of all clips share the
        embedding batches (pooled per resolution, one tail pad per group),
        and the fusion step runs once over the padded batch."""
        videos = [read_video(p, max_frames=max_frames) for p in video_paths]
        return self.predict_videos(videos, video_paths, top_k=top_k)

    def predict_videos(
        self,
        videos: list[np.ndarray],
        video_ids: list[str] | None = None,
        top_k: int = 5,
    ) -> list[Prediction]:
        """The decoded-frames entry of :meth:`predict_batch` — in-memory
        (T, H, W, 3) uint8 stacks (host numpy or device arrays) through the
        pooled embedding path plus one batched fusion call."""
        video_ids = video_ids or [f"video_{i}" for i in range(len(videos))]
        for vid, frames in zip(video_ids, videos):
            if len(frames) < 2:
                raise ValueError(
                    f"{vid}: {len(frames)} frame(s) — the fused cascade "
                    "needs >= 2 (motion = consecutive-frame diffs)"
                )
        embs = self._embed_videos_pooled(videos)

        t_r = round_up_bucket(max(len(r) for r, _ in embs),
                              self.length_bucket, self.max_seq_len)
        t_m = round_up_bucket(max(len(m) for _, m in embs),
                              self.length_bucket, self.max_seq_len)
        b = len(embs)
        d = embs[0][0].shape[1]
        rgb = np.zeros((b, t_r, d), np.float32)
        mot = np.zeros((b, t_m, d), np.float32)
        mask_r = np.zeros((b, t_r), bool)
        mask_m = np.zeros((b, t_m), bool)
        for i, (r, m) in enumerate(embs):
            nr, nm = min(len(r), t_r), min(len(m), t_m)
            rgb[i, :nr], mot[i, :nm] = r[:nr], m[:nm]
            mask_r[i, :nr] = mask_m[i, :nm] = True
        probs = np.asarray(
            self._fuse(jnp.asarray(rgb), jnp.asarray(mot),
                       jnp.asarray(mask_r), jnp.asarray(mask_m))
        )
        out = []
        for i, vid in enumerate(video_ids):
            order = np.argsort(probs[i])[::-1][:top_k]
            top = [(int(c), self.class_names.get(int(c), f"class_{c}"),
                    float(probs[i, c])) for c in order]
            out.append(Prediction(video_id=vid, top_classes=top,
                                  probabilities=probs[i]))
        return out
