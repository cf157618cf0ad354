"""Benchmark: the three hot paths of the pipeline on one chip, in one JSON line.

1. **Extraction** (headline metric): CLIP ViT-B/16 frame embedding — the
   reference pipeline's throughput-critical path (extract_embeddings.py hot
   loop, SURVEY.md §3.1). On-device fused preprocess + batched jit bf16
   forward, vs a reference-style baseline measured on the same machine
   (serial per-frame PIL preprocessing + device forward).
2. **TFAM train step** (stage 2): full-size fusion model (d=512, 8 heads,
   4 layers, cross-attention), b8 x t512, loss+grads+AdamW.
3. **Student train step** (stage 1): ViT-B/32 distillation, b2 x 29 frames
   @ 360x640 uint8, cosine distill + pos-weighted BCE + Adam.
4. **Serving**: warm single-video latency (450 frames @ 360x640, host
   frames in -> prediction out) and pooled-vs-serial multi-video
   throughput through ViMoCLIPPredictor.
5. **tpu_test**: runs the hardware-only Pallas suite (on-chip PRNG dropout
   statistics) in a subprocess and records pass/fail, so every BENCH_r*.json
   doubles as the TPUTEST artifact.

Timing methodology (tunnel-proof, CLAUDE.md): on this rig the TPU is reached
through a tunnel where ``block_until_ready`` does not block and large
fetches run at ~17 MB/s, so naive timing is wrong in both directions. Every
bench keeps inputs device-resident, runs ITERS iterations inside ONE jit
call via ``lax.scan``, reduces to a scalar, and fetches that scalar
(best-of-3). Train steps carry (params, opt_state) through the scan, so no
iteration can be hoisted; the forward-only bench perturbs one pixel per
step for the same reason.

MFU is reported against this chip's MEASURED bf16 matmul ceiling
(~193 TFLOP/s, long-chained 4096^3 — see the constant below) with true
FLOPs (2 FLOPs/MAC, matmul terms only) — an honest utilization figure for
this exact part (datasheet peak ~197).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N,
   "detail": {..., "tfam_train_step": {...}, "student_train_step": {...}}}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Chained 4096^3 bf16 matmuls on this chip, asymptotic rate over long scans
# (512/1024 iters/fetch two-point fit; ~28 ms/call tunnel dispatch+fetch
# overhead subtracted by the fit). The earlier "105" figure came from short
# chains that bundled that per-call overhead into the rate; the iteration
# sweep (docs/PERF.md, round 3) shows 34/89/147/179/186 TFLOP/s at
# 8/32/128/512/1024 iters -> ~193 asymptote (datasheet bf16 peak ~197).
MEASURED_CEILING_TFLOPS = 193.0
VIT_B16_GFLOP_PER_FRAME = 35.0  # true FLOPs fwd @ 224^2 (2 FLOPs/MAC)

# The three bench recipes, defined ONCE: tools/profile_step.py (trace
# attribution) and tools/bench_quant.py import these so the profiled /
# A/B'd program can never drift from the benchmarked one (review r3).
EXTRACTION_RECIPE = dict(batch=128, iters=32)
TFAM_RECIPE = dict(b=8, t=512, d=512, layers=4, ff=2048, classes=140, iters=32)
STUDENT_RECIPE = dict(b=8, t=29, h=360, w=640, classes=140, iters=16)


def _make_frames(n: int, h=360, w=640, seed=0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    low = rng.integers(0, 256, (n, h // 24, w // 32, 3), dtype=np.uint8)
    import cv2

    return np.stack(
        [cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR) for f in low]
    )


def _best_of(fn, n=3) -> float:
    """Best wall time of n scalar-fetch calls (first call must be warm)."""
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def make_extraction_timed(encoder, image_size: int, iters: int):
    """The anti-hoist scan harness for extraction-style forwards, defined
    ONCE (review r3 ADVICE #4): bench.py's arms AND tools/bench_quant.py /
    tools/bench_tome.py build their timed programs here, so an A/B tool can
    never drift from the benchmarked methodology.

    The body must depend on the iteration index — with identical inputs
    every step XLA hoists the whole forward out of the scan and the
    "benchmark" measures one batch (observed: impossible 29k frames/s).
    Perturbing one pixel per step defeats the hoisting at one input-copy
    per iteration (~0.2 ms). (Scanning over a stack of distinct batches
    would be cleaner, but this rig's remote-compile service rejects
    programs that large with HTTP 413.)
    """
    import jax
    import jax.numpy as jnp

    from vimoclip_tpu.ops.preprocess import clip_preprocess

    @jax.jit
    def timed(params, raw):
        def body(carry, i):
            pixels = clip_preprocess(
                raw.at[0, 0, 0, 0].set(i), image_size, dtype=jnp.bfloat16
            )
            emb = encoder.apply({"params": params}, pixels)
            return carry + jnp.sum(emb.astype(jnp.float32)), None

        total, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(iters, dtype=jnp.uint8)
        )
        return total

    return timed


def _transformer_flops(t: int, d: int, ff: int, layers: int, cross: bool) -> float:
    """True matmul FLOPs of one forward over a t-token sequence (per batch
    element): q/k/v/out projections, attention score+value matmuls, FFN."""
    proj = 4 * 2 * t * d * d  # q, k, v, out
    attn = 2 * 2 * t * t * d  # scores + values
    ffn = 2 * 2 * t * d * ff
    per_layer = proj + attn + ffn
    if cross:
        per_layer += proj + attn
    return layers * per_layer


def bench_extraction(jax, jnp):
    from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
    from vimoclip_tpu.ops.preprocess import clip_preprocess

    cfg = ClipVisionConfig.vit_b_16()  # AK teacher (extract_embeddings.py:17)
    enc = ClipVisionEncoder(cfg, dtype=jnp.bfloat16)

    # 32 iters/fetch: a jit call through the tunnel costs ~20-28 ms of
    # dispatch+fetch regardless of body; at 8 iters that inflated the
    # 43.5 ms step by ~8% (round-3 methodology fix, docs/PERF.md)
    batch, iters = EXTRACTION_RECIPE["batch"], EXTRACTION_RECIPE["iters"]
    frames = _make_frames(batch)
    params = enc.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )["params"]

    # Data enters as jit ARGUMENTS everywhere in this file — closed-over
    # arrays become program constants, and at these sizes (hundreds of MB
    # of frames) that bloats executables and trips remote-compile upload
    # limits (HTTP 413 observed at ~300 MB on this rig). The anti-hoist
    # scan harness is the module-level make_extraction_timed, shared with
    # tools/bench_quant.py and tools/bench_tome.py.
    timed = make_extraction_timed(enc, cfg.image_size, iters)
    dev_frames = jax.device_put(jnp.asarray(frames))
    float(timed(params, dev_frames))  # compile + warm
    best = _best_of(lambda: float(timed(params, dev_frames)))
    tpu_fps = batch * iters / best

    # Opt-in "turbo" arm: ToMe token merging r=16 (ops/tome.py) + dynamic
    # int8 matmuls (ops/quant.py) — the `--token-merge 16 --quantize int8`
    # extraction config, same frames, same params (identical tree).
    # Measured 1.55x the parity path at embedding cosine 0.984+ (docs/
    # PERF.md ledger 15/16). Fault-tolerant: the headline stays the bf16
    # parity path either way.
    try:
        import dataclasses

        qenc = ClipVisionEncoder(
            dataclasses.replace(cfg, matmul_quant="int8", token_merge_r=16),
            dtype=jnp.bfloat16,
        )
        timed_q = make_extraction_timed(qenc, cfg.image_size, iters)
        float(timed_q(params, dev_frames))
        turbo_fps = batch * iters / _best_of(
            lambda: float(timed_q(params, dev_frames))
        )
    except Exception as e:  # pragma: no cover - device-dependent
        turbo_fps = None
        turbo_err = str(e)[:200]

    # Reference-style baseline on the same machine: serial per-frame PIL
    # preprocessing (the reference's hot-loop structure) + device forward.
    n_base = 64
    try:
        from transformers import CLIPImageProcessor

        proc = CLIPImageProcessor(crop_size=224, size={"shortest_edge": 224})

        @jax.jit
        def fwd_sum(p, x):
            return jnp.sum(enc.apply({"params": p}, x).astype(jnp.float32))

        warm = jnp.zeros((n_base, 224, 224, 3), jnp.float32)
        float(fwd_sum(params, warm))

        def one_baseline_round() -> float:
            t0 = time.perf_counter()
            pixels = proc(images=list(frames[:n_base]), return_tensors="np")[
                "pixel_values"
            ].transpose(0, 2, 3, 1)
            float(fwd_sum(params, jnp.asarray(pixels)))
            return time.perf_counter() - t0

        # best-of-3 like every other number here — a single PIL pass on the
        # shared 1-core host is noisy and it sits in the headline's
        # denominator (vs_baseline)
        ref_fps = n_base / min(one_baseline_round() for _ in range(3))
    except Exception:
        ref_fps = float("nan")

    tflops = tpu_fps * VIT_B16_GFLOP_PER_FRAME / 1e3
    out = {
        "fps": tpu_fps,
        "ref_fps": ref_fps,
        "batch": batch,
        "iters": iters,
        "tflops_per_sec": tflops,
        "mfu_vs_measured_ceiling": tflops / MEASURED_CEILING_TFLOPS,
    }
    if turbo_fps is not None:
        out["turbo_fps"] = turbo_fps
        out["turbo_speedup"] = turbo_fps / tpu_fps
    else:
        out["turbo_error"] = turbo_err
    return out


def bench_tfam_train(jax, jnp):
    import optax

    from vimoclip_tpu import losses
    from vimoclip_tpu.config import TFAMModelConfig
    from vimoclip_tpu.models import TFAM

    r = TFAM_RECIPE
    b, t, d, layers, ff, classes = (
        r["b"], r["t"], r["d"], r["layers"], r["ff"], r["classes"]
    )
    # 32 iterations per fetch + best-of-5: BENCH_r02's 8-iter best-of-3
    # showed ~8% run-to-run spread on this section (VERDICT r2 weak #1);
    # the longer scan amortizes dispatch/fetch jitter to <2%.
    iters = r["iters"]
    # attention_impl="auto" = the shipped single-chip default: on TPU this
    # resolves to the Pallas kernel with FUSED on-chip-PRNG attention
    # dropout (measured 9.65 ms/step vs 10.92 XLA at this recipe,
    # docs/PERF.md crossover table).
    model = TFAM(
        config=TFAMModelConfig(d_model=d, nhead=8, num_layers=layers,
                               dim_feedforward=ff, attention_impl="auto"),
        num_classes=classes, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    motion = jnp.asarray(rng.normal(size=(b, t - 1, d)).astype(np.float32))
    mr, mf = jnp.ones((b, t), bool), jnp.ones((b, t - 1), bool)
    labels = jnp.asarray((rng.random((b, classes)) < 0.05).astype(np.float32))
    params = model.init(jax.random.key(0), rgb, motion, mr, mf)["params"]
    tx = optax.adamw(1e-4, weight_decay=0.1)
    opt = tx.init(params)

    @jax.jit
    def timed(params, opt, key, rgb, motion, mr, mf, labels):
        def body(carry, i):
            p, o = carry

            def loss_fn(p):
                logits = model.apply(
                    {"params": p}, rgb, motion, mr, mf,
                    deterministic=False,
                    rngs={"dropout": jax.random.fold_in(key, i)},
                )
                return losses.bce_with_logits(logits, labels)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (_, _), ls = jax.lax.scan(body, (params, opt), jnp.arange(iters))
        return jnp.sum(ls)

    # rbg = the trainers' default dropout PRNG (TrainingConfig
    # .dropout_rng_impl): threefry attention-dropout masks alone cost
    # ~12 ms/step at t512 (measured), rbg ~2 ms.
    key = jax.random.key(1, impl="rbg")
    args = (params, opt, key, rgb, motion, mr, mf, labels)
    float(timed(*args))  # compile + warm
    best = _best_of(lambda: float(timed(*args)), n=5)
    ms = best / iters * 1e3
    fwd = b * _transformer_flops(t, d, ff, layers, cross=True)
    step_flops = 3 * fwd  # fwd + bwd ~= 3x fwd true FLOPs
    tflops = step_flops / (best / iters) / 1e12
    return {
        "clips_per_sec": b * iters / best,
        "ms_per_step": ms,
        "batch": b, "seq_len": t,
        "attention_impl": "auto(flash, fused dropout)"
        if jax.default_backend() == "tpu" else "auto(xla)",
        "tflops_per_sec": tflops,
        "mfu_vs_measured_ceiling": tflops / MEASURED_CEILING_TFLOPS,
    }


def bench_student_train(jax, jnp):
    import optax

    from vimoclip_tpu import losses
    from vimoclip_tpu.models.clip_vit import ClipVisionConfig
    from vimoclip_tpu.models.student import StudentModel

    # b=8 is the measured TPU operating point (docs/PERF.md batch-scaling
    # curve); the trainers default to it too. 16 iters/fetch amortizes the
    # ~20-28 ms per-call tunnel overhead (was 4 -> ~7 ms/step inflation).
    r = STUDENT_RECIPE
    b, t, h, w, classes = r["b"], r["t"], r["h"], r["w"], r["classes"]
    iters = r["iters"]
    cfg = ClipVisionConfig.vit_b_32()  # reference student backbone
    model = StudentModel(vision_config=cfg, num_classes=classes,
                         dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, t, h, w, 3), dtype=np.uint8))
    teacher = jnp.asarray(rng.normal(size=(b, t, 512)).astype(np.float32))
    labels = jnp.asarray((rng.random((b, classes)) < 0.05).astype(np.float32))
    params = model.init(jax.random.key(0), frames)["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @jax.jit
    def timed(params, opt, frames, teacher, labels):
        def body(carry, i):
            p, o = carry
            # perturb one pixel per iteration: the preprocess (resize +
            # normalize) is params-independent, so with loop-invariant
            # frames XLA may hoist it out of the scan and the bench would
            # understate the real per-step cost (extraction bench does the
            # same; verified no-hoist by A/B on the chip, docs/PERF.md)
            fr = frames.at[0, 0, 0, 0, 0].set(i.astype(jnp.uint8))

            def loss_fn(p):
                _, distill, logits = model.apply({"params": p}, fr)
                d = losses.distillation_loss(distill, teacher, "cosine")
                c = losses.classification_loss(logits, labels, 9.0)
                return d + c

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (_, _), ls = jax.lax.scan(body, (params, opt), jnp.arange(iters))
        return jnp.sum(ls)

    args = (params, opt, frames, teacher, labels)
    float(timed(*args))  # compile + warm
    best = _best_of(lambda: float(timed(*args)), n=5)
    ms = best / iters * 1e3
    tokens = (224 // 32) ** 2 + 1  # ViT-B/32 @ 224
    fwd = b * t * _transformer_flops(tokens, 768, 3072, 12, cross=False)
    step_flops = 3 * fwd
    tflops = step_flops / (best / iters) / 1e12
    return {
        "segments_per_sec": b * iters / best,
        "frames_per_sec": b * t * iters / best,
        "ms_per_step": ms,
        "batch": b, "frames_per_segment": t, "frame_hw": f"{h}x{w}",
        "tflops_per_sec": tflops,
        "mfu_vs_measured_ceiling": tflops / MEASURED_CEILING_TFLOPS,
    }


def bench_serving(jax, jnp):
    """Serving path (VERDICT r2: driver-captured, not hand-derived):

    a) warm single-video latency, 450 frames @ 360x640, host frames in ->
       prediction out (includes the one host->device upload — on this rig a
       ~311 MB transfer through the tunnel dominates; on PCIe it is ~30 ms);
    b) multi-video throughput, pooled predict_videos vs a serial per-video
       loop over DEVICE-RESIDENT frames (isolates the batching win from
       tunnel-upload noise shared by both paths), plus max |prob delta|
       between the two paths (must be ~0: the predictor's default
       batch_invariant=True pools each clip over its own real length, so
       batching cannot change predictions — serving.py).
    """
    from vimoclip_tpu.config import TFAMModelConfig
    from vimoclip_tpu.models import TFAM
    from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
    from vimoclip_tpu.serving import ViMoCLIPPredictor

    classes = 140
    tcfg = ClipVisionConfig.vit_b_16()
    scfg = ClipVisionConfig.vit_b_32()
    # random-init at full geometry: latency is weight-value independent and
    # this rig has no pretrained weights (zero egress, CLAUDE.md)
    t_params = ClipVisionEncoder(tcfg).init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )["params"]
    s_params = ClipVisionEncoder(scfg).init(
        jax.random.key(1), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )["params"]
    tfam_cfg = TFAMModelConfig()
    d = tcfg.projection_dim
    f_params = TFAM(config=tfam_cfg, num_classes=classes).init(
        jax.random.key(2),
        jnp.zeros((1, 8, d)), jnp.zeros((1, 7, d)),
        jnp.ones((1, 8), bool), jnp.ones((1, 7), bool),
    )["params"]
    # length_bucket=512 keeps the fusion program count at one per batch
    # size (450 frames and the 136-176-frame batch videos share a bucket)
    pred = ViMoCLIPPredictor(
        teacher_params=t_params, teacher_config=tcfg,
        student_params=s_params, student_config=scfg,
        tfam_params=f_params, tfam_config=tfam_cfg, num_classes=classes,
        frame_batch=128, length_bucket=512, half_precision=True,
    )

    rng = np.random.default_rng(0)

    # a) single-video warm latency, host frames (t=450 spans multiple
    # 128-frame windows like real AK clips)
    t450 = np.tile(_make_frames(8, seed=3), (57, 1, 1, 1))[:450]

    def one_video() -> None:
        rgb_emb, mot_emb = pred.embed_video(t450)
        pred.predict_embeddings(rgb_emb, mot_emb, "bench")

    one_video()  # compile teacher/student/fuse programs + warm
    lat = _best_of(one_video, n=2)

    # b) pooled vs serial over device-resident clips: lengths past one
    # 128-frame window so the serial path pays real tail padding
    lengths = [160, 144, 176, 152, 168, 136]
    videos = [
        jax.device_put(jnp.asarray(_make_frames(n, seed=10 + i)))
        for i, n in enumerate(lengths)
    ]

    def serial():
        return [
            pred.predict_embeddings(*pred.embed_video(v), f"v{i}")
            for i, v in enumerate(videos)
        ]

    def pooled():
        return pred.predict_videos(videos)

    a, b = serial(), pooled()  # compile both fuse batch shapes + warm
    delta = max(
        float(np.max(np.abs(x.probabilities - y.probabilities)))
        for x, y in zip(a, b)
    )
    t_serial = _best_of(serial, n=2)
    t_pooled = _best_of(pooled, n=2)
    n_frames = sum(lengths)
    return {
        "video_latency_s_450f_wall": lat,
        "video_latency_fps": 450 / lat,
        "serial_videos_per_s": len(lengths) / t_serial,
        "pooled_videos_per_s": len(lengths) / t_pooled,
        "pooled_speedup_vs_serial": t_serial / t_pooled,
        "pooled_frames_per_s": n_frames / t_pooled,
        "pooled_vs_serial_max_prob_delta": delta,
        "batch_videos": len(lengths), "batch_lengths": lengths,
        "note": "latency includes one ~311 MB host->device upload "
                "(tunnel-bound on this rig, ~30 ms on PCIe); "
                "pooled/serial over device-resident frames",
    }


def bench_tpu_test(jax) -> dict:
    """Run the hardware-only Pallas suite (tests/test_pallas_tpu.py: on-chip
    PRNG keep-rate statistics, seed determinism, fwd/bwd mask
    bit-consistency, compiled numerics vs an f64 oracle) and record the
    verdict — VERDICT r2 asked for driver-captured evidence that this suite
    actually ran, not a manual `make tpu-test` claim."""
    import os
    import re
    import subprocess

    if jax.default_backend() != "tpu":
        return {"status": "skipped", "reason": "default backend is not tpu"}
    env = dict(os.environ)
    env["VIMO_TPU_TESTS"] = "1"  # conftest: leave the platform alone
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vimo_jax_cache")
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_pallas_tpu.py",
         "-q", "--no-header", "-p", "no:cacheprovider"],
        cwd=os.path.dirname(os.path.abspath(__file__)),
        env=env, capture_output=True, text=True, timeout=1800,
    )
    lines = proc.stdout.strip().splitlines() or [""]
    tail = next(
        (ln for ln in reversed(lines) if re.search(r"\d+ (passed|failed)", ln)),
        lines[-1],
    )
    counts = dict(
        (kind, int(n))
        for n, kind in re.findall(r"(\d+) (passed|failed|error|skipped)", tail)
    )
    return {
        "status": "passed" if proc.returncode == 0 else "FAILED",
        "returncode": proc.returncode,
        "summary": tail[:200],
        "duration_s": time.perf_counter() - t0,
        **counts,
    }


def _round(tree, nd=3):
    if isinstance(tree, dict):
        return {k: _round(v, nd) for k, v in tree.items()}
    if isinstance(tree, float):
        return round(tree, nd) if np.isfinite(tree) else None
    return tree


def main() -> None:
    import jax

    # Persist compiled programs: the three jit programs take minutes to
    # compile through this rig's tunnel; with the cache a repeat run (e.g.
    # the driver's) spends seconds, not minutes, recompiling nothing.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vimo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    # The headline extraction bench must succeed; the train-step benches are
    # individually fault-tolerant so one failure (remote-compile hiccup,
    # memory) can't take down the driver's one-JSON-line contract.
    ext = bench_extraction(jax, jnp)
    try:
        tfam = bench_tfam_train(jax, jnp)
    except Exception as e:
        tfam = {"error": str(e)[:300]}
    try:
        student = bench_student_train(jax, jnp)
    except Exception as e:
        student = {"error": str(e)[:300]}
    try:
        serving = bench_serving(jax, jnp)
    except Exception as e:
        serving = {"error": str(e)[:300]}
    try:
        tpu_test = bench_tpu_test(jax)
    except Exception as e:
        tpu_test = {"status": "FAILED", "error": str(e)[:300]}

    result = {
        "metric": "clip_vit_b16_extraction_throughput",
        "value": round(ext["fps"], 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(ext["fps"] / ext["ref_fps"], 2)
        if np.isfinite(ext["ref_fps"]) else None,
        "detail": _round({
            "baseline_ref_style_fps_same_host": ext["ref_fps"],
            "batch": ext["batch"],
            "iters_per_call": ext["iters"],
            "dtype": "bfloat16",
            "device": str(jax.devices()[0]),
            "extraction_tflops_per_sec": ext["tflops_per_sec"],
            "extraction_mfu_vs_measured_ceiling": ext["mfu_vs_measured_ceiling"],
            "extraction_turbo_fps": ext.get("turbo_fps"),
            "extraction_turbo_speedup": ext.get("turbo_speedup"),
            "extraction_turbo_config": "token_merge_r=16 + int8"
            if ext.get("turbo_fps") else None,
            "tfam_train_step": tfam,
            "student_train_step": student,
            "serving": serving,
            "tpu_test": tpu_test,
            "note": "baseline = reference hot-loop structure (serial PIL "
                    "preprocess + device forward) on this host; reference "
                    "publishes no throughput numbers (BASELINE.md). MFU vs "
                    "this chip's MEASURED 193 TFLOP/s bf16 matmul ceiling, "
                    "true FLOPs (2/MAC). End-to-end extraction incl. decode "
                    "is unmeasurable on this 1-core host (CLAUDE.md); this "
                    "times the device path the many-core data plane feeds.",
        }),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
