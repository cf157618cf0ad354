#!/usr/bin/env python
"""Measure gradient accumulation's peak-HBM claim on the chip (VERDICT r4
#3): the stage-1 student train step at the reference's batch 32
(/root/reference/train.py:183) dense vs ``--grad-accum 4``, plus a larger
batch that exhausts HBM dense but trains accumulated.

What is measured: XLA's own buffer assignment for the SHIPPED
``StudentTrainer._build_train_step`` — ``compiled.memory_analysis()``
(argument / output / temp / aliased bytes) after AOT-lowering the step
on a synthetic batch at the reference recipe shape (29 motion frames @
360x640 uint8, ViT-B/32 bf16, the docs/PERF.md student geometry), then
EXECUTING it twice to prove the program runs. TPU buffer allocation is
static, so ``temp_size_in_bytes`` (the activation/workspace arena) plus
arguments/outputs IS the program's HBM footprint — the number the
compiler OOMs on — and the grad-accum claim lives in ``temp``: the
``lax.scan`` keeps ONE microbatch of activations plus one f32
params-sized gradient sum live. (The axon tunnel exposes no allocator
``memory_stats()``, measured: ``device_memory_stats()`` returns ``{}``
there — static assignment is also the sharper instrument: exact,
deterministic, no sampling race.) The trainer is constructed exactly as
``vimo-train-student`` does, so the numbers cover params + Adam state +
the step's real activation schedule, not a hand-built approximation.

Each arm runs in a FRESH SUBPROCESS (isolation + a clean HBM arena). An
arm that dies with RESOURCE_EXHAUSTED at compile or run time reports
``status: "oom"`` — the expected outcome for the dense arm sized past
HBM that motivates accumulation.

Usage:
    python tools/bench_memory.py --out MEMBENCH.json
    python tools/bench_memory.py --arms 32:1,32:4   # subset: re-measures
    # those arms and MERGES them into an existing --out artifact (other
    # arms are preserved, so the committed 4-arm file stays intact)

Results feed the measured table in docs/SCALING.md "Batches bigger than
HBM".
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# reference stage-1 recipe shape: 29 motion frames (30-frame RGB teacher
# window minus one, train.py:98) at the AK videos' 360x640
T_MOTION, HEIGHT, WIDTH = 29, 360, 640
EMBED_DIM, NUM_CLASSES = 512, 140


def _arm(batch_size: int, accum: int, out_path: str) -> None:
    """Subprocess body: construct the shipped trainer, run 2 steps, write
    peak HBM (or oom) as JSON to ``out_path``."""
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/vimo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vimoclip_tpu.data.segment_dataset import SegmentDataset
    from vimoclip_tpu.data.hdf5_schema import EmbeddingWriter
    from vimoclip_tpu.models.clip_vit import ClipVisionConfig
    from vimoclip_tpu.train.student_trainer import StudentTrainer
    from vimoclip_tpu.utils.profiling import device_memory_stats
    from vimoclip_tpu.data.video_reader import write_video

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="membench_")
    vdir = os.path.join(tmp, "motion")
    os.makedirs(vdir)
    h5 = os.path.join(tmp, "teacher.h5")
    # tiny fixture corpus: construction-only (shape probe + the val-size
    # check); the measured batch below is synthetic at the recipe shape
    with EmbeddingWriter(h5, num_classes=NUM_CLASSES,
                         embed_dim=EMBED_DIM) as w:
        for i in range(batch_size):
            write_video(
                os.path.join(vdir, f"v{i}.mp4"),
                rng.integers(0, 256, (7, 32, 48, 3), dtype=np.uint8),
            )
            labels = np.zeros(NUM_CLASSES, np.float32)
            labels[int(rng.integers(0, NUM_CLASSES))] = 1
            w.write_video(
                f"v{i}.mp4",
                rng.normal(size=(8, EMBED_DIM)).astype(np.float32),
                labels=labels,
            )
    ds = SegmentDataset(h5, vdir, sequence_length=8)

    rec = {"batch_size": batch_size, "grad_accum": accum,
           "shape": [batch_size, T_MOTION, HEIGHT, WIDTH, 3],
           "backend": jax.default_backend()}
    try:
        trainer = StudentTrainer(
            ds, ds, checkpoint_dir=os.path.join(tmp, "ckpt"),
            vision_config=ClipVisionConfig.vit_b_32(),
            num_classes=NUM_CLASSES, batch_size=batch_size,
            grad_accum=accum, half_precision=True, num_workers=1, epochs=1,
        )
        batch = {
            "motion_frames": jax.device_put(
                rng.integers(0, 256,
                             (batch_size, T_MOTION, HEIGHT, WIDTH, 3),
                             dtype=np.uint8),
                trainer.batch_sharding),
            "rgb_emb": jax.device_put(
                rng.normal(size=(batch_size, T_MOTION + 1, EMBED_DIM))
                .astype(np.float32),
                trainer.batch_sharding),
            "labels": jax.device_put(
                np.eye(NUM_CLASSES, dtype=np.float32)[
                    rng.integers(0, NUM_CLASSES, batch_size)],
                trainer.batch_sharding),
        }
        state = trainer.state
        t0 = time.time()
        compiled = trainer._train_step.lower(state, dict(batch)).compile()
        ma = compiled.memory_analysis()
        arg, out = ma.argument_size_in_bytes, ma.output_size_in_bytes
        temp_b, alias = ma.temp_size_in_bytes, ma.alias_size_in_bytes
        code = ma.generated_code_size_in_bytes
        rec.update(
            argument_bytes=arg, output_bytes=out, temp_bytes=temp_b,
            alias_bytes=alias, generated_code_bytes=code,
            temp_gib=round(temp_b / 2**30, 3),
            # the program's HBM footprint: XLA's static assignment
            # (outputs alias donated arguments -> subtract once)
            program_hbm_gib=round((arg + out + temp_b + code - alias)
                                  / 2**30, 3),
        )
        for _ in range(2):  # prove it executes (donated state chains)
            state, total, d_loss, c_loss, _ = compiled(state, dict(batch))
        rec["total_loss"] = float(total)  # forces completion
        rec["wall_s_compile_plus_2steps"] = round(time.time() - t0, 1)
        stats = device_memory_stats()  # {} on axon; kept for real fleets
        if stats:
            rec["allocator_stats"] = stats
        rec["status"] = "ok"
    except Exception as e:  # noqa: BLE001 - classify OOM vs real failure
        msg = str(e)
        low = msg.lower()
        needles = ("resource_exhausted", "ran out of memory",
                   "out of memory", "memory space hbm",
                   "exceeds the hbm")
        hit = next((n for n in needles if n in low), None)
        if hit:
            # record the snippet AROUND the allocator's complaint, not the
            # tunnel-transport preamble — the artifact must show WHY
            i = low.find(hit)
            rec.update(status="oom",
                       oom_evidence=msg[max(0, i - 160):i + 400])
        else:
            raise
    with open(out_path, "w") as f:
        json.dump(rec, f)
    print(json.dumps(rec), flush=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="MEMBENCH.json")
    # 32:1 vs 32:4 measures the claim at the reference batch; 64:1 is the
    # expected-OOM motivator, 64:8 shows the same batch training
    p.add_argument("--arms", default="32:1,32:4,64:1,64:8")
    p.add_argument("--phase", choices=["all", "arm"], default="all")
    p.add_argument("--batch-size", type=int)
    p.add_argument("--grad-accum", type=int)
    p.add_argument("--arm-out")
    args = p.parse_args(argv)

    if args.phase == "arm":
        _arm(args.batch_size, args.grad_accum, args.arm_out)
        return 0

    # merge with an existing artifact so a subset re-measure
    # (``--arms 32:1``) UPDATES those arms in place instead of clobbering
    # the committed 4-arm file the always-on integrity test pins
    prior: dict[tuple[int, int], dict] = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prior = {(r["batch_size"], r["grad_accum"]): r
                         for r in json.load(f).get("results", [])}
        except (json.JSONDecodeError, KeyError, TypeError):
            print(f"warning: could not parse existing {args.out}; "
                  "rewriting from scratch", flush=True)

    for arm in args.arms.split(","):
        b, n = (int(x) for x in arm.split(":"))
        arm_out = tempfile.mktemp(prefix="membench_arm_")
        print(f"== arm batch={b} grad_accum={n}", flush=True)
        try:
            proc_rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--phase", "arm",
                 "--batch-size", str(b), "--grad-accum", str(n),
                 "--arm-out", arm_out],
                text=True, timeout=3600,
            ).returncode
        except subprocess.TimeoutExpired:
            # a stalled tunnel compile must not vaporize the arms already
            # measured — record it and keep going
            proc_rc = "timeout after 3600s"
        if proc_rc == 0 and os.path.exists(arm_out):
            with open(arm_out) as f:
                prior[(b, n)] = json.load(f)
            os.unlink(arm_out)
        else:
            prior[(b, n)] = {"batch_size": b, "grad_accum": n,
                             "status": f"failed rc={proc_rc}"}

    artifact = {
        "bench": "stage-1 student train-step peak HBM, dense vs grad_accum "
                 "(ViT-B/32 bf16, 29 frames @ 360x640 — reference "
                 "train.py:183 recipe shape)",
        "results": [prior[k] for k in sorted(prior)],
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
