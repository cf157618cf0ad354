"""A/B the flash kernel's (block_q, block_k) tile sizes on the real chip.

The shipped defaults are 512x512 (ops/pallas/flash_attention.py); the
crossover table (docs/PERF.md) was measured at those defaults. This sweeps
the tile geometry at the long sequence lengths where the kernel IS the
attention path (t >= 2048 eval, t >= 256 dropout training) to check the
defaults against bigger/smaller tiles: larger k-tiles amortise the
per-grid-step VPU epilogue over more MXU work but raise VMEM pressure;
larger q-tiles cut dq-sweep passes in the backward.

Methodology is bench.py's tunnel-proof pattern: N fwd+bwd iterations chained
through their own gradients inside ONE jit (lax.scan; the gradient feedback
makes every iteration data-dependent on the last, so nothing hoists),
scalar fetch, best-of-5. Run it solo on the chip:

    python tools/bench_flash_blocks.py --t 8192 --iters 16
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vimoclip_tpu.ops.pallas.flash_attention import flash_attention

B, H, D = 4, 8, 64  # the docs/PERF.md crossover-table geometry


def _best_of(fn, n=5) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def make_timed(t: int, block_q: int, block_k: int, dropout: float,
               iters: int):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, t, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, t, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, t, D)), jnp.bfloat16)
    seed = jnp.zeros((), jnp.int32) if dropout else None

    @jax.jit
    def timed(q, k, v):
        def loss(q, k, v):
            o = flash_attention(
                q, k, v, dropout_rate=dropout, dropout_seed=seed,
                block_q=block_q, block_k=block_k,
            )
            return jnp.sum(o.astype(jnp.float32))

        grad_fn = jax.value_and_grad(loss, argnums=(0, 1, 2))

        def body(carry, _):
            q, k, v = carry
            l, (dq, dk, dv) = grad_fn(q, k, v)
            # feed the grads back so iteration i+1 depends on i's backward
            eps = jnp.asarray(1e-6, jnp.bfloat16)
            return (q + eps * dq, k + eps * dk, v + eps * dv), l

        (qf, _, _), ls = jax.lax.scan(body, (q, k, v), None, length=iters)
        return jnp.sum(ls) + jnp.sum(qf.astype(jnp.float32))

    return lambda: float(timed(q, k, v))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--t", type=int, nargs="+", default=[8192])
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument(
        "--blocks", nargs="+",
        default=["512x512", "1024x512", "512x1024", "1024x1024", "256x512",
                 "512x256"],
        help="block_q x block_k pairs",
    )
    ap.add_argument("--out", default=None, help="write results JSON here")
    args = ap.parse_args(argv)

    results = []
    for t in args.t:
        for pair in args.blocks:
            bq, bk = (int(x) for x in pair.split("x"))
            timed = make_timed(t, bq, bk, args.dropout, args.iters)
            best = _best_of(timed)
            ms = best * 1e3 / args.iters
            row = {"t": t, "block_q": bq, "block_k": bk,
                   "dropout": args.dropout,
                   "ms_per_fwdbwd": round(ms, 3)}
            results.append(row)
            print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"geometry": {"b": B, "h": H, "d": D},
                       "iters": args.iters, "results": results}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
