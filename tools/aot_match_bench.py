"""AOT-timed XLA vs fused-Pallas matcher at K=512/1024/2048 (VERDICT r3 #4).

The fused match kernel is default-on for directly-attached TPU but had no
measurement on any TPU path; this script produces that number on the tunnel
via the documented-safe AOT lower/compile/execute route (ops/__init__.py
disposition note), with the tunnel's dispatch overhead cancelled out:

  * each variant runs INSIDE one jitted lax.fori_loop program with a
    data dependency between iterations (XLA cannot hoist or elide it);
  * per-iteration cost = (wall(n_hi iters) - wall(n_lo iters)) / (n_hi - n_lo),
    so the per-program dispatch round-trip subtracts away;
  * sync via jax.device_get of a scalar (block_until_ready has returned
    early on this tunnel — bench.py:131-135).

Usage: python tools/aot_match_bench.py [--platform cpu] [--iters-hi 200]
Prints one JSON line per (K, variant).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build_variants():
    import jax
    import jax.numpy as jnp

    from droplet_visual_odometry_tpu.frontend import matcher
    from droplet_visual_odometry_tpu.ops import pallas_match

    def xla_once(da, db, va, vb):
        dist = matcher.hamming_matrix(da, db, va, vb)
        m = matcher.match_crosscheck(dist)
        return m.distance, m.idx

    def pallas_once(da, db, va, vb):
        d1, i1, d2, col_best = pallas_match.match_reductions(da, db, va, vb)
        rows = jnp.arange(da.shape[0], dtype=i1.dtype)
        ok = (col_best[i1] == rows) & (d1 < pallas_match.BIG)
        return jnp.where(ok, d1, pallas_match.BIG), i1

    return {"xla": xla_once, "pallas": pallas_once}


def timed_loop(once, n_iters, da, db, va, vb):
    """AOT-compile a program running `once` n_iters times with an
    un-hoistable inter-iteration dependency; return wall seconds."""
    import jax
    import jax.numpy as jnp

    def prog(da, db, va, vb):
        def body(i, carry):
            d, acc = carry
            dist, idx = once(d, db, va, vb)
            # Data dependency: fold an always-zero function of the output
            # back into the input (dist >= 0 always, but XLA can't prove it).
            bump = (dist[0] < -0.5).astype(d.dtype)
            return d.at[0, 0].add(bump), acc + dist[0]

        _, acc = jax.lax.fori_loop(0, n_iters, body, (da, jnp.float32(0.0)))
        return acc

    compiled = jax.jit(prog).lower(da, db, va, vb).compile()
    out = compiled(da, db, va, vb)
    _ = jax.device_get(out)  # warmup + sync
    t0 = time.perf_counter()
    out = compiled(da, db, va, vb)
    _ = jax.device_get(out)
    return time.perf_counter() - t0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iters-hi", type=int, default=200)
    ap.add_argument("--iters-lo", type=int, default=20)
    ap.add_argument("--ks", default="512,1024,2048")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    variants = build_variants()
    rng = np.random.default_rng(0)
    for K in [int(x) for x in args.ks.split(",")]:
        da = jnp.asarray(rng.integers(0, 2**32, (K, 8), dtype=np.uint32))
        db = jnp.asarray(rng.integers(0, 2**32, (K, 8), dtype=np.uint32))
        va = jnp.ones((K,), jnp.float32)
        vb = jnp.ones((K,), jnp.float32)
        for name, once in variants.items():
            try:
                t_hi = timed_loop(once, args.iters_hi, da, db, va, vb)
                t_lo = timed_loop(once, args.iters_lo, da, db, va, vb)
                per_iter_us = (t_hi - t_lo) / (args.iters_hi - args.iters_lo) * 1e6
                print(
                    json.dumps(
                        {
                            "K": K,
                            "variant": name,
                            "per_match_us": round(per_iter_us, 2),
                            "wall_hi_s": round(t_hi, 4),
                            "wall_lo_s": round(t_lo, 4),
                            "backend": jax.default_backend(),
                        }
                    ),
                    flush=True,
                )
            except Exception as e:  # e.g. VMEM overflow at K=2048
                print(
                    json.dumps(
                        {"K": K, "variant": name, "error": f"{type(e).__name__}: {e}"[:300]}
                    ),
                    flush=True,
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
