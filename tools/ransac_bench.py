"""On-chip RANSAC stage attribution + variant timing (VERDICT r3 #5).

Same methodology as aot_match_bench.py: each variant runs inside one jitted
fori_loop with an un-hoistable data dependency; per-iteration cost comes from
the (hi - lo) iteration delta, cancelling the tunnel's dispatch round-trip.

Variants decompose the production ransac_essential config to show where the
1.4 ms/frame goes: full, no-LO, no-polish, minimal-solve-only, score-only.
Usage: python tools/ransac_bench.py [--platform cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iters-hi", type=int, default=400)
    ap.add_argument("--iters-lo", type=int, default=40)
    ap.add_argument("--n-points", type=int, default=512)
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from droplet_visual_odometry_tpu.estimation import epipolar
    from droplet_visual_odometry_tpu.estimation.ransac import RansacConfig, ransac_essential

    rng = np.random.default_rng(0)
    N = args.n_points
    K = jnp.asarray([[520.0, 0, 319.5], [0, 520.0, 239.5], [0, 0, 1]], jnp.float32)
    # Synthetic epipolar-consistent correspondences + 30% outliers.
    X = rng.uniform([-1, -1, 2], [1, 1, 5], (N, 3))
    R_true = np.eye(3)
    t_true = np.array([0.05, 0.01, 0.02])
    x1 = X / X[:, 2:]
    X2 = X @ R_true.T + t_true
    x2 = X2 / X2[:, 2:]
    p1 = (x1[:, :2] * [520, 520] + [319.5, 239.5]).astype(np.float32)
    p2 = (x2[:, :2] * [520, 520] + [319.5, 239.5]).astype(np.float32)
    out = rng.random(N) < 0.3
    p2[out] = rng.uniform(0, 480, (int(out.sum()), 2)).astype(np.float32)
    p1j, p2j = jnp.asarray(p1), jnp.asarray(p2)
    valid = jnp.ones((N,), bool)

    base = RansacConfig()
    variants = {
        "full (fused LO+polish accept)": base,
        "r4_sequential (2xLO + 2 polish)": dataclasses.replace(
            base, fused_lo_polish=False
        ),
        "no_polish": dataclasses.replace(base, refine_iters=0),
        "no_lo": dataclasses.replace(base, lo_hypotheses=0),
        "minimal (no LO, no polish)": dataclasses.replace(
            base, lo_hypotheses=0, refine_iters=0
        ),
        "hyp512": dataclasses.replace(base, n_hypotheses=512, lo_hypotheses=128),
        "hyp256_lo64": dataclasses.replace(base, n_hypotheses=256, lo_hypotheses=64),
    }

    # The tunnel caches EXECUTION RESULTS keyed on (executable, inputs)
    # (PERF.md measurement caveat) — warm up on a perturbed copy of the
    # inputs so the timed call can never be served from that cache.
    p1_warm = p1j + 0.25
    walls = {}

    def timed(name, cfg):
        def make_prog(n_iters):
            def prog(p1a, p2a, v):
                def body(i, carry):
                    pts, acc = carry
                    res = ransac_essential(
                        jax.random.fold_in(jax.random.PRNGKey(0), i), pts, p2a, v, K, cfg
                    )
                    bump = (res.best_score < -1.0).astype(pts.dtype)
                    return pts.at[0, 0].add(bump), acc + res.best_score

                _, acc = jax.lax.fori_loop(0, n_iters, body, (p1a, jnp.float32(0)))
                return acc

            return prog

        results = []
        for n_iters in (args.iters_hi, args.iters_lo):
            compiled = jax.jit(make_prog(n_iters)).lower(p1j, p2j, valid).compile()
            _ = jax.device_get(compiled(p1_warm, p2j, valid))  # warmup, distinct input
            t0 = time.perf_counter()
            _ = jax.device_get(compiled(p1j, p2j, valid))
            results.append(time.perf_counter() - t0)
        walls[name] = [round(r, 4) for r in results]
        return (results[0] - results[1]) / (args.iters_hi - args.iters_lo) * 1e6

    for name, cfg in variants.items():
        try:
            us = timed(name, cfg)
            # Quality: inliers found at this config (single run).
            res = ransac_essential(jax.random.PRNGKey(1), p1j, p2j, valid, K, cfg)
            print(
                json.dumps(
                    {
                        "variant": name,
                        "per_call_us": round(us, 1),
                        "walls_s": walls[name],
                        "n_inliers": int(res.n_inliers),
                        "backend": jax.default_backend(),
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
