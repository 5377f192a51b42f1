"""Worker for the two-process jax.distributed test (test_multiprocess.py).

Runs as one of N subprocesses: brings up jax.distributed through
parallel.launch.initialize (the production entry point), builds the GLOBAL
8-device mesh spanning both processes, and runs the two distributed
components over it:

  (1) shard_pair_vo — data-parallel pair VO, frames sharded over the global
      mesh; each process checks its ADDRESSABLE output shards against a
      locally-computed unsharded reference (same synthetic seed).
  (2) run_ba_distributed — landmark-sharded Schur-complement BA with psum
      reductions crossing the process boundary (the DCN path); the replicated
      pose output is written out so the parent can assert both processes
      agree bit-for-bit.

Usage: python mp_worker.py <process_id> <num_processes> <coordinator> <out_dir>
(Env: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=4.)
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    coordinator, out_dir = sys.argv[3], sys.argv[4]

    import jax

    # Select CPU via jax.config, NOT the JAX_PLATFORMS env var: with the env
    # var set, this image's preregistered plugin path ignores
    # --xla_force_host_platform_device_count (observed: 1 device instead of
    # 4); the config route honours it.
    jax.config.update("jax_platforms", "cpu")

    from droplet_visual_odometry_tpu.parallel import launch

    multi = launch.initialize(
        coordinator_address=coordinator, num_processes=nprocs, process_id=pid
    )
    assert multi, "initialize() did not enter multi-process mode"
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_devices()
    assert jax.device_count() == 4 * nprocs, jax.devices()

    import numpy as np
    import jax.numpy as jnp

    from droplet_visual_odometry_tpu.data import synthetic
    from droplet_visual_odometry_tpu.estimation.ransac import RansacConfig
    from droplet_visual_odometry_tpu.estimation.vo import VOConfig
    from droplet_visual_odometry_tpu.parallel import distributed_ba, sharding

    result: dict = {"pid": pid}

    # --- (1) data-parallel pair VO over the global mesh -------------------
    mesh = launch.global_mesh()
    n_pairs = jax.device_count()
    seq = synthetic.render_sequence(
        synthetic.SyntheticConfig(
            n_frames=n_pairs + 1, width=128, height=96, n_landmarks=60
        )
    )
    frames = np.asarray(seq.frames, np.float32)
    corners = np.nan_to_num(np.asarray(seq.marker_corners))
    mvalid = np.asarray(seq.marker_present)
    K = np.asarray(seq.camera.K, np.float32)
    cfg = VOConfig(
        n_keypoints=64, ransac=RansacConfig(n_hypotheses=128, lo_hypotheses=32)
    )
    key = jax.random.PRNGKey(0)
    rels = sharding.shard_pair_vo(
        mesh,
        key,
        frames[:-1],
        frames[1:],
        corners[:-1],
        corners[1:],
        mvalid[:-1] & mvalid[1:],
        K,
        seq.real_marker_length,
        cfg,
    )
    jax.block_until_ready(rels)

    # Unsharded local reference (every process has the full data).
    expected = np.asarray(
        sharding.pair_vo_batched(
            key,
            jnp.asarray(frames[:-1]),
            jnp.asarray(frames[1:]),
            jnp.asarray(corners[:-1]),
            jnp.asarray(corners[1:]),
            jnp.asarray(mvalid[:-1] & mvalid[1:]),
            jnp.asarray(K),
            seq.real_marker_length,
            cfg,
        )
    )
    max_err = 0.0
    n_local_shards = 0
    for shard in rels.addressable_shards:
        sl = shard.index[0]
        max_err = max(max_err, float(np.abs(np.asarray(shard.data) - expected[sl]).max()))
        n_local_shards += 1
    result["pair_vo_local_shards"] = n_local_shards
    result["pair_vo_max_err"] = max_err

    # --- (2) distributed Schur-complement BA over the global mesh ---------
    from droplet_visual_odometry_tpu.backend import ba
    from droplet_visual_odometry_tpu.core import se3

    rng = np.random.default_rng(1)
    W, L = 4, 8 * jax.device_count()
    pts = rng.uniform([-1, -1, 3], [1, 1, 6], size=(L, 3)).astype(np.float32)
    poses = np.stack(
        [
            np.asarray(
                se3.make_se3(jnp.eye(3), jnp.asarray([0.2 * w, 0.0, 0.0], jnp.float32))
            )
            for w in range(W)
        ]
    )
    Kb = jnp.asarray([[200.0, 0, 64], [0, 200.0, 48], [0, 0, 1]], jnp.float32)
    _, uv = ba._project(jnp.asarray(poses), jnp.asarray(pts), Kb)
    window = ba.BAWindow(
        poses=jnp.asarray(poses),
        points=jnp.asarray(
            pts + rng.normal(scale=0.02, size=pts.shape).astype(np.float32)
        ),
        obs_uv=uv,
        obs_mask=jnp.ones((W, L), bool),
        K=Kb,
    )
    mesh_lm = launch.global_mesh(axis_name="landmarks")
    res = distributed_ba.run_ba_distributed(mesh_lm, window, ba.BAConfig(iters=4))
    jax.block_until_ready(res.poses)
    result["ba_initial_cost"] = float(res.initial_cost)
    result["ba_final_cost"] = float(res.final_cost)
    result["ba_rms_px"] = float(res.rms_px)
    result["ba_poses"] = np.asarray(res.poses).tolist()  # replicated output

    with open(f"{out_dir}/worker_{pid}.json", "w") as f:
        json.dump(result, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
