#!/usr/bin/env python
"""Distributed-BA scaling benchmark: BA iterations/s vs device count.

Measures the Schur-complement global-BA LM iteration rate with the map-point
dimension sharded over 1..N devices (BASELINE.md: >= 0.7 scaling efficiency
target).  On a single-chip environment, run with a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_dist_ba.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor an explicit platform request despite the container's sitecustomize
# pre-registering the remote-TPU backend (env alone is too late)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def make_problem(n_kf, n_pts, obs_per_pt, seed=0):
    import jax.numpy as jnp

    from refactored_orb_slam2_tpu.geometry import se3
    from refactored_orb_slam2_tpu.optim.bundle_adjustment import BAProblem

    rng = np.random.default_rng(seed)
    poses = []
    for k in range(n_kf):
        xi = np.zeros(6, np.float32)
        xi[0] = -0.25 * k
        xi[4] = 0.01 * k
        poses.append(np.asarray(se3.exp(jnp.asarray(xi))))
    poses = np.stack(poses)
    pts = np.stack(
        [rng.uniform(-4, 4 + 0.25 * n_kf, n_pts), rng.uniform(-3, 3, n_pts),
         rng.uniform(4, 15, n_pts)], axis=1,
    ).astype(np.float32)
    obs_kf = rng.integers(0, n_kf, (n_pts, obs_per_pt)).astype(np.int32)
    uvr = np.zeros((n_pts, obs_per_pt, 3), np.float32)
    for o in range(obs_per_pt):
        T = poses[obs_kf[:, o]]
        pc = np.einsum("nij,nj->ni", T[:, :3, :3], pts) + T[:, :3, 3]
        z = np.maximum(pc[:, 2], 0.5)
        u = 500 * pc[:, 0] / z + 320
        v = 500 * pc[:, 1] / z + 240
        uvr[:, o, 0] = u + rng.normal(0, 0.5, n_pts)
        uvr[:, o, 1] = v + rng.normal(0, 0.5, n_pts)
        uvr[:, o, 2] = u - 40.0 / z
    return BAProblem(
        kf_poses=jnp.asarray(poses),
        kf_fixed=jnp.asarray([True] + [False] * (n_kf - 1)),
        kf_valid=jnp.ones(n_kf, bool),
        points=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)),
        point_valid=jnp.ones(n_pts, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_uvr=jnp.asarray(uvr),
        obs_inv_sigma2=jnp.ones((n_pts, obs_per_pt), jnp.float32),
        obs_is_stereo=jnp.ones((n_pts, obs_per_pt), bool),
        obs_valid=jnp.asarray(np.ones((n_pts, obs_per_pt), bool)),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kf", type=int, default=32)
    ap.add_argument("--pts", type=int, default=16384)
    ap.add_argument("--obs", type=int, default=6)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    from refactored_orb_slam2_tpu.geometry.camera import Camera
    from refactored_orb_slam2_tpu.parallel.dist_ba import make_mesh, run_distributed_ba

    cam = Camera.create(500.0, 500.0, 320.0, 240.0, bf=40.0)
    prob = make_problem(args.kf, args.pts, args.obs)

    n_dev = len(jax.devices())
    results = {}
    for nd in sorted({1, max(1, n_dev // 2), n_dev}):
        mesh = make_mesh(nd)
        run = lambda: run_distributed_ba(
            cam, prob, mesh, iters_phase1=args.iters, iters_phase2=0
        )
        jax.block_until_ready(run().kf_poses)   # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = run()
        jax.block_until_ready(out.kf_poses)
        dt = (time.perf_counter() - t0) / reps
        results[nd] = args.iters / dt
        print(f"devices={nd}: {results[nd]:.2f} BA iters/s "
              f"({dt*1000:.0f} ms / {args.iters} iters)")
    if len(results) > 1:
        base = results[min(results)]
        top_n = max(results)
        eff = results[top_n] / (base * top_n / min(results))
        # On a single host the "devices" are virtual (one physical CPU/chip
        # shared by all shards), so linear scaling is physically impossible
        # and ``scaling_efficiency`` is not meaningful.  The measurable and
        # transferable quantity is RETENTION: how much absolute throughput
        # the fully point-sharded program keeps versus the unsharded run —
        # i.e. the collective/partition overhead the sharding introduces.
        # On real chips (each shard with its own compute) the per-device
        # efficiency is bounded below by this retention figure modulo ICI
        # bandwidth.
        print(json.dumps({
            "metric": "dist_ba_sharding_overhead_retention",
            "value": round(results[top_n] / base, 3),
            "devices": top_n,
            "iters_per_s": {str(k): round(v, 2) for k, v in results.items()},
            "note": "virtual single-host mesh: shards share one physical "
                    "device, so retention (sharded/unsharded throughput) is "
                    "the honest figure; naive scaling_efficiency would be "
                    + str(round(eff, 3)),
        }))


if __name__ == "__main__":
    import jax.numpy as jnp  # noqa: F401  (after platform env set by caller)
    main()
