"""Micro-profile of the local-BA LM iteration at production shapes.

Times each sub-piece of lm_chunk (edge terms, assembly, dense solve,
acceptance re-evaluation) back-to-back on the chip to locate the 93 ms
per-5-iteration-chunk cost found by profile_mapping2.py.

    python scripts/profile_lm.py [K P O]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from refactored_orb_slam2_tpu.geometry.camera import Camera
from refactored_orb_slam2_tpu.optim import bundle_adjustment as BA


def make_prob(K=64, P=4096, O=32, obs_per_pt=6, seed=0):
    rng = np.random.default_rng(seed)
    cam = Camera.create(517.3, 516.5, 318.6, 255.3, bf=40.0,
                        width=640, height=480)
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    for k in range(K):
        poses[k, 0, 3] = -0.1 * k
    pts = np.stack([
        rng.uniform(-4, 4, P), rng.uniform(-3, 3, P), rng.uniform(3, 10, P)
    ], axis=1).astype(np.float32)
    obs_kf = np.full((P, O), -1, np.int32)
    uvr = np.zeros((P, O, 3), np.float32)
    for p in range(P):
        ks = rng.choice(K, obs_per_pt, replace=False)
        for o, k in enumerate(ks):
            T = poses[k]
            pc = T[:3, :3] @ pts[p] + T[:3, 3]
            u = 517.3 * pc[0] / pc[2] + 318.6
            v = 516.5 * pc[1] / pc[2] + 255.3
            obs_kf[p, o] = k
            uvr[p, o] = [u + rng.normal(0, 0.5), v + rng.normal(0, 0.5),
                         u - 40.0 / pc[2]]
    valid = obs_kf >= 0
    prob = BA.BAProblem(
        kf_poses=jnp.asarray(poses),
        kf_fixed=jnp.zeros(K, bool).at[0].set(True),
        kf_valid=jnp.ones(K, bool),
        points=jnp.asarray(pts + rng.normal(0, 0.01, pts.shape)),
        point_valid=jnp.ones(P, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_uvr=jnp.asarray(uvr),
        obs_inv_sigma2=jnp.ones((P, O), jnp.float32),
        obs_is_stereo=jnp.asarray(valid),
        obs_valid=jnp.asarray(valid),
    )
    return cam, prob


def tput(name, fn, n=16):
    r = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(r))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"  {name:32s}: {ms:8.3f} ms/call", flush=True)
    return ms


def main():
    K, P, O = (int(x) for x in (sys.argv[1:4] or (64, 4096, 32)))
    cam, prob = make_prob(K, P, O)
    lam = jnp.float32(1e-4)
    poses, points = prob.kf_poses, prob.points
    print(f"shapes: K={K} P={P} O={O}")

    jit_edge = jax.jit(lambda ps, xs: BA._edge_terms(
        cam, prob, ps, xs, True)[6])
    jit_assemble = jax.jit(lambda ps, xs: BA._assemble(
        cam, prob, ps, xs, lam, True))
    a = jit_assemble(poses, points)
    jit_dense = jax.jit(lambda a: BA._solve_dense(a, K))
    jit_pcg = jax.jit(lambda a: BA._solve_pcg(a, K, 24))
    jit_step = jax.jit(lambda ps, xs: BA._lm_step(
        cam, prob, ps, xs, lam, True, "dense", 0))
    jit_chunk1 = jax.jit(lambda ps, xs: BA.lm_chunk(
        cam, prob, ps, xs, lam, n_iters=1, use_huber=True,
        solver="dense", n_cg=0))
    jit_chunk5 = jax.jit(lambda ps, xs: BA.lm_chunk(
        cam, prob, ps, xs, lam, n_iters=5, use_huber=True,
        solver="dense", n_cg=0))

    tput("edge_terms (err only)", lambda: jit_edge(poses, points))
    tput("assemble", lambda: jit_assemble(poses, points))
    tput("solve_dense", lambda: jit_dense(a))
    tput("solve_pcg n_cg=24", lambda: jit_pcg(a))
    tput("lm_step (assemble+solve+bs)", lambda: jit_step(poses, points))
    tput("lm_chunk x1", lambda: jit_chunk1(poses, points))
    tput("lm_chunk x5", lambda: jit_chunk5(poses, points))


if __name__ == "__main__":
    main()
