"""Pose-graph solver timing at scale: dense vs matrix-free PCG.

VERDICT r4 item 2: the PCG essential-graph solver was built for K >= 1024
where the dense (K, K, 7, 7) assembly is impossible (822 MB/iteration at
K=2048) — this benchmark commits the wall-clock and convergence numbers at
K in {512, 1024, 2048} on a chain + loop + covisibility-skip graph (the
same topology as tests/test_pose_graph.py:173, the essential graph's shape
after a loop closure, Optimizer.cc:763-1362).

    python scripts/bench_pose_graph.py                 # real chip
    JAX_PLATFORMS=cpu python scripts/bench_pose_graph.py

Prints one JSON line per (K, solver) with wall ms/solve (20 LM iterations,
the reference's essential-graph budget, Optimizer.cc:989) and the max
camera-centre error before/after.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import functools

import jax
import jax.numpy as jnp
import numpy as np

from refactored_orb_slam2_tpu.optim.pose_graph import (
    make_edges_from_poses, optimize_pose_graph,
)

# reuse the suite's validated drift fixture (chained noisy odometry
# relatives + a true loop edge) so convergence here matches the unit tests
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_pose_graph import circle_graph  # noqa: E402

_solve = jax.jit(
    optimize_pose_graph,
    static_argnames=("fix_scale", "n_iters", "solver", "n_cg"),
)


def build_graph(n):
    ii = [k - 1 for k in range(1, n)] + [n - 1]
    jj = list(range(1, n)) + [0]
    for k in range(0, n - 4, 2):       # covisibility-style skip edges
        ii.append(k)
        jj.append(k + 4)
    return jnp.asarray(ii, jnp.int32), jnp.asarray(jj, jnp.int32)


def centers(Rm, tm, sm):
    Rm, tm, sm = np.asarray(Rm), np.asarray(tm), np.asarray(sm)
    return -np.einsum("kji,kj->ki", Rm, tm) / sm[:, None]


def run_one(n, solver, n_iters=20):
    (R_gt, t_gt, s_gt), (R_est, t_est, s_est) = circle_graph(
        n, drift=0.015, seed=5
    )
    ii, jj = build_graph(n)
    edges = make_edges_from_poses(
        ii, jj, jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(s_gt),
        jnp.ones(len(ii), bool),
    )
    fixed = jnp.zeros(n, bool).at[0].set(True)
    args = (jnp.asarray(R_est), jnp.asarray(t_est), jnp.asarray(s_est),
            jnp.ones(n, bool), fixed, edges)

    def solve():
        return _solve(*args, fix_scale=True, solver=solver, n_iters=n_iters)

    # compile + warm
    R, t, s = solve()
    jax.block_until_ready((R, t, s))
    t0 = time.perf_counter()
    n_rep = 3
    for _ in range(n_rep):
        R, t, s = solve()
    jax.block_until_ready((R, t, s))
    ms = (time.perf_counter() - t0) / n_rep * 1e3

    e_before = float(np.linalg.norm(
        centers(R_est, t_est, s_est) - centers(R_gt, t_gt, s_gt), axis=1
    ).max())
    e_after = float(np.linalg.norm(
        centers(R, t, s) - centers(R_gt, t_gt, s_gt), axis=1
    ).max())
    rec = {
        "K": n, "edges": int(len(np.asarray(ii))), "solver": solver,
        "lm_iters": n_iters, "wall_ms_per_solve": round(ms, 1),
        "max_center_err_before_m": round(e_before, 4),
        "max_center_err_after_m": round(e_after, 4),
        "converged": e_after < 0.15 * e_before,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    recs = []
    for n in (512, 1024, 2048):
        # dense assembly is (K, K, 7, 7): 645 MB at K=1024, 2.6 GB single
        # buffer at K=2048 — only run it where it is the production choice
        if n <= 512:
            recs.append(run_one(n, "dense"))
        recs.append(run_one(n, "pcg"))
    assert all(r["converged"] for r in recs), recs


if __name__ == "__main__":
    main()
