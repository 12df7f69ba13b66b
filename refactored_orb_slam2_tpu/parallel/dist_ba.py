"""Distributed bundle adjustment over a TPU device mesh.

The reference has no distributed anything (single-process C++, SURVEY §2.3);
this is the new capability: global BA sharded over chips.  Design follows
the XLA/jax.sharding recipe — *annotate shardings, let XLA insert
collectives*:

- the map-point bank and the point-major observation arrays are sharded
  along the point axis over the mesh's ``"points"`` axis;
- camera (keyframe) state is replicated;
- inside the jitted Schur BA (optim.bundle_adjustment), every
  ``segment_sum`` scatter onto camera blocks becomes a partial sum over the
  local point shard followed by an XLA-inserted ``AllReduce`` (psum) riding
  ICI — exactly the hand-written MPI reduction a CPU/GPU system would need,
  for free;
- the reduced (6K, 6K) camera solve is replicated (it is tiny next to the
  residual/Jacobian work, which scales with P/devices);
- back-substitution for point updates is local to each shard.

This scales BA residual evaluation and Schur assembly linearly in device
count — the BASELINE.md "distributed BA >= 0.7 scaling efficiency" target.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.camera import Camera
from ..optim import bundle_adjustment as BA


def make_mesh(n_devices: int | None = None, axis: str = "points") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_ba_problem(prob: BA.BAProblem, mesh: Mesh, axis: str = "points") -> BA.BAProblem:
    """Place the problem on the mesh: point-major arrays sharded along the
    point dimension, camera arrays replicated."""
    pt = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def put(x, sh):
        return jax.device_put(x, sh)

    return BA.BAProblem(
        kf_poses=put(prob.kf_poses, rep),
        kf_fixed=put(prob.kf_fixed, rep),
        kf_valid=put(prob.kf_valid, rep),
        points=put(prob.points, pt),
        point_valid=put(prob.point_valid, pt),
        obs_kf=put(prob.obs_kf, pt),
        obs_uvr=put(prob.obs_uvr, pt),
        obs_inv_sigma2=put(prob.obs_inv_sigma2, pt),
        obs_is_stereo=put(prob.obs_is_stereo, pt),
        obs_valid=put(prob.obs_valid, pt),
    )


@partial(jax.jit, static_argnames=("iters_phase1", "iters_phase2", "solver", "n_cg"))
def _run_ba(cam, prob, iters_phase1, iters_phase2, solver, n_cg):
    return BA.run(cam, prob, iters_phase1=iters_phase1, iters_phase2=iters_phase2,
                  solver=solver, n_cg=n_cg)


def run_distributed_ba(
    cam: Camera,
    prob: BA.BAProblem,
    mesh: Mesh,
    *,
    iters_phase1: int = 10,
    iters_phase2: int = 0,
    solver: str = "pcg",
    n_cg: int = 80,
) -> BA.BAResult:
    """Global BA with the point dimension sharded across the mesh.

    Point counts should be padded to a multiple of the device count (the
    map's static capacities normally guarantee this).  The matrix-free PCG
    solver is the default: every Schur matvec's camera-side segment-sum
    becomes a partial sum over the local point shard + an XLA-inserted
    psum over ICI, and the preconditioner solve is replicated (tiny).
    """
    sharded = shard_ba_problem(prob, mesh)
    return _run_ba(cam, sharded, iters_phase1, iters_phase2, solver, n_cg)
