"""Multi-host orchestration for distributed bundle adjustment.

The reference is single-process (SURVEY §2.3: std::thread/std::mutex only);
this layer is the new capability that scales global BA beyond one host.
Design follows the JAX multi-controller recipe:

- every participating process calls :func:`init_process` (wraps
  ``jax.distributed.initialize``) so ``jax.devices()`` is the *global*
  device list;
- the map-point bank is partitioned by host: each process materializes only
  its contiguous slice of the point/observation arrays, and
  :func:`global_ba_problem` assembles them into global jax.Arrays with
  ``jax.make_array_from_process_local_data`` — points never leave their
  host over DCN;
- camera (keyframe) state is tiny and replicated on every process;
- all processes then call :func:`run_multihost_ba` (the same jitted Schur
  BA as single-host ``dist_ba``); XLA partitions the point-major math
  across all global devices and inserts the camera-block AllReduce —
  hierarchically ICI within a host, DCN across hosts;
- results: camera poses come back replicated (read directly on any host);
  each host reads back its own point slice with :func:`local_points`.

The per-host slice size must be equal across hosts (pad the point bank to
``hosts * points_per_host``; capacities in MapConfig are powers of two so
this holds by construction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.camera import Camera
from ..optim import bundle_adjustment as BA
from .dist_ba import _run_ba

POINT_AXIS = "points"


def init_process(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-controller job.  Call before any other jax use.

    On a real TPU pod slice all arguments come from the scheduler
    environment (pass nothing); tests pass explicit values and force
    virtual CPU devices via XLA_FLAGS per process.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh() -> Mesh:
    """1-D mesh over every device in the job, point axis spanning hosts.

    Device order from ``jax.devices()`` groups by process, so a contiguous
    point partition keeps each host's slice on its own chips."""
    return Mesh(np.asarray(jax.devices()), (POINT_AXIS,))


def host_point_slice(total_points: int) -> tuple[int, int]:
    """[start, stop) of this process's point partition."""
    n = jax.process_count()
    if total_points % n:
        raise ValueError(f"point capacity {total_points} not divisible by "
                         f"{n} processes")
    per = total_points // n
    i = jax.process_index()
    return i * per, (i + 1) * per


def global_ba_problem(
    local: BA.BAProblem, mesh: Mesh, total_points: int
) -> BA.BAProblem:
    """Assemble a global BAProblem from per-process local point slices.

    ``local`` holds this process's slice (``host_point_slice(total_points)``
    rows) of every point-major array, and the full replicated camera
    arrays.  No point data crosses DCN here."""
    pt = NamedSharding(mesh, P(POINT_AXIS))
    rep = NamedSharding(mesh, P())

    def sharded(x):
        shape = (total_points,) + tuple(np.shape(x))[1:]
        return jax.make_array_from_process_local_data(pt, np.asarray(x), shape)

    def replicated(x):
        return jax.device_put(np.asarray(x), rep)

    return BA.BAProblem(
        kf_poses=replicated(local.kf_poses),
        kf_fixed=replicated(local.kf_fixed),
        kf_valid=replicated(local.kf_valid),
        points=sharded(local.points),
        point_valid=sharded(local.point_valid),
        obs_kf=sharded(local.obs_kf),
        obs_uvr=sharded(local.obs_uvr),
        obs_inv_sigma2=sharded(local.obs_inv_sigma2),
        obs_is_stereo=sharded(local.obs_is_stereo),
        obs_valid=sharded(local.obs_valid),
    )


def run_multihost_ba(
    cam: Camera,
    global_prob: BA.BAProblem,
    *,
    iters_phase1: int = 10,
    iters_phase2: int = 0,
    solver: str = "pcg",
    n_cg: int = 80,
) -> BA.BAResult:
    """Jitted Schur BA over the global mesh; call from every process."""
    return _run_ba(cam, global_prob, iters_phase1, iters_phase2, solver, n_cg)


def local_points(result: BA.BAResult) -> np.ndarray:
    """This process's optimized point slice, gathered from its addressable
    shards (contiguous by construction of the mesh)."""
    shards = sorted(
        result.points.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def replicated_poses(result: BA.BAResult) -> np.ndarray:
    """Optimized camera poses (replicated output — any shard is the whole)."""
    return np.asarray(result.kf_poses.addressable_shards[0].data)
