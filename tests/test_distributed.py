"""Distributed BA: sharded execution must match single-device results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from refactored_orb_slam2_tpu.geometry.camera import Camera
from refactored_orb_slam2_tpu.parallel.dist_ba import (
    make_mesh, run_distributed_ba, shard_ba_problem,
)
from tests.test_bundle_adjustment import make_ba_problem


@pytest.mark.slow
class TestDistributedBA:
    def test_sharded_matches_single_device(self):
        """The point-sharded BA over an 8-device mesh must produce the same
        poses/points as the single-device run (same program, XLA inserts
        the collectives)."""
        assert len(jax.devices()) >= 8, "conftest provides 8 virtual devices"
        cam, prob, poses_true, pts_true, _ = make_ba_problem(
            0, n_kf=6, n_pts=128, obs_per_pt=4
        )
        r1 = run_distributed_ba(cam, prob, make_mesh(1), iters_phase1=3)
        r8 = run_distributed_ba(cam, prob, make_mesh(8), iters_phase1=3)
        np.testing.assert_allclose(
            np.asarray(r1.kf_poses), np.asarray(r8.kf_poses), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(r1.points), np.asarray(r8.points), atol=5e-3
        )

    def test_sharding_layout(self):
        cam, prob, *_ = make_ba_problem(1, n_kf=4, n_pts=64, obs_per_pt=3)
        mesh = make_mesh(8)
        sharded = shard_ba_problem(prob, mesh)
        # point-major arrays sharded over 8 devices, camera arrays replicated
        assert len(sharded.points.sharding.device_set) == 8
        assert not sharded.points.sharding.is_fully_replicated
        assert sharded.kf_poses.sharding.is_fully_replicated
