"""Windowed BA: gather_ba_window / scatter_ba_window vs the full-bank path.

The compact-window path must solve the same optimization problem as
build_ba_problem over full map capacity (Optimizer::LocalBundleAdjustment
semantics) — same window poses and point positions after writeback.
"""

import numpy as np
import jax
import jax.numpy as jnp

from refactored_orb_slam2_tpu.geometry import se3
from refactored_orb_slam2_tpu.models import map_ops
from refactored_orb_slam2_tpu.models.map_state import create_empty
from refactored_orb_slam2_tpu.optim.bundle_adjustment import run
from refactored_orb_slam2_tpu.utils.config import MapConfig

from tests.test_bundle_adjustment import make_ba_problem


def map_from_ba_problem(prob, K=8, N=256, P=256, O=4):
    """Materialize a BAProblem as a MapState (assigning each observation a
    fresh feature slot on its keyframe)."""
    cfg = MapConfig(max_keyframes=K, max_points=P, max_obs_per_point=O)
    state = create_empty(cfg, N)
    obs_kf = np.asarray(prob.obs_kf)
    obs_uvr = np.asarray(prob.obs_uvr)
    obs_valid = np.asarray(prob.obs_valid)
    n_pts, Op = obs_kf.shape
    n_kf = prob.kf_poses.shape[0]
    is_stereo = bool(np.asarray(prob.obs_is_stereo).any())

    kf_xy = np.zeros((K, N, 2), np.float32)
    kf_uvr = np.full((K, N, 3), -1.0, np.float32)
    kf_feat_valid = np.zeros((K, N), bool)
    kf_point_idx = np.full((K, N), -1, np.int32)
    pt_obs_kf = np.full((P, O), -1, np.int32)
    pt_obs_feat = np.full((P, O), -1, np.int32)
    next_feat = np.zeros(n_kf, int)
    for p in range(n_pts):
        for o in range(Op):
            k = obs_kf[p, o]
            if k < 0 or not obs_valid[p, o]:
                continue
            f = next_feat[k]
            next_feat[k] += 1
            uvr = obs_uvr[p, o].copy()
            if not is_stereo:
                uvr[2] = -1.0
            kf_uvr[k, f] = uvr
            kf_xy[k, f] = uvr[:2]
            kf_feat_valid[k, f] = True
            kf_point_idx[k, f] = p
            pt_obs_kf[p, o] = k
            pt_obs_feat[p, o] = f

    state = state._replace(
        kf_pose=state.kf_pose.at[:n_kf].set(prob.kf_poses),
        kf_valid=state.kf_valid.at[:n_kf].set(True),
        kf_xy=jnp.asarray(kf_xy),
        kf_uvr=jnp.asarray(kf_uvr),
        kf_feat_valid=jnp.asarray(kf_feat_valid),
        kf_point_idx=jnp.asarray(kf_point_idx),
        pt_pos=state.pt_pos.at[:n_pts].set(prob.points),
        pt_valid=state.pt_valid.at[:n_pts].set(np.asarray(prob.point_valid)),
        pt_obs_kf=jnp.asarray(pt_obs_kf),
        pt_obs_feat=jnp.asarray(pt_obs_feat),
    )
    return state


class TestWindowedBA:
    def test_windowed_matches_full(self):
        cam, prob, poses_true, pts_true, _ = make_ba_problem(
            0, n_kf=6, n_pts=120, stereo=True
        )
        state = map_from_ba_problem(prob)
        K = state.kf_pose.shape[0]
        table = jnp.ones(1, jnp.float32)
        window = jnp.zeros(K, bool).at[jnp.arange(1, 6)].set(True)
        fixed = jnp.zeros(K, bool).at[0].set(True)

        # full-bank path
        full_prob = map_ops.build_ba_problem(state, window, fixed, table)
        full_res = run(cam, full_prob, iters_phase1=5, iters_phase2=10)
        state_full = map_ops.writeback_ba(
            state, full_res.kf_poses, full_res.points, full_res.obs_valid,
            full_prob,
        )

        # windowed path (window fits entirely)
        wprob, kf_sel, pt_sel, obs_sel, n_pt_in = map_ops.gather_ba_window(
            state, window, fixed, table, max_kfs=8, max_points=256,
        )
        assert int(n_pt_in) == 120
        wres = run(cam, wprob, iters_phase1=5, iters_phase2=10)
        state_win = map_ops.scatter_ba_window(
            state, wprob, kf_sel, pt_sel, obs_sel,
            wres.kf_poses, wres.points, wres.obs_valid,
        )

        for k in range(6):
            d = np.asarray(se3.log(
                se3.inv(state_full.kf_pose[k]) @ state_win.kf_pose[k]
            ))
            assert np.abs(d).max() < 1e-3, (k, d)
        pt_d = np.linalg.norm(
            np.asarray(state_full.pt_pos[:120]) - np.asarray(state_win.pt_pos[:120]),
            axis=1,
        )
        assert np.median(pt_d) < 1e-3

    def test_gather_problem_contents(self):
        """Gathered problem must contain exactly the window's observations,
        with kf indices remapped consistently."""
        cam, prob, *_ = make_ba_problem(1, n_kf=6, n_pts=64, obs_per_pt=4)
        state = map_from_ba_problem(prob, P=128)
        K = state.kf_pose.shape[0]
        table = jnp.ones(1, jnp.float32)
        window = jnp.zeros(K, bool).at[2].set(True).at[3].set(True)
        fixed = state.kf_valid & ~window

        wprob, kf_sel, pt_sel, obs_sel, n_pt_in = map_ops.gather_ba_window(
            state, window, fixed, table, max_kfs=8, max_points=128,
        )
        # window KFs occupy the first compact rows and are free
        sel = np.asarray(kf_sel)
        assert set(sel[:2]) == {2, 3}
        fixed_rows = np.asarray(wprob.kf_fixed & wprob.kf_valid)
        assert not fixed_rows[:2].any() and fixed_rows[2:6].all()
        # every selected point is observed by a window KF
        psel = np.asarray(pt_sel)
        obs_kf = np.asarray(state.pt_obs_kf)
        for p in psel[psel < 128]:
            assert any(obs_kf[p, o] in (2, 3) for o in range(4))
        # observation count matches the full builder
        full_prob = map_ops.build_ba_problem(state, window, fixed, table)
        assert int(wprob.obs_valid.sum()) == int(full_prob.obs_valid.sum())

    def test_window_overflow_keeps_most_constraining(self):
        """When the boundary exceeds max_kfs, window KFs always survive."""
        cam, prob, *_ = make_ba_problem(2, n_kf=6, n_pts=64, obs_per_pt=4)
        state = map_from_ba_problem(prob, P=128)
        K = state.kf_pose.shape[0]
        table = jnp.ones(1, jnp.float32)
        window = jnp.zeros(K, bool).at[1].set(True).at[2].set(True)
        fixed = state.kf_valid & ~window
        wprob, kf_sel, pt_sel, obs_sel, _ = map_ops.gather_ba_window(
            state, window, fixed, table, max_kfs=4, max_points=128,
        )
        sel = np.asarray(kf_sel)
        assert set(sel[:2]) == {1, 2}
        assert int((wprob.kf_valid).sum()) == 4
        # runs without error at the truncated boundary
        res = run(cam, wprob, iters_phase1=3, iters_phase2=0)
        assert np.isfinite(np.asarray(res.kf_poses)).all()

    def test_point_overflow_clamps(self):
        cam, prob, *_ = make_ba_problem(3, n_kf=6, n_pts=120, obs_per_pt=4)
        state = map_from_ba_problem(prob)
        K = state.kf_pose.shape[0]
        table = jnp.ones(1, jnp.float32)
        window = state.kf_valid
        fixed = jnp.zeros(K, bool)
        wprob, kf_sel, pt_sel, obs_sel, n_pt_in = map_ops.gather_ba_window(
            state, window, fixed, table, max_kfs=8, max_points=64,
        )
        assert int(n_pt_in) == 120          # true demand reported to host
        assert int(wprob.point_valid.sum()) == 64
