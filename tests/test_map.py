"""Tests for the SoA map model: insertion, observations, covisibility,
fusion, culling, point statistics."""

import numpy as np
import jax.numpy as jnp

from refactored_orb_slam2_tpu.geometry import se3
from refactored_orb_slam2_tpu.geometry.camera import Camera
from refactored_orb_slam2_tpu.models import map_ops
from refactored_orb_slam2_tpu.models.map_state import (
    covisibility_matrix, create_empty, n_observations, predict_scale,
    update_point_stats,
)
from refactored_orb_slam2_tpu.backend import local_mapping as LM
from refactored_orb_slam2_tpu.utils.config import MapConfig


def small_map(K=8, N=64, P=128, O=4):
    cfg = MapConfig(max_keyframes=K, max_points=P, max_obs_per_point=O)
    return create_empty(cfg, N)


def insert_dummy_kf(state, kf_slot, pose=None, n_feat=32, seed=0, matched=None):
    rng = np.random.default_rng(seed)
    K, N, P, O = state.capacity
    pose = jnp.eye(4) if pose is None else pose
    xy = jnp.asarray(rng.uniform(0, 320, (N, 2)).astype(np.float32))
    uvr = jnp.concatenate([xy, -jnp.ones((N, 1))], axis=1)
    valid = jnp.arange(N) < n_feat
    matched = jnp.full((N,), -1, jnp.int32) if matched is None else matched
    return map_ops.insert_keyframe(
        state, jnp.int32(kf_slot), jnp.int32(kf_slot), pose,
        xy, uvr, jnp.zeros(N, jnp.int32), jnp.zeros(N, jnp.float32),
        jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32)),
        valid, matched, jnp.int32(-1),
    )


class TestMapOps:
    def test_insert_and_observe(self):
        s = small_map()
        # create two points manually
        s = s._replace(
            pt_valid=s.pt_valid.at[0].set(True).at[1].set(True),
            pt_pos=s.pt_pos.at[0].set(jnp.asarray([0.0, 0.0, 5.0])),
        )
        matched = jnp.full((64,), -1, jnp.int32).at[3].set(0).at[7].set(1)
        s = insert_dummy_kf(s, 0, matched=matched)
        assert int(s.kf_point_idx[0, 3]) == 0
        assert int(s.pt_obs_kf[0, 0]) == 0 and int(s.pt_obs_feat[0, 0]) == 3
        assert int(s.pt_obs_kf[1, 0]) == 0 and int(s.pt_obs_feat[1, 0]) == 7
        # second KF observing point 0 again
        matched2 = jnp.full((64,), -1, jnp.int32).at[5].set(0)
        s = insert_dummy_kf(s, 1, matched=matched2, seed=1)
        assert int(s.pt_obs_kf[0, 1]) == 1
        assert int(n_observations(s)[0]) == 2

    def test_no_duplicate_observation(self):
        s = small_map()
        s = s._replace(pt_valid=s.pt_valid.at[0].set(True))
        matched = jnp.full((64,), -1, jnp.int32).at[3].set(0)
        s = insert_dummy_kf(s, 0, matched=matched)
        # adding the same kf observation again must not duplicate
        s2 = map_ops.add_observations(s, jnp.int32(0), matched)
        assert int(n_observations(s2)[0]) == 1

    def test_covisibility(self):
        s = small_map()
        # 20 points seen by KF0 and KF1, 5 by KF1 and KF2
        pt_valid = s.pt_valid
        obs_kf = s.pt_obs_kf
        obs_ft = s.pt_obs_feat
        for p in range(20):
            pt_valid = pt_valid.at[p].set(True)
            obs_kf = obs_kf.at[p, 0].set(0).at[p, 1].set(1)
            obs_ft = obs_ft.at[p, 0].set(p).at[p, 1].set(p)
        for p in range(20, 25):
            pt_valid = pt_valid.at[p].set(True)
            obs_kf = obs_kf.at[p, 0].set(1).at[p, 1].set(2)
            obs_ft = obs_ft.at[p, 0].set(p).at[p, 1].set(p)
        s = s._replace(pt_valid=pt_valid, pt_obs_kf=obs_kf, pt_obs_feat=obs_ft,
                       kf_valid=s.kf_valid.at[:3].set(True))
        W = np.asarray(covisibility_matrix(s))
        assert W[0, 1] == 20 and W[1, 0] == 20
        assert W[1, 2] == 5 and W[0, 2] == 0
        assert W[0, 0] == 0

    def test_create_points_from_depth(self):
        s = small_map()
        cam = Camera.create(400.0, 400.0, 160.0, 120.0, bf=80.0, width=320, height=240)
        s = insert_dummy_kf(s, 0)
        depth = jnp.where(jnp.arange(64) < 10, 5.0, -1.0)
        s, n_new = map_ops.create_points_from_depth(
            s, jnp.int32(0), depth, jnp.full((64,), -1, jnp.int32), cam,
            th_depth=10.0, pt_base=jnp.int32(0), max_new=16,
        )
        assert int(n_new) == 10
        assert bool(s.pt_valid[:10].all())
        # depth recovered: z of created points == 5 (identity pose)
        np.testing.assert_allclose(np.asarray(s.pt_pos[:10, 2]), 5.0, atol=1e-5)
        # observation registered both ways
        assert (np.asarray(s.pt_obs_kf[:10, 0]) == 0).all()
        feats = np.asarray(s.pt_obs_feat[:10, 0])
        assert (np.asarray(s.kf_point_idx[0])[feats] == np.arange(10)).all()

    def test_depth_ordering_and_threshold(self):
        s = small_map()
        cam = Camera.create(400.0, 400.0, 160.0, 120.0, bf=80.0, width=320, height=240)
        s = insert_dummy_kf(s, 0)
        rng = np.random.default_rng(0)
        d = rng.uniform(1, 20, 64).astype(np.float32)
        s, n_new = map_ops.create_points_from_depth(
            s, jnp.int32(0), jnp.asarray(d), jnp.full((64,), -1, jnp.int32), cam,
            th_depth=8.0, pt_base=jnp.int32(0), max_new=4,
        )
        assert int(n_new) == 4
        # the four nearest eligible depths chosen
        eligible = np.sort(d[(d < 8.0) & (np.arange(64) < 32)])[:4]
        np.testing.assert_allclose(
            np.sort(np.asarray(s.pt_pos[:4, 2])), eligible, atol=1e-5
        )


class TestLocalMapping:
    def test_cull_bad_ratio(self):
        s = small_map()
        s = s._replace(
            pt_valid=s.pt_valid.at[:4].set(True),
            pt_visible=s.pt_visible.at[:4].set(10),
            pt_found=s.pt_found.at[0].set(1).at[1].set(9).at[2].set(9).at[3].set(0),
            pt_first_kf=s.pt_first_kf.at[:4].set(0),
        )
        s2 = LM.cull_map_points(s, jnp.int32(10))
        v = np.asarray(s2.pt_valid[:4])
        assert not v[0] and v[1] and v[2] and not v[3]

    def test_cull_recent_matches_full_on_recent_points(self):
        """The production recent-slice cull must agree with the full-bank
        cull whenever all live points fit inside the recent window."""
        s = small_map()
        s = s._replace(
            pt_valid=s.pt_valid.at[:6].set(True),
            pt_visible=s.pt_visible.at[:6].set(10),
            pt_found=(
                s.pt_found.at[0].set(1).at[1].set(9).at[2].set(9)
                .at[3].set(0).at[4].set(5).at[5].set(1)
            ),
            pt_first_kf=s.pt_first_kf.at[:6].set(0),
            # give point 1 observations so the too-few gate has data
            pt_obs_kf=s.pt_obs_kf.at[1, :3].set(0),
            pt_obs_feat=s.pt_obs_feat.at[1, :3].set(jnp.arange(3)),
        )
        full = LM.cull_map_points(s, jnp.int32(10))
        recent = LM.cull_recent_map_points(
            s, jnp.int32(10), jnp.int32(6), recent_cap=16
        )
        np.testing.assert_array_equal(
            np.asarray(full.pt_valid), np.asarray(recent.pt_valid)
        )
        np.testing.assert_array_equal(
            np.asarray(full.pt_obs_kf), np.asarray(recent.pt_obs_kf)
        )
        np.testing.assert_array_equal(
            np.asarray(full.kf_point_idx), np.asarray(recent.kf_point_idx)
        )

    def test_cull_recent_leaves_old_slots_alone(self):
        """Points below the recent slice must never be culled (the
        reference's MapPointCulling only judges recent additions)."""
        s = small_map()
        s = s._replace(
            pt_valid=s.pt_valid.at[:8].set(True),
            pt_visible=s.pt_visible.at[:8].set(10),
            pt_found=s.pt_found.at[:8].set(0),   # all would fail the ratio
            pt_first_kf=s.pt_first_kf.at[:8].set(0),
        )
        out = LM.cull_recent_map_points(
            s, jnp.int32(10), jnp.int32(8), recent_cap=4
        )
        v = np.asarray(out.pt_valid[:8])
        assert v[:4].all()          # old slots untouched
        assert not v[4:8].any()     # recent slice culled

    def test_visibility_counters(self):
        s = small_map()
        s = s._replace(pt_valid=s.pt_valid.at[:3].set(True))
        vis = jnp.asarray([0, 1, 2, -1], jnp.int32)
        fnd = jnp.full((64,), -1, jnp.int32).at[0].set(1)
        s2 = LM.update_visibility(s, vis, fnd)
        assert np.asarray(s2.pt_visible[:3]).tolist() == [1, 1, 1]
        assert np.asarray(s2.pt_found[:3]).tolist() == [0, 1, 0]

    def test_fuse_adds_observation(self):
        """A KF whose feature matches an unobserved-there map point gains an
        observation through fusion."""
        cam = Camera.create(400.0, 400.0, 160.0, 120.0, bf=80.0, width=320, height=240)
        s = small_map()
        rng = np.random.default_rng(0)
        desc = rng.integers(0, 2**32, (1, 8), dtype=np.uint32)
        # map point at (0,0,5) with known descriptor, observed by KF1 (slot 1)
        s = s._replace(
            pt_valid=s.pt_valid.at[0].set(True),
            pt_pos=s.pt_pos.at[0].set(jnp.asarray([0.0, 0.0, 5.0])),
            pt_desc=s.pt_desc.at[0].set(jnp.asarray(desc[0])),
            pt_normal=s.pt_normal.at[0].set(jnp.asarray([0.0, 0.0, 1.0])),
            pt_min_dist=s.pt_min_dist.at[0].set(1.0),
            pt_max_dist=s.pt_max_dist.at[0].set(5.0),
            pt_obs_kf=s.pt_obs_kf.at[0, 0].set(1),
            pt_obs_feat=s.pt_obs_feat.at[0, 0].set(0),
        )
        # KF0 at identity: point projects to principal point (160, 120);
        # its feature 5 sits there with the same descriptor
        K, N, P, O = s.capacity
        xy = np.full((N, 2), 300.0, np.float32)
        xy[5] = [160.0, 120.0]
        uvr = np.concatenate([xy, -np.ones((N, 1), np.float32)], axis=1)
        descs = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)
        descs[5] = desc[0]
        s = s._replace(
            kf_valid=s.kf_valid.at[0].set(True).at[1].set(True),
            kf_xy=s.kf_xy.at[0].set(jnp.asarray(xy)),
            kf_uvr=s.kf_uvr.at[0].set(jnp.asarray(uvr)),
            kf_desc=s.kf_desc.at[0].set(jnp.asarray(descs)),
            kf_feat_valid=s.kf_feat_valid.at[0].set(jnp.ones(N, bool)),
        )
        s2 = LM.fuse_into_keyframe(
            s, jnp.int32(0), cam, budget=32, scale_factor=1.2, n_levels=4,
        )
        assert int(s2.kf_point_idx[0, 5]) == 0
        assert int(n_observations(s2)[0]) == 2

    def test_fuse_merges_duplicates(self):
        """Two map points landing on the same feature merge; the one with
        more observations wins and inherits the loser's observations."""
        cam = Camera.create(400.0, 400.0, 160.0, 120.0, bf=80.0, width=320, height=240)
        s = small_map()
        rng = np.random.default_rng(1)
        desc = rng.integers(0, 2**32, (1, 8), dtype=np.uint32)[0]
        K, N, P, O = s.capacity
        # winner: point 0 with 2 obs (kf1, kf2); loser: point 1 with 1 obs (kf3)
        s = s._replace(
            pt_valid=s.pt_valid.at[0].set(True).at[1].set(True),
            pt_pos=s.pt_pos.at[0].set(jnp.asarray([0.0, 0.0, 5.0]))
                          .at[1].set(jnp.asarray([0.01, 0.0, 5.0])),
            pt_desc=s.pt_desc.at[0].set(jnp.asarray(desc)).at[1].set(jnp.asarray(desc)),
            pt_normal=s.pt_normal.at[0].set(jnp.asarray([0.0, 0.0, 1.0]))
                               .at[1].set(jnp.asarray([0.0, 0.0, 1.0])),
            pt_min_dist=s.pt_min_dist.at[:2].set(1.0),
            pt_max_dist=s.pt_max_dist.at[:2].set(5.0),
            pt_obs_kf=s.pt_obs_kf.at[0, 0].set(1).at[0, 1].set(2).at[1, 0].set(3),
            pt_obs_feat=s.pt_obs_feat.at[0, 0].set(0).at[0, 1].set(0).at[1, 0].set(0),
            kf_valid=s.kf_valid.at[:4].set(True),
        )
        # KF0: feature 5 at the projection, holding point 1 (the loser)
        xy = np.full((N, 2), 300.0, np.float32)
        xy[5] = [160.0, 120.0]
        uvr = np.concatenate([xy, -np.ones((N, 1), np.float32)], axis=1)
        descs = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)
        descs[5] = desc
        kf_pt = np.full((N,), -1, np.int32)
        kf_pt[5] = 1
        s = s._replace(
            kf_xy=s.kf_xy.at[0].set(jnp.asarray(xy)),
            kf_uvr=s.kf_uvr.at[0].set(jnp.asarray(uvr)),
            kf_desc=s.kf_desc.at[0].set(jnp.asarray(descs)),
            kf_feat_valid=s.kf_feat_valid.at[0].set(jnp.ones(N, bool)),
            kf_point_idx=s.kf_point_idx.at[0].set(jnp.asarray(kf_pt)),
        )
        s2 = LM.fuse_into_keyframe(
            s, jnp.int32(0), cam, budget=32, scale_factor=1.2, n_levels=4,
        )
        # loser (point 1) invalidated, feature remapped to winner
        assert not bool(s2.pt_valid[1])
        assert int(s2.kf_point_idx[0, 5]) == 0
        # winner inherited the loser's kf3 observation
        obs = np.asarray(s2.pt_obs_kf[0])
        assert 3 in obs[obs >= 0]


class TestPointStats:
    def test_predict_scale(self):
        # max_dist corresponds to octave 0 at distance d; at d/1.2 -> level 1
        lvl = predict_scale(jnp.asarray([10.0, 10.0 / 1.2**3]), jnp.asarray([10.0, 10.0]), 1.2, 8)
        assert int(lvl[0]) == 0
        assert int(lvl[1]) == 3

    def test_update_stats_descriptor_and_normal(self):
        s = small_map()
        rng = np.random.default_rng(2)
        K, N, P, O = s.capacity
        # point 0 observed by kf0 (feat 1) and kf1 (feat 2); kf poses differ
        d0 = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)
        d1 = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)
        d1[2] = d0[1]  # same descriptor in both views
        pose1 = np.asarray(se3.exp(jnp.asarray([1.0, 0, 0, 0, 0, 0], jnp.float32)))
        s = s._replace(
            kf_valid=s.kf_valid.at[:2].set(True),
            kf_pose=s.kf_pose.at[1].set(jnp.asarray(pose1)),
            kf_desc=s.kf_desc.at[0].set(jnp.asarray(d0)).at[1].set(jnp.asarray(d1)),
            kf_octave=s.kf_octave.at[0, 1].set(0).at[1, 2].set(0),
            pt_valid=s.pt_valid.at[0].set(True),
            pt_pos=s.pt_pos.at[0].set(jnp.asarray([0.0, 0.0, 6.0])),
            pt_obs_kf=s.pt_obs_kf.at[0, 0].set(0).at[0, 1].set(1),
            pt_obs_feat=s.pt_obs_feat.at[0, 0].set(1).at[0, 1].set(2),
        )
        s2 = update_point_stats(s, 1.2, 8)
        # descriptor = one of the two identical observation descriptors
        assert (np.asarray(s2.pt_desc[0]) == d0[1]).all()
        # normal ~ average viewing direction, unit norm
        nrm = np.asarray(s2.pt_normal[0])
        assert abs(np.linalg.norm(nrm) - 1.0) < 1e-5
        assert nrm[2] > 0.9  # looking along +z
        assert float(s2.pt_max_dist[0]) > float(s2.pt_min_dist[0]) > 0


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        """Map checkpoint restores every bank bit-exactly."""
        from refactored_orb_slam2_tpu.io.checkpoint import load_map, save_map
        from refactored_orb_slam2_tpu.utils.config import (
            CameraConfig, MapConfig, ORBConfig, SystemConfig,
        )
        from refactored_orb_slam2_tpu.system import SlamSystem

        cfg = SystemConfig(
            sensor="rgbd",
            camera=CameraConfig(fx=400.0, fy=400.0, cx=160.0, cy=120.0,
                                bf=80.0, width=320, height=240),
            orb=ORBConfig(n_features=200, n_levels=2),
            map=MapConfig(max_keyframes=8, max_points=256, max_obs_per_point=4),
        )
        sys1 = SlamSystem(cfg)
        # hand-populate a tiny map (no tracking needed for serialization)
        sys1.map = sys1.map._replace(
            kf_valid=sys1.map.kf_valid.at[0].set(True),
            pt_valid=sys1.map.pt_valid.at[:5].set(True),
            pt_pos=sys1.map.pt_pos.at[:5].set(
                jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)),
                            dtype=jnp.float32)
            ),
        )
        sys1.n_kf = 1
        sys1.n_pt = 5
        sys1.culled_chain = {3: (np.eye(4, dtype=np.float32), 1)}
        p = str(tmp_path / "map.npz")
        save_map(p, sys1)

        sys2 = SlamSystem(cfg)
        load_map(p, sys2)
        assert sys2.n_kf == 1 and sys2.n_pt == 5
        np.testing.assert_array_equal(
            np.asarray(sys2.map.pt_pos), np.asarray(sys1.map.pt_pos)
        )
        assert 3 in sys2.culled_chain
        assert sys2.culled_chain[3][1] == 1

    def test_capacity_mismatch_rejected(self, tmp_path):
        from refactored_orb_slam2_tpu.io.checkpoint import load_map, save_map
        from refactored_orb_slam2_tpu.utils.config import (
            CameraConfig, MapConfig, ORBConfig, SystemConfig,
        )
        from refactored_orb_slam2_tpu.system import SlamSystem

        base = dict(
            sensor="rgbd",
            camera=CameraConfig(fx=400.0, fy=400.0, cx=160.0, cy=120.0,
                                bf=80.0, width=320, height=240),
            orb=ORBConfig(n_features=200, n_levels=2),
        )
        cfg1 = SystemConfig(
            map=MapConfig(max_keyframes=8, max_points=256, max_obs_per_point=4),
            **base,
        )
        cfg2 = SystemConfig(
            map=MapConfig(max_keyframes=16, max_points=256, max_obs_per_point=4),
            **base,
        )
        s1 = SlamSystem(cfg1)
        p = str(tmp_path / "map.npz")
        save_map(p, s1)
        s2 = SlamSystem(cfg2)
        import pytest as _pytest
        with _pytest.raises(ValueError, match="capacity mismatch"):
            load_map(p, s2)
