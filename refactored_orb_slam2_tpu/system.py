"""SLAM system facade and tracking orchestrator.

The array-native equivalent of System + Tracking + (synchronous)
LocalMapping (reference: System.cc, Tracking.cc, LocalMapping.cc).  All
dense compute runs in jitted kernels with static shapes; this module is the
thin host-side state machine: sensor dispatch, initialization, the
motion-model / local-map / keyframe-decision sequence, slot counters, and
trajectory logging.

Where the reference runs LocalMapping and LoopClosing on separate threads
with mutex handshakes, this build runs mapping synchronously at keyframe
insertion (correctness-first; the async pipelined dispatch is layered on in
``backend/``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .backend import local_mapping as LM
from .backend import loop_closing as LC
from .frontend.frame import FrameData, build_frame_mono, build_frame_rgbd, build_frame_stereo
from .frontend import tracking_kernels as TK
from .geometry import se3, sim3
from .geometry.camera import Camera
from .models import map_ops
from .models.map_state import (
    MapState, covisibility_matrix, create_empty, update_point_stats,
)
from .ops.image import level_sigma2
from .ops.orb import level_quotas
from .optim import bundle_adjustment as BA
from .optim.pose_opt import optimize_pose
from .utils import telemetry
from .utils.config import SystemConfig, camera_from_config


class TrackState:
    NOT_INITIALIZED = 0
    OK = 1
    LOST = 2


@dataclasses.dataclass
class FrameLog:
    frame_id: int
    timestamp: float
    Tcr: np.ndarray          # pose relative to reference keyframe
    ref_kf: int
    lost: bool


class SlamSystem:
    """End-to-end SLAM engine (stereo / RGB-D; monocular lands with the
    initializer).  Feed frames with track_stereo/track_rgbd; read
    trajectory with export_trajectory_tum/kitti."""

    def __init__(self, config: SystemConfig, async_mapping: bool = False):
        self.cfg = config
        self.async_mapping = async_mapping
        self.cam: Camera = camera_from_config(config.camera)
        self.sensor = config.sensor

        n_slots = sum(
            level_quotas(
                config.orb.n_features, config.orb.n_levels, config.orb.scale_factor
            )
        )
        self.n_feat_slots = n_slots
        self.map: MapState = create_empty(config.map, n_slots)
        self.n_kf = 0
        self.n_pt = 0

        # metric close-point threshold: ThDepth is in baseline units
        self.th_depth_m = (
            config.tracking.th_depth * config.camera.bf / config.camera.fx
            if config.camera.bf > 0 else 0.0
        )
        lv_sigma2 = level_sigma2(config.orb.n_levels, config.orb.scale_factor)
        self.inv_sigma2_table = jnp.asarray(1.0 / lv_sigma2)
        self.scale_factors = np.asarray(
            [config.orb.scale_factor ** i for i in range(config.orb.n_levels)],
            np.float32,
        )

        # place recognition (lazy vocabulary training on first keyframe)
        self.vocab = None
        self.db = None
        self.loop_state = LC.LoopState()
        self.loop_closing_enabled = True

        self.state = TrackState.NOT_INITIALIZED
        self.frame_id = -1
        self.last_frame: Optional[FrameData] = None
        self.last_pose: Optional[jnp.ndarray] = None
        self.last_pt_idx: Optional[jnp.ndarray] = None
        self.velocity: Optional[np.ndarray] = None
        self.ref_kf = 0
        self.last_kf_frame_id = -1
        self.trajectory: list[FrameLog] = []
        self.localization_only = False
        # culled keyframes: slot -> (T_this_to_parent, parent_slot) so the
        # trajectory saver can chain through the spanning tree like the
        # reference (System.cc:372-390)
        self.culled_chain: dict[int, tuple[np.ndarray, int]] = {}

        self._build_jits()
        self.mapper = None
        if async_mapping:
            from .backend.async_mapper import AsyncMapper

            self.mapper = AsyncMapper(self)

    # ------------------------------------------------------------------ jits
    def _build_jits(self):
        cfg = self.cfg
        cam = self.cam

        if self.sensor == "stereo":
            self._jit_frame = jax.jit(
                lambda l, r: build_frame_stereo(l, r, cam, cfg.orb)
            )
        elif self.sensor == "rgbd":
            self._jit_frame = jax.jit(
                lambda im, d: build_frame_rgbd(
                    im, d, cam, cfg.orb, cfg.tracking.depth_map_factor
                )
            )
        else:
            self._jit_frame = jax.jit(lambda im: build_frame_mono(im, cam, cfg.orb))

        self._jit_pose_opt = jax.jit(optimize_pose)
        self._jit_motion_match = jax.jit(
            TK.match_motion_model,
            static_argnames=("th", "nn_max_dist", "nn_ratio"),
        )
        self._jit_select_local = jax.jit(
            TK.select_local_points,
            static_argnames=("budget", "scale_factor", "n_levels"),
        )
        from .ops.pallas_hamming import on_tpu

        self.use_pallas = on_tpu()
        self._jit_match_local = jax.jit(
            TK.match_local_points,
            static_argnames=("th", "nn_ratio", "nn_max_dist", "use_pallas"),
        )
        self._jit_insert_kf = jax.jit(map_ops.insert_keyframe)
        self._jit_create_points = jax.jit(
            map_ops.create_points_from_depth, static_argnames=("max_new", "th_depth")
        )
        self._jit_update_stats = jax.jit(
            update_point_stats, static_argnames=("scale_factor", "n_levels")
        )
        self._jit_covis = jax.jit(covisibility_matrix)
        self._jit_fuse = jax.jit(
            LM.fuse_into_keyframe,
            static_argnames=("budget", "scale_factor", "n_levels", "th", "max_dist"),
        )
        self._jit_cull = jax.jit(
            LM.cull_map_points, static_argnames=("recent_window",)
        )
        self._jit_kf_redundancy = jax.jit(
            LM.keyframe_redundancy, static_argnames=("min_obs",)
        )
        self._jit_remove_kf = jax.jit(LM.remove_keyframe)
        self._jit_triangulate = jax.jit(
            LM.triangulate_with_neighbor,
            static_argnames=("max_new", "scale_factor", "n_levels",
                             "min_baseline_ratio"),
        )
        self._jit_visibility = jax.jit(LM.update_visibility)
        self._jit_build_ba = jax.jit(map_ops.build_ba_problem)
        self._jit_run_ba = jax.jit(
            BA.run,
            static_argnames=("iters_phase1", "iters_phase2", "solver", "n_cg"),
        )
        self._jit_writeback = jax.jit(map_ops.writeback_ba)
        self._jit_gather_ba = jax.jit(
            map_ops.gather_ba_window, static_argnames=("max_kfs", "max_points")
        )
        self._jit_scatter_ba = jax.jit(map_ops.scatter_ba_window)

    # -------------------------------------------------------- facade control
    def activate_localization_mode(self):
        """Track against the frozen map without inserting keyframes
        (System::ActivateLocalizationMode, System.cc:311-319)."""
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    def reset(self):
        """Full system reset: clear map, database, trajectory, counters
        (System::Reset -> Tracking::Reset, Tracking.cc:1365-1409)."""
        self.map = create_empty(self.cfg.map, self.n_feat_slots)
        self.n_kf = 0
        self.n_pt = 0
        self.state = TrackState.NOT_INITIALIZED
        self.last_frame = None
        self.last_pose = None
        self.last_pt_idx = None
        self.velocity = None
        self.ref_kf = 0
        self.last_kf_frame_id = -1
        self.trajectory = []
        self.culled_chain = {}
        self.vocab = None
        self.db = None
        self.loop_state = LC.LoopState()
        self._init_ref = None

    # ------------------------------------------------------------- tracking
    def track_stereo(self, img_l, img_r, timestamp: float) -> Optional[np.ndarray]:
        frame = self._jit_frame(jnp.asarray(img_l), jnp.asarray(img_r))
        return self._track(frame, timestamp)

    def track_rgbd(self, img, depth, timestamp: float) -> Optional[np.ndarray]:
        frame = self._jit_frame(jnp.asarray(img), jnp.asarray(depth))
        return self._track(frame, timestamp)

    def track_monocular(self, img, timestamp: float) -> Optional[np.ndarray]:
        frame = self._jit_frame(jnp.asarray(img))
        return self._track(frame, timestamp)

    def _track(self, frame: FrameData, timestamp: float) -> Optional[np.ndarray]:
        self.frame_id += 1
        jump = getattr(self, "_pending_pose_jump", None)
        if jump is not None:
            # a loop correction landed on the mapper thread: re-anchor
            self.last_pose = self.map.kf_pose[jump]
            self.velocity = None
            self._pending_pose_jump = None
        if self.state == TrackState.NOT_INITIALIZED:
            if self.sensor == "monocular":
                ok = self._initialize_mono(frame)
            else:
                ok = self._initialize_depth(frame)
            if ok:
                self.state = TrackState.OK
                self._log_frame(timestamp, lost=False)
                return np.asarray(self.last_pose)
            return None

        if self.state == TrackState.LOST:
            # auto-reset when lost right after initialization
            # (Tracking.cc:421-428)
            if self.n_kf <= 5 and not self.localization_only:
                self.reset()
                return None
            ok_reloc, pose = self._relocalize(frame)
            if not ok_reloc:
                self._log_frame(timestamp, lost=True)
                return None
            # re-anchor and continue with local-map tracking below
            self.velocity = None
            self.last_pose = pose
            self.last_frame = frame
            self.last_pt_idx = jnp.full((frame.n_slots,), -1, jnp.int32)

        # --- pose prediction + motion-model tracking ----------------------
        pose0 = (
            jnp.asarray(self.velocity) @ self.last_pose
            if self.velocity is not None
            else self.last_pose
        )
        th = 7.0 if self.sensor == "stereo" else 15.0
        pt_idx, n_m = self._motion_track(frame, pose0, th)
        if int(n_m) < 20:  # widen window 2x (Tracking.cc:802)
            pt_idx, n_m = self._motion_track(frame, pose0, 2 * th)

        pose = pose0
        ok = False
        if int(n_m) >= 20:
            # NOTE deliberate divergence from the reference: the velocity
            # prediction seeds only the *matching window*; the optimizer
            # starts from the last pose.  Initializing LM at the
            # extrapolated pose makes the outlier-reclassification rounds
            # bistable — the prediction-consistent fixed point amplifies
            # drift exponentially (gain 2e_t - e_{t-1}); a neutral start
            # always converges to the accurate consensus (50x better ATE
            # on synthetic sequences).
            pose, pt_idx, n_inliers = self._pose_opt_against_map(
                frame, self.last_pose, pt_idx
            )
            ok = int(n_inliers) >= self.cfg.tracking.min_inliers_track

        if not ok:
            # fall back: track against reference keyframe features (BoW-free:
            # plain descriptor matching with a loose window)
            pt_idx, n_m = self._motion_track(frame, self.last_pose, 4 * th)
            if int(n_m) >= 15:
                pose, pt_idx, n_inl = self._pose_opt_against_map(
                    frame, self.last_pose, pt_idx
                )
                ok = int(n_inl) >= self.cfg.tracking.min_inliers_track

        if not ok:
            self.state = TrackState.LOST
            self._log_frame(timestamp, lost=True)
            return None

        # --- track local map ----------------------------------------------
        pose, pt_idx, n_map_inliers = self._track_local_map(frame, pose, pt_idx)
        if int(n_map_inliers) < self.cfg.tracking.min_inliers_local_map:
            self.state = TrackState.LOST
            self._log_frame(timestamp, lost=True)
            return None

        # --- bookkeeping ---------------------------------------------------
        new_vel = np.asarray(pose @ se3.inv(self.last_pose))
        self.velocity = new_vel
        self.last_pose = pose
        self.last_frame = frame
        self.last_pt_idx = pt_idx
        self.state = TrackState.OK

        if not self.localization_only and self._need_new_keyframe(frame, pt_idx, int(n_map_inliers)):
            self._create_keyframe(frame, pose, pt_idx)

        self._log_frame(timestamp, lost=False)
        return np.asarray(pose)

    # ----------------------------------------------------------- sub-steps
    def _motion_track(self, frame, pose0, th):
        res = self._jit_motion_match(
            self.cam, pose0, frame,
            self.last_frame.xy, self.last_pt_idx, self.last_frame.octave,
            self.map.pt_pos, self.map.pt_valid, self.map.pt_desc,
            self.last_frame.angle,
            th=float(th), scale_factors=self.scale_factors,
            nn_max_dist=75,
        )
        return res.pt_idx, res.n_matches

    def _pose_opt_against_map(self, frame, pose0, pt_idx):
        valid = pt_idx >= 0
        pw = self.map.pt_pos[jnp.clip(pt_idx, 0)]
        inv_s2 = jnp.take(
            self.inv_sigma2_table,
            jnp.clip(frame.octave, 0, len(self.scale_factors) - 1),
        )
        is_stereo = frame.uvr[:, 2] >= 0
        result = self._jit_pose_opt(
            self.cam, pose0, pw, frame.uvr, inv_s2, valid, is_stereo
        )
        new_pt_idx = jnp.where(result.inlier, pt_idx, -1)
        return result.Tcw, new_pt_idx, result.n_inliers

    def _track_local_map(self, frame, pose, pt_idx):
        P = self.map.pt_pos.shape[0]
        scatter_idx = jnp.where(pt_idx >= 0, pt_idx, P)
        already = jnp.zeros(P, bool).at[scatter_idx].set(True, mode="drop")
        local = self._jit_select_local(
            self.cam, pose,
            self.map.pt_pos, self.map.pt_valid, self.map.pt_normal,
            self.map.pt_min_dist, self.map.pt_max_dist, already,
            budget=4096, scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
        )
        res = self._jit_match_local(
            frame, local, self.map.pt_desc, pt_idx,
            th=1.0, scale_factors=self.scale_factors,
            use_pallas=self.use_pallas,
        )
        pose, pt_idx, n_inl = self._pose_opt_against_map(frame, pose, res.pt_idx)
        # visibility/found statistics feed MapPointCulling
        self.map = self._jit_visibility(self.map, local.idx, pt_idx)
        return pose, pt_idx, n_inl

    # ------------------------------------------------------- initialization
    def _initialize_depth(self, frame) -> bool:
        """Stereo/RGB-D bootstrap (Tracking::StereoInitialization,
        Tracking.cc:454-503): need >=500 features, create points for all
        features with depth."""
        n_valid = int(jnp.sum(frame.valid))
        # reference demands >500 features at a 1000+ budget
        # (Tracking.cc:457); scale with the configured budget
        need = min(500, int(0.6 * self.n_feat_slots))
        if n_valid < need or self.sensor == "monocular":
            return False
        # pre-check the depth yield BEFORE touching the map: a failed
        # attempt must not leak keyframe slots or landmarks
        n_depth = int(jnp.sum(frame.depth > 0))
        if n_depth < 100:
            return False
        pose = jnp.eye(4, dtype=jnp.float32)
        kf_slot = self._insert_keyframe_arrays(
            frame, pose, jnp.full((frame.n_slots,), -1, jnp.int32), parent=-1
        )
        self.map, n_new = self._jit_create_points(
            self.map, jnp.int32(kf_slot), frame.depth,
            jnp.full((frame.n_slots,), -1, jnp.int32),
            self.cam,
            th_depth=float(1e9),   # init: all depths (Tracking.cc:476)
            pt_base=jnp.int32(self.n_pt),
            max_new=self.n_feat_slots,
        )
        self.n_pt += int(n_new)
        self.map = self._jit_update_stats(
            self.map, scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
        )
        self.last_pose = pose
        self.last_frame = frame
        self.last_pt_idx = self.map.kf_point_idx[kf_slot]
        self.ref_kf = kf_slot
        self.last_kf_frame_id = self.frame_id
        return True

    def _initialize_mono(self, frame) -> bool:
        """Monocular two-view bootstrap (Tracking::MonocularInitialization +
        CreateInitialMapMonocular, Tracking.cc:505-666): level-0 windowed
        matching against a stored reference frame, batched H/F RANSAC,
        triangulated initial map, init BA, median-depth scale normalization.
        """
        from .geometry import camera as cam_mod
        from .solvers.initializer import initialize_two_view
        from .optim import bundle_adjustment as BAmod

        n_valid = int(jnp.sum(frame.valid))
        if getattr(self, "_init_ref", None) is None:
            if n_valid >= 100:
                self._init_ref = frame
            return False
        if n_valid < 100:
            self._init_ref = None
            return False
        ref = self._init_ref

        # SearchForInitialization (ORBmatcher.cc:388-492): window 100 px,
        # level 0 only, ratio 0.9, duplicate stealing ~ mutual best
        from .ops.descriptors import hamming as _ham
        from .ops import matching as M

        dist = _ham(ref.desc, frame.desc)
        geo = M.window_mask(ref.xy, frame.xy, 100.0)
        # reference restricts to level 0 but doubles the feature budget for
        # init frames (Tracking.cc:121); with the normal budget we admit
        # levels 0-1 instead
        geo = geo & (ref.octave[:, None] <= 1) & (frame.octave[None, :] <= 1)
        res = M.nn_match(
            dist, row_valid=ref.valid, col_valid=frame.valid,
            extra_mask=geo, max_dist=50, ratio=0.9, mutual=True,
        )
        keep = M.rotation_consistency_mask(ref.angle, frame.angle, res)
        n_matches = int(jnp.sum(keep))
        if n_matches < 60:
            self._init_ref = frame  # restart with this frame (Tracking.cc:540)
            return False

        xn1 = cam_mod.pixel_to_normalized(self.cam, ref.xy)
        xn2_all = cam_mod.pixel_to_normalized(self.cam, frame.xy)
        xn2 = xn2_all[jnp.clip(res.idx, 0)]
        init = initialize_two_view(
            xn1, xn2, keep, jax.random.PRNGKey(self.frame_id),
            sigma_px=1.0, focal=float(self.cfg.camera.fx),
        )
        if not bool(init.success):
            return False

        # median-depth normalization (Tracking.cc:618-642)
        good = np.asarray(init.inliers)
        p3d = np.asarray(init.points3d)
        med_depth = float(np.median(p3d[good][:, 2]))
        if med_depth <= 0:
            self._init_ref = None
            return False
        scale = 1.0 / med_depth
        p3d = p3d * scale
        R21 = np.asarray(init.R21)
        t21 = np.asarray(init.t21) * scale
        T1 = jnp.eye(4, dtype=jnp.float32)
        T2 = jnp.asarray(se3.from_rt(jnp.asarray(R21), jnp.asarray(t21)))

        # insert both keyframes
        kf0 = self._insert_keyframe_arrays(ref, T1,
            jnp.full((ref.n_slots,), -1, jnp.int32), parent=-1)
        kf1 = self._insert_keyframe_arrays(frame, T2,
            jnp.full((frame.n_slots,), -1, jnp.int32), parent=kf0)

        # create the triangulated points with observations in both KFs
        good_idx = np.where(good)[0]
        n_new = len(good_idx)
        P_cap = self.map.pt_pos.shape[0]
        slots = np.arange(self.n_pt, self.n_pt + n_new)
        m = self.map
        feat0 = good_idx.astype(np.int32)
        feat1 = np.asarray(res.idx)[good_idx].astype(np.int32)
        desc = np.asarray(ref.desc)[feat0]
        pos = p3d[good_idx]
        dist_v = np.linalg.norm(pos, axis=1)
        normal = pos / np.maximum(dist_v, 1e-9)[:, None]
        octv = np.asarray(ref.octave)[feat0].astype(np.float32)
        sfac = self.cfg.orb.scale_factor
        max_d = dist_v * sfac ** octv
        min_d = max_d / sfac ** (self.cfg.orb.n_levels - 1)
        m = m._replace(
            pt_pos=m.pt_pos.at[slots].set(jnp.asarray(pos)),
            pt_valid=m.pt_valid.at[slots].set(True),
            pt_desc=m.pt_desc.at[slots].set(jnp.asarray(desc)),
            pt_normal=m.pt_normal.at[slots].set(jnp.asarray(normal)),
            pt_min_dist=m.pt_min_dist.at[slots].set(jnp.asarray(min_d)),
            pt_max_dist=m.pt_max_dist.at[slots].set(jnp.asarray(max_d)),
            pt_ref_kf=m.pt_ref_kf.at[slots].set(kf1),
            pt_first_kf=m.pt_first_kf.at[slots].set(kf0),
            pt_obs_kf=m.pt_obs_kf.at[slots, 0].set(kf0).at[slots, 1].set(kf1),
            pt_obs_feat=m.pt_obs_feat.at[slots, 0].set(jnp.asarray(feat0))
                                    .at[slots, 1].set(jnp.asarray(feat1)),
        )
        kf_pt0 = m.kf_point_idx[kf0].at[jnp.asarray(feat0)].set(jnp.asarray(slots, dtype=jnp.int32))
        kf_pt1 = m.kf_point_idx[kf1].at[jnp.asarray(feat1)].set(jnp.asarray(slots, dtype=jnp.int32))
        m = m._replace(kf_point_idx=m.kf_point_idx.at[kf0].set(kf_pt0).at[kf1].set(kf_pt1))
        self.map = m
        self.n_pt += n_new

        # init global BA, 20 iterations (Tracking.cc:618)
        window = jnp.zeros(self.map.kf_valid.shape[0], bool).at[kf1].set(True)
        fixed = jnp.zeros_like(window).at[kf0].set(True)
        self._windowed_ba(window, fixed, 20, 0)
        self.map = self._jit_update_stats(
            self.map, scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
        )
        self.last_pose = self.map.kf_pose[kf1]
        self.last_frame = frame
        self.last_pt_idx = self.map.kf_point_idx[kf1]
        self.ref_kf = kf1
        self.last_kf_frame_id = self.frame_id
        self._init_ref = None
        return True

    # ----------------------------------------------------------- keyframes
    def _need_new_keyframe(self, frame, pt_idx, n_inliers: int) -> bool:
        """Adapted NeedNewKeyFrame (Tracking.cc:880-962)."""
        if self.n_kf >= self.cfg.map.max_keyframes - 2:
            telemetry.warn(
                "kf_capacity",
                f"keyframe bank full ({self.n_kf}/{self.cfg.map.max_keyframes})"
                " — no further keyframes will be inserted; raise "
                "MapConfig.max_keyframes",
            )
            return False
        # reference gates insertion on local mapping being idle
        # (Tracking.cc:902 bLocalMappingIdle)
        if self.mapper is not None and not self.mapper.idle:
            return False
        frames_since = self.frame_id - self.last_kf_frame_id
        # reference-match count = points in ref KF (proxy: current inliers vs
        # ref KF's point count)
        ref_matches = int(
            jnp.sum((self.map.kf_point_idx[self.ref_kf] >= 0).astype(jnp.int32))
        )
        th_ratio = 0.75 if self.sensor != "monocular" else 0.9

        need_close = False
        if self.sensor != "monocular":
            d = np.asarray(frame.depth)
            pid = np.asarray(pt_idx)
            close = (d > 0) & (d < self.th_depth_m)
            tracked_close = int((close & (pid >= 0)).sum())
            untracked_close = int((close & (pid < 0)).sum())
            need_close = tracked_close < 100 and untracked_close > 70

        c1a = frames_since >= self.cfg.tracking.max_frames_between_kf
        c1b = frames_since >= self.cfg.tracking.min_frames_between_kf
        c1c = self.sensor != "monocular" and (
            n_inliers < ref_matches * 0.25 or need_close
        )
        c2 = (n_inliers < ref_matches * th_ratio or need_close) and n_inliers > 15
        return bool((c1a or c1b or c1c) and c2)

    def _insert_keyframe_arrays(self, frame, pose, matched_pt, parent) -> int:
        kf_slot = self.n_kf
        self.map = self._jit_insert_kf(
            self.map, jnp.int32(kf_slot), jnp.int32(self.frame_id), pose,
            frame.xy, frame.uvr, frame.octave, frame.angle, frame.desc,
            frame.valid, matched_pt, jnp.int32(parent),
        )
        self.n_kf += 1
        self._register_keyframe_bow(kf_slot, frame)
        return kf_slot

    def _register_keyframe_bow(self, kf_slot, frame):
        """Train the vocabulary lazily on the first keyframe's descriptors,
        then add every keyframe's tf-idf signature to the database."""
        from .place.vocab import train_vocabulary
        from .place.keyframe_db import KeyFrameDB

        if self.vocab is None:
            descs = np.asarray(frame.desc)[np.asarray(frame.valid)]
            n_words = min(256, max(32, len(descs) // 4))
            self.vocab = train_vocabulary(descs, n_words=n_words, iters=4)
            self.db = KeyFrameDB(self.vocab, self.cfg.map.max_keyframes)
        self.db.add(kf_slot, frame.desc, frame.valid)

    def _create_keyframe(self, frame, pose, pt_idx):
        kf_slot = self._insert_keyframe_arrays(frame, pose, pt_idx, parent=self.ref_kf)
        # stereo/RGB-D: create close points for untracked features
        if self.sensor != "monocular":
            cap = self.map.pt_pos.shape[0]
            if self.n_pt >= cap - 128:
                telemetry.warn(
                    "pt_capacity",
                    f"map-point bank full ({self.n_pt}/{cap}) — close-point "
                    "creation suspended; raise MapConfig.max_points",
                )
            else:
                self.map, n_new = self._jit_create_points(
                    self.map, jnp.int32(kf_slot), frame.depth, pt_idx, self.cam,
                    th_depth=float(self.th_depth_m),
                    pt_base=jnp.int32(self.n_pt), max_new=128,
                )
                self.n_pt += int(n_new)
        self.ref_kf = kf_slot
        self.last_kf_frame_id = self.frame_id
        self.last_pt_idx = self.map.kf_point_idx[kf_slot]
        if self.mapper is not None:
            self.mapper.submit(kf_slot)
        else:
            self._mapping_pipeline(kf_slot)

    def _mapping_pipeline(self, kf_slot: int):
        """Keyframe-rate mapping work (the LocalMapping::Run body +
        LoopClosing::Run, LocalMapping.cc:44-104): triangulate, fuse, cull,
        refresh statistics, local BA, keyframe culling, loop closing.
        Runs synchronously or on the AsyncMapper thread."""
        # triangulate new landmarks with covisible neighbours
        # (CreateNewMapPoints; mono's only source of new points)
        self._triangulate_new_points(kf_slot)
        # fuse duplicates (SearchInNeighbors) and cull weak points
        self.map = self._jit_fuse(
            self.map, jnp.int32(kf_slot), self.cam,
            budget=2048, scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
        )
        self.map = self._jit_cull(self.map, jnp.int32(kf_slot))
        self.map = self._jit_update_stats(
            self.map, scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
        )
        self._local_ba(kf_slot)
        self._cull_keyframes(kf_slot)
        if self.loop_closing_enabled:
            self._try_close_loop(kf_slot)

    def _triangulate_new_points(self, kf_slot: int, n_neighbors: int = 6):
        if self.n_kf < 2:
            return
        covis = self._jit_covis(self.map)
        row = np.asarray(covis[kf_slot])
        neighbors = np.argsort(-row)[:n_neighbors]
        # mono requires a baseline >= 1% of median depth (LocalMapping.cc:219)
        min_bl = 0.01 if self.sensor == "monocular" else 0.005
        cap = self.map.pt_pos.shape[0]
        for nb in neighbors:
            if self.n_pt >= cap - 64:
                telemetry.warn(
                    "pt_capacity",
                    f"map-point bank full ({self.n_pt}/{cap}) — triangulation "
                    "suspended; raise MapConfig.max_points",
                )
                break
            if row[nb] <= 15:
                continue
            self.map, n_new = self._jit_triangulate(
                self.map, jnp.int32(kf_slot), jnp.int32(int(nb)), self.cam,
                jnp.int32(self.n_pt), max_new=64,
                scale_factor=self.cfg.orb.scale_factor,
                n_levels=self.cfg.orb.n_levels,
                min_baseline_ratio=min_bl,
            )
            self.n_pt += int(n_new)

    # ------------------------------------------------------------ local BA
    def _windowed_ba(self, window_mask, fixed_mask, iters1: int, iters2: int):
        """Compact-window BA: gather the covisibility subgraph into small
        static arrays, dense Schur solve, scatter results back.  Cost scales
        with the window, not with map capacity."""
        mcfg = self.cfg.map
        prob, kf_sel, pt_sel, n_pt_in = self._jit_gather_ba(
            self.map, window_mask, fixed_mask, self.inv_sigma2_table,
            max_kfs=mcfg.local_ba_max_kfs, max_points=mcfg.local_ba_max_points,
        )
        if int(n_pt_in) > mcfg.local_ba_max_points:
            telemetry.warn(
                "local_ba_point_overflow",
                f"local BA window has {int(n_pt_in)} points; only "
                f"{mcfg.local_ba_max_points} optimized (raise "
                f"MapConfig.local_ba_max_points)",
            )
        result = self._jit_run_ba(
            self.cam, prob, iters_phase1=iters1, iters_phase2=iters2
        )
        self.map = self._jit_scatter_ba(
            self.map, prob, kf_sel, pt_sel,
            result.kf_poses, result.points, result.obs_valid,
        )

    def _global_ba(self, window_mask, fixed_mask, iters: int):
        """Full-map BA with the matrix-free Schur-PCG solver
        (Optimizer::GlobalBundleAdjustemnt, Optimizer.cc:43-50): no window
        compaction, memory stays O(P*O) — the (K,K) Schur fill-in is never
        materialized."""
        prob = self._jit_build_ba(
            self.map, window_mask, fixed_mask, self.inv_sigma2_table
        )
        result = self._jit_run_ba(
            self.cam, prob, iters_phase1=iters, iters_phase2=0,
            solver="pcg", n_cg=self.cfg.map.gba_cg_iters,
        )
        self.map = self._jit_writeback(
            self.map, result.kf_poses, result.points, result.obs_valid, prob
        )

    def _local_ba(self, kf_slot: int):
        """Covisibility-window BA (Optimizer::LocalBundleAdjustment)."""
        if self.n_kf < 3:
            return
        covis = self._jit_covis(self.map)
        row = np.asarray(covis[kf_slot])
        window = np.zeros(row.shape[0], bool)
        window[kf_slot] = True
        neighbors = np.argsort(-row)[:20]
        window[neighbors[row[neighbors] > 0]] = True
        window[0] = False  # never move the origin keyframe
        window_mask = jnp.asarray(window)
        # fixed: any valid KF not in window that observes window points
        # (gather_ba_window keeps the most-constraining boundary KFs)
        fixed_mask = jnp.asarray(~window) & self.map.kf_valid
        self._windowed_ba(window_mask, fixed_mask, 5, 10)
        # keep the tracker's pose consistent with the adjusted keyframe
        # (only safe when mapping runs on the tracking thread; the async
        # mapper must not move the live pose out from under the tracker)
        if self.mapper is None:
            self.last_pose = self.map.kf_pose[kf_slot]

    def _cull_keyframes(self, kf_slot: int):
        """KeyFrameCulling: drop covisible keyframes with >= 90% redundant
        landmarks (LocalMapping.cc:595-655)."""
        if self.n_kf < 5:
            return
        covis = np.asarray(self._jit_covis(self.map))
        candidates = np.where(covis[kf_slot] >= 15)[0]
        parents = np.asarray(self.map.kf_parent)
        for cand in candidates:
            cand = int(cand)
            if cand == 0 or cand == kf_slot or cand == self.ref_kf:
                continue
            ratio = float(self._jit_kf_redundancy(self.map, jnp.int32(cand)))
            if ratio < 0.9:
                continue
            parent = int(parents[cand])
            if parent < 0:
                continue
            T_cp = np.asarray(
                self.map.kf_pose[cand] @ se3.inv(self.map.kf_pose[parent])
            )
            self.culled_chain[cand] = (T_cp, parent)
            # re-parent children to the culled keyframe's parent
            children = np.where(parents == cand)[0]
            new_parent = self.map.kf_parent
            for ch in children:
                new_parent = new_parent.at[int(ch)].set(parent)
            self.map = self.map._replace(kf_parent=new_parent)
            self.map = self._jit_remove_kf(self.map, jnp.int32(cand))
            if self.db is not None:
                self.db.erase(cand)
            parents = np.asarray(self.map.kf_parent)

    # -------------------------------------------------------- relocalization
    def _relocalize(self, frame) -> tuple[bool, Optional[jnp.ndarray]]:
        """Relocalization after tracking loss (Tracking.cc:1217-1363):
        BoW candidate keyframes -> descriptor matching against their
        landmark-holding features -> batched EPnP RANSAC -> pose
        optimization, accept at >= 30 inliers (the reference polishes to
        50 with projection rescue; our local-map pass afterwards plays
        that role)."""
        from .place.keyframe_db import detect_reloc_candidates
        from .solvers.epnp import epnp_ransac
        from .geometry import camera as cam_mod
        from .ops.descriptors import hamming as _ham
        from .ops import matching as M

        if self.db is None:
            return False, None
        bow = self.db.signature_of(frame.desc, frame.valid)
        cands, _ = detect_reloc_candidates(self.db, bow)
        for cand in np.asarray(cands):
            if cand < 0:
                continue
            cand = int(cand)
            pt_idx_kf = self.map.kf_point_idx[cand]
            has_pt = (pt_idx_kf >= 0) & self.map.kf_feat_valid[cand]
            dist = _ham(self.map.kf_desc[cand], frame.desc)
            res = M.nn_match(
                dist, row_valid=has_pt, col_valid=frame.valid,
                max_dist=50, ratio=0.75, mutual=True,
            )
            if int(jnp.sum(res.mask)) < 15:
                continue
            pw = self.map.pt_pos[jnp.clip(pt_idx_kf, 0)]
            xn = cam_mod.pixel_to_normalized(
                self.cam, frame.xy[jnp.clip(res.idx, 0)]
            )
            sigma2 = (1.0 / float(self.cfg.camera.fx)) ** 2
            pnp = epnp_ransac(
                pw, xn, res.mask, jax.random.PRNGKey(self.frame_id),
                sigma2=sigma2, chi2_th=5.991, min_inliers=10,
            )
            if not bool(pnp.success):
                continue
            # pose optimization on the EPnP inlier associations
            pt_of_feat = jnp.full((frame.n_slots,), -1, jnp.int32)
            col = jnp.where(res.mask & pnp.inliers, res.idx, frame.n_slots)
            pt_of_feat = pt_of_feat.at[col].set(
                jnp.where(res.mask & pnp.inliers, pt_idx_kf, -1).astype(jnp.int32),
                mode="drop",
            )
            pose, pt_idx, n_inl = self._pose_opt_against_map(
                frame, pnp.Tcw, pt_of_feat
            )
            if int(n_inl) >= 15:
                self.ref_kf = cand
                self.state = TrackState.OK
                self.last_pt_idx = pt_idx
                return True, pose
        return False, None

    # ---------------------------------------------------------- loop closing
    def _try_close_loop(self, kf_slot: int) -> bool:
        """Detect and correct a loop at keyframe ``kf_slot``
        (LoopClosing::Run body, synchronous)."""
        if self.db is None or self.n_kf < self.cfg.loop.kf_gap + 2:
            return False
        covis = np.asarray(self._jit_covis(self.map))
        bow = self.db.bow[kf_slot]
        cands = LC.detect(
            self.loop_state, self.db, covis, kf_slot, bow,
            kf_gap=self.cfg.loop.kf_gap,
            consistency_th=self.cfg.loop.covisibility_consistency_th,
        )
        for cand in cands:
            ok, R_cm, t_cm, s_cm, pairs = LC.compute_sim3(
                self.map, self.cam, kf_slot, cand,
                fix_scale=self.sensor != "monocular",
                key=jax.random.PRNGKey(self.frame_id),
                min_inliers=self.cfg.loop.min_bow_matches,
            )
            if not ok:
                continue
            # final acceptance: project the loop neighbourhood's landmarks
            # through the corrected Sim3 and demand enough total matches
            # (LoopClosing.cc:330-373, >= 40)
            old_pose = np.asarray(self.map.kf_pose[cand])
            S_mw = (jnp.asarray(old_pose[:3, :3]), jnp.asarray(old_pose[:3, 3]),
                    jnp.asarray(1.0, jnp.float32))
            S_cw = sim3.compose(
                jnp.asarray(R_cm), jnp.asarray(t_cm),
                jnp.asarray(np.float32(s_cm)), *S_mw,
            )
            group_mask = jnp.asarray(
                (covis[cand] >= 15) | (np.arange(covis.shape[0]) == cand)
            ) & self.map.kf_valid
            n_total = LC.count_loop_projection_matches(
                self.map, self.cam, kf_slot, group_mask, *S_cw,
            ) + len(pairs)
            if n_total < self.cfg.loop.min_total_matches:
                continue
            self._correct_loop(kf_slot, cand, R_cm, t_cm, s_cm)
            return True
        return False

    def _correct_loop(self, kf_cur: int, kf_loop: int, R_cm, t_cm, s_cm):
        """CorrectLoop (LoopClosing.cc:375-563): Sim3 propagation through
        the covisible group, essential-graph optimization, point correction,
        global BA."""
        from .optim import pose_graph as PG

        K = self.map.kf_pose.shape[0]
        kf_valid = np.asarray(self.map.kf_valid)
        covis = np.asarray(self._jit_covis(self.map))
        old_pose = np.asarray(self.map.kf_pose)
        old_R = jnp.asarray(old_pose[:, :3, :3])
        old_t = jnp.asarray(old_pose[:, :3, 3])
        old_s = jnp.ones(K, jnp.float32)

        # corrected Sim3 of the current keyframe: S_cw = S_cm * S_mw
        S_mw = (jnp.asarray(old_pose[kf_loop, :3, :3]),
                jnp.asarray(old_pose[kf_loop, :3, 3]),
                jnp.asarray(1.0, jnp.float32))
        S_cw = sim3.compose(jnp.asarray(R_cm), jnp.asarray(t_cm),
                            jnp.asarray(np.float32(s_cm)), *S_mw)

        # propagate to the covisible group (LoopClosing.cc:413-470)
        group = {kf_cur} | {
            int(i) for i in np.where(covis[kf_cur] >= 15)[0] if kf_valid[i]
        }
        new_R = old_R
        new_t = old_t
        new_s = old_s
        T_cw_old = jnp.asarray(old_pose[kf_cur])
        for i in sorted(group):
            T_ic = jnp.asarray(old_pose[i]) @ se3.inv(T_cw_old)
            S_iw = sim3.compose(
                T_ic[:3, :3], T_ic[:3, 3], jnp.asarray(1.0, jnp.float32), *S_cw
            )
            new_R = new_R.at[i].set(S_iw[0])
            new_t = new_t.at[i].set(S_iw[1])
            new_s = new_s.at[i].set(S_iw[2])

        # essential-graph edges from pre-correction poses + the loop edge
        kf_parent = np.asarray(self.map.kf_parent)
        loop_pairs = [(kf_loop, kf_cur)]
        for k in range(self.n_kf):
            for le in np.asarray(self.map.kf_loop_edges[k]):
                if le >= 0 and le > k:
                    loop_pairs.append((k, int(le)))
        edges = LC.build_essential_graph_edges(
            kf_parent, covis, kf_valid, loop_pairs[1:],
            old_R, old_t, old_s,
            min_covis_weight=self.cfg.map.ess_graph_min_weight,
        )
        # append the new loop edge with its measured Sim3: M_ji with i=loop,
        # j=cur corrected: M = S_cw_corrected * S_mw^-1 = S_cm
        loop_edge = PG.PoseGraphEdges(
            i=jnp.asarray([kf_loop], jnp.int32),
            j=jnp.asarray([kf_cur], jnp.int32),
            R=jnp.asarray(R_cm)[None],
            t=jnp.asarray(t_cm)[None],
            s=jnp.asarray([np.float32(s_cm)]),
            weight=jnp.asarray([1.0], jnp.float32),
            valid=jnp.asarray([True]),
        )
        edges = PG.PoseGraphEdges(*[
            jnp.concatenate([a, b], axis=0) for a, b in zip(edges, loop_edge)
        ])

        node_valid = jnp.asarray(kf_valid)
        node_fixed = jnp.zeros(K, bool).at[kf_loop].set(True)
        # initial values: corrected poses for the group, old elsewhere
        opt_R, opt_t, opt_s = PG.optimize_pose_graph(
            new_R, new_t, new_s, node_valid, node_fixed, edges,
            fix_scale=self.sensor != "monocular",
        )

        # correct landmarks through their reference keyframes, then convert
        # Sim3 nodes back to SE3 poses (t/s, LoopClosing.cc:488)
        new_pts = PG.correct_points_after_pose_graph(
            self.map.pt_pos, self.map.pt_ref_kf, old_R, old_t, old_s,
            opt_R, opt_t, opt_s,
        )
        se3_t = opt_t / opt_s[:, None]
        new_poses = jax.vmap(se3.from_rt)(opt_R, se3_t)
        keep_old = ~jnp.asarray(kf_valid)
        new_poses = jnp.where(
            keep_old[:, None, None], self.map.kf_pose, new_poses
        )
        self.map = self.map._replace(
            kf_pose=new_poses,
            pt_pos=jnp.where(self.map.pt_valid[:, None], new_pts, self.map.pt_pos),
            kf_loop_edges=self.map.kf_loop_edges.at[kf_cur, 0].set(kf_loop),
        )
        self.loop_state.last_loop_kf = kf_cur
        if self.mapper is None:
            self.last_pose = self.map.kf_pose[kf_cur]
            self.velocity = None
        else:
            # tracker applies the corrected pose at its next frame boundary
            self._pending_pose_jump = kf_cur

        # fuse loop-side landmarks into the corrected neighbourhood, then
        # global BA (10 iters, RunGlobalBundleAdjustment semantics)
        self.map = self._jit_fuse(
            self.map, jnp.int32(kf_cur), self.cam,
            budget=2048, scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
        )
        window = jnp.asarray(kf_valid) & (jnp.arange(K) != 0)
        fixed = jnp.zeros(K, bool).at[0].set(True)
        self._global_ba(window, fixed, iters=10)
        self.map = self._jit_update_stats(
            self.map, scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
        )
        if self.mapper is None:
            self.last_pose = self.map.kf_pose[kf_cur]

    # ----------------------------------------------------------- trajectory
    def _log_frame(self, timestamp, lost: bool):
        Tcr = np.asarray(self.last_pose @ se3.inv(self.map.kf_pose[self.ref_kf]))
        self.trajectory.append(
            FrameLog(self.frame_id, timestamp, Tcr, self.ref_kf, lost)
        )

    def _resolve_kf_pose(self, kf: int, kf_poses: np.ndarray) -> np.ndarray:
        """Pose of a (possibly culled) keyframe, chaining relative
        transforms through the spanning tree (System.cc:372-390)."""
        chain = np.eye(4, dtype=np.float32)
        seen = 0
        while kf in self.culled_chain and seen < 64:
            T_cp, parent = self.culled_chain[kf]
            chain = chain @ T_cp
            kf = parent
            seen += 1
        return chain @ kf_poses[kf]

    def shutdown(self):
        """Drain the mapping thread (System::Shutdown, System.cc:336-353)."""
        if self.mapper is not None:
            self.mapper.wait_idle(timeout=300)
            self.mapper.shutdown()
            self.mapper = None

    def frame_poses(self) -> np.ndarray:
        """(n, 4, 4) Tcw per tracked frame, recomposed through current KF
        poses (System::SaveTrajectoryTUM semantics, System.cc:355-415)."""
        kf_poses = np.asarray(self.map.kf_pose)
        out = []
        for log in self.trajectory:
            if log.lost:
                out.append(out[-1] if out else np.eye(4, dtype=np.float32))
                continue
            out.append(log.Tcr @ self._resolve_kf_pose(log.ref_kf, kf_poses))
        if not out:
            return np.zeros((0, 4, 4), dtype=np.float32)
        return np.stack(out)

    def camera_centers(self) -> np.ndarray:
        poses = self.frame_poses()
        return np.stack([-(T[:3, :3].T @ T[:3, 3]) for T in poses])

    def export_trajectory_tum(self, path: str):
        poses = self.frame_poses()
        with open(path, "w") as f:
            for log, Tcw in zip(self.trajectory, poses):
                Twc = np.linalg.inv(Tcw)
                q = np.asarray(se3.to_quaternion(jnp.asarray(Twc[:3, :3])))
                t = Twc[:3, 3]
                f.write(
                    f"{log.timestamp:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
                )

    def export_keyframe_trajectory_tum(self, path: str):
        """Keyframe-only trajectory (System::SaveKeyFrameTrajectoryTUM,
        System.cc:417-450)."""
        kf_poses = np.asarray(self.map.kf_pose)
        kf_valid = np.asarray(self.map.kf_valid)
        kf_fid = np.asarray(self.map.kf_frame_id)
        ts_by_fid = {log.frame_id: log.timestamp for log in self.trajectory}
        with open(path, "w") as f:
            for k in range(self.n_kf):
                if not kf_valid[k]:
                    continue
                Twc = np.linalg.inv(kf_poses[k])
                q = np.asarray(se3.to_quaternion(jnp.asarray(Twc[:3, :3])))
                t = Twc[:3, 3]
                ts = ts_by_fid.get(int(kf_fid[k]), 0.0)
                f.write(
                    f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
                )

    def export_trajectory_kitti(self, path: str):
        poses = self.frame_poses()
        with open(path, "w") as f:
            for Tcw in poses:
                Twc = np.linalg.inv(Tcw)
                row = Twc[:3, :4].reshape(-1)
                f.write(" ".join(f"{v:.9e}" for v in row) + "\n")
