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
import time
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


# -------- compact host<->device frame encoding (transfer-bandwidth bound) ---
def _encode_img(img) -> np.ndarray:
    """Host-side: grayscale float [0,255] -> uint8 (0.25 MB more per frame
    of quantization noise is ~0.5 intensity, far below sensor noise)."""
    a = np.asarray(img)
    if a.dtype == np.uint8:
        return a
    return np.clip(a, 0.0, 255.0).astype(np.uint8)


def _encode_depth(depth) -> np.ndarray:
    """Host-side: metric depth -> uint16 millimeters (1 mm / 65 m range)."""
    a = np.asarray(depth)
    if a.dtype == np.uint16:
        return a
    return np.clip(a * 1000.0, 0.0, 65535.0).astype(np.uint16)


def _decode_img(x):
    return x.astype(jnp.float32)


def _decode_depth(x):
    return x.astype(jnp.float32) * jnp.float32(1e-3)


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

    def __init__(self, config: SystemConfig, async_mapping: bool = False,
                 pipelined: bool = False, pipeline_depth: int = 1,
                 cooperative_mapping: bool = False):
        # SLAM geometry needs full f32 matmuls: with the TPU default
        # (bf16 inputs), pose-optimization normal equations and descriptor
        # intensity differences lose enough precision that tracking margins
        # collapse (verified on the TUM fixture: identical input tracks
        # 600/600 on CPU f32 and loses 125 frames on-chip at bf16 default).
        # MXU f32 costs ~3x bf16 on these small matmuls — negligible next
        # to the correctness cliff.
        import jax as _jax

        _jax.config.update("jax_default_matmul_precision", "highest")
        self.cfg = config
        self.async_mapping = async_mapping
        # optimistic dispatch (SURVEY §7 "async dispatch ahead of frame
        # arrival"): track_* returns the pose as a lazy device array and
        # resolves the frame's gates while later frames compute.  Depth 1
        # commits the previous frame before each dispatch (bit-identical to
        # sync mode); deeper pipelines amortize the host<->device round
        # trip over ``pipeline_depth`` frames — required to beat the ~25 ms
        # tunnel RTT — at the cost of keyframe decisions landing up to
        # depth-1 frames late (the reference's tracker reads the mapping
        # thread's output with the same kind of lag).
        self.pipelined = pipelined
        self.pipeline_depth = max(1, int(pipeline_depth))
        self._inflight: list = []
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
        # host numpy, NOT jnp: this table is closed over by the fused-track
        # jit; device-array closure constants poison all later host->device
        # transfers on the tunneled runtime (see Camera.create).
        self.inv_sigma2_table = np.asarray(1.0 / lv_sigma2, np.float32)
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
        self._ref_matches = 0
        self.last_kf_frame_id = -1
        self.last_reloc_frame_id = -1
        self.trajectory: list[FrameLog] = []
        self.localization_only = False
        # culled keyframes: slot -> (T_this_to_parent, parent_slot) so the
        # trajectory saver can chain through the spanning tree like the
        # reference (System.cc:372-390)
        self.culled_chain: dict[int, tuple[np.ndarray, int]] = {}

        # observability counters (which tracking paths actually fired)
        self.stats = {"ref_kf_tracks": 0, "relocs": 0, "reloc_rejects": 0,
                      "motion_tracks": 0, "gba_aborted": 0, "gba_runs": 0,
                      "vo_tracks": 0}
        # localization-only visual-odometry flag (mbVO, Tracking.cc:131)
        self.mb_vo = False
        # cooperative BA interruption (mbAbortBA, LocalMapping.cc:70-78):
        # the tracker sets it; the mapper's chunked LM loops poll it
        self.abort_ba = False
        # GBA epoch counter (mnFullBAIdx, LoopClosing.cc:621-631): results
        # of a GBA started under an older epoch are discarded
        self.gba_epoch = 0
        self._stop_gba = False
        self._gba_thread = None
        # visibility counters buffered tracker-side in async mode
        self._pending_vis: list = []

        # cooperative mapping: LocalMapping advances as bounded step
        # generators pumped between frame dispatches on the TRACKING thread
        # — the single-chip deployment mode (no worker threads, no locks,
        # no GIL contention with the dispatch stream; device programs from
        # tracking and mapping interleave at chunk granularity).  The
        # 3-thread async mode remains for multi-core hosts.
        if cooperative_mapping and async_mapping:
            raise ValueError(
                "cooperative_mapping and async_mapping are exclusive"
            )
        self.cooperative = cooperative_mapping
        self._coop_pending: list[int] = []
        self._coop_gen = None

        self._build_jits()
        self.mapper = None
        if async_mapping:
            from .backend.async_mapper import AsyncMapper

            self.mapper = AsyncMapper(self)

    # ------------------------------------------------------------------ jits
    def _build_jits(self):
        cfg = self.cfg
        cam = self.cam

        # frames cross host->device as uint8 intensities / uint16 millimeter
        # depth (_compact_*): the tunnel serializes transfers with compute,
        # and 2.4 MB of f32 per frame costs ~80 ms of wall time — compacting
        # to 0.9 MB is below the sensor noise floor (0.5 intensity / 1 mm)
        if self.sensor == "stereo":
            self._jit_frame = jax.jit(
                lambda l, r: build_frame_stereo(
                    _decode_img(l), _decode_img(r), cam, cfg.orb
                )
            )
        elif self.sensor == "rgbd":
            # track_rgbd takes depth in METERS: dataset loaders apply
            # DepthMapFactor (io/datasets.py), unlike the reference which
            # converts inside GrabImageRGBD (Tracking.cc:206-219)
            self._jit_frame = jax.jit(
                lambda im, d: build_frame_rgbd(
                    _decode_img(im), _decode_depth(d), cam, cfg.orb
                )
            )
        else:
            self._jit_frame = jax.jit(
                lambda im: build_frame_mono(_decode_img(im), cam, cfg.orb)
            )

        self._jit_pose_opt = jax.jit(optimize_pose)
        self._jit_motion_match = jax.jit(
            TK.match_motion_model,
            static_argnames=("th", "nn_max_dist", "nn_ratio"),
        )
        self._jit_match_ref = jax.jit(
            TK.match_reference_kf, static_argnames=("nn_ratio", "max_dist")
        )
        self._jit_reloc_rescue = jax.jit(
            TK.match_kf_points_by_projection,
            static_argnames=("th", "max_dist", "scale_factor", "n_levels"),
        )
        self._jit_match_vo = jax.jit(
            TK.match_vo_points,
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
        from .models.map_state import update_point_stats_subset
        self._jit_update_stats_subset = jax.jit(
            update_point_stats_subset,
            static_argnames=("scale_factor", "n_levels"),
        )
        self._jit_covis = jax.jit(covisibility_matrix)
        self._jit_fuse = jax.jit(
            LM.fuse_into_keyframe,
            static_argnames=("budget", "scale_factor", "n_levels", "th", "max_dist"),
        )
        # same program with a candidate-point mask (SearchAndFuse)
        self._jit_fuse_masked = self._jit_fuse
        self._jit_fuse_multi = jax.jit(
            LM.fuse_into_keyframes,
            static_argnames=("budget", "scale_factor", "n_levels", "th", "max_dist"),
        )
        self._jit_cull = jax.jit(
            LM.cull_map_points, static_argnames=("recent_window",)
        )
        self._jit_cull_recent = jax.jit(
            LM.cull_recent_map_points,
            static_argnames=("recent_cap", "recent_window"),
        )
        self._jit_work_sets = jax.jit(
            LM.mapping_work_sets,
            static_argnames=("nn", "t_cap", "n_neighbors", "window_k",
                             "cull_cap"),
        )
        self._jit_kf_redundancy = jax.jit(
            LM.keyframe_redundancy, static_argnames=("min_obs",)
        )
        self._jit_kf_redundancy_batch = jax.jit(
            jax.vmap(lambda m, c: LM.keyframe_redundancy(m, c), (None, 0))
        )
        self._jit_remove_kf = jax.jit(LM.remove_keyframe)
        self._jit_triangulate = jax.jit(
            LM.triangulate_with_neighbor,
            static_argnames=("max_new", "scale_factor", "n_levels",
                             "min_baseline_ratio"),
        )
        self._jit_triangulate_multi = jax.jit(
            LM.triangulate_with_neighbors,
            static_argnames=("max_new", "scale_factor", "n_levels",
                             "min_baseline_ratio"),
        )
        self._jit_visibility = jax.jit(LM.update_visibility)
        self._jit_build_ba = jax.jit(map_ops.build_ba_problem)
        self._jit_run_ba = jax.jit(
            BA.run,
            static_argnames=("iters_phase1", "iters_phase2", "solver", "n_cg"),
        )
        self._jit_lm_chunk = jax.jit(
            BA.lm_chunk,
            static_argnames=("n_iters", "use_huber", "solver", "n_cg"),
        )
        self._jit_classify_outliers = jax.jit(BA.classify_outliers)
        self._jit_writeback = jax.jit(map_ops.writeback_ba)
        self._jit_gather_ba = jax.jit(
            map_ops.gather_ba_window,
            static_argnames=("max_kfs", "max_points", "max_obs"),
        )
        self._jit_scatter_ba = jax.jit(map_ops.scatter_ba_window)
        self._build_fused_track()

    def _build_fused_track(self):
        """One fused XLA program for the entire per-frame OK-state path:
        frame build -> motion-model matching (with the 2x window retry as a
        lax.cond) -> pose-only LM -> local-map frustum selection + matching
        -> second pose LM -> visibility counters -> keyframe-decision
        statistics.  The host performs exactly ONE dispatch + ONE small
        device_get per tracked frame — the difference between ~3 fps and
        real-time through a high-latency dispatch path, and the design
        SURVEY §7 prescribes ("no host round-trips mid-frame")."""
        cam = self.cam
        cfg = self.cfg
        sensor = self.sensor
        scale_factors = self.scale_factors
        inv_sigma2_table = self.inv_sigma2_table
        n_levels = cfg.orb.n_levels
        th = 7.0 if sensor == "stereo" else 15.0
        th_depth_m = float(self.th_depth_m)
        use_pallas = getattr(self, "use_pallas", False)

        def step(raw_a, raw_b,
                 last_xy, last_pt, last_octave, last_angle,
                 last_pose, velocity, have_vel,
                 ref_kf, min_obs,
                 kf_pose, kf_valid, kf_point_idx, kf_feat_valid,
                 pt_pos, pt_valid, pt_desc, pt_normal,
                 pt_min_dist, pt_max_dist, pt_visible, pt_found,
                 pt_obs_kf):
            if sensor == "stereo":
                frame = build_frame_stereo(
                    _decode_img(raw_a), _decode_img(raw_b), cam, cfg.orb
                )
            elif sensor == "rgbd":
                frame = build_frame_rgbd(
                    _decode_img(raw_a), _decode_depth(raw_b), cam, cfg.orb
                )
            else:
                frame = build_frame_mono(_decode_img(raw_a), cam, cfg.orb)

            pose0 = jnp.where(have_vel, velocity @ last_pose, last_pose)

            def motion(win):
                return TK.match_motion_model(
                    cam, pose0, frame, last_xy, last_pt, last_octave,
                    pt_pos, pt_valid, pt_desc, last_angle,
                    th=win, scale_factors=scale_factors, nn_max_dist=75,
                )

            r1 = motion(th)
            r = jax.lax.cond(
                r1.n_matches < 20,
                lambda _: motion(2 * th),   # 2x widening (Tracking.cc:802)
                lambda _: r1,
                operand=None,
            )
            inv_s2 = jnp.take(
                inv_sigma2_table,
                jnp.clip(frame.octave, 0, len(scale_factors) - 1),
            )
            is_st = frame.uvr[:, 2] >= 0
            valid1 = r.pt_idx >= 0
            seed1 = pose0 if cfg.tracking.seed_pose_opt_from_prediction \
                else last_pose
            o1 = optimize_pose(
                cam, seed1, pt_pos[jnp.clip(r.pt_idx, 0)],
                frame.uvr, inv_s2, valid1, is_st,
            )
            pt1 = jnp.where(o1.inlier, r.pt_idx, -1)

            # local map (TrackLocalMap)
            P = pt_pos.shape[0]
            scatter_idx = jnp.where(pt1 >= 0, pt1, P)
            already = jnp.zeros(P, bool).at[scatter_idx].set(True, mode="drop")
            local = TK.select_local_points(
                cam, o1.Tcw, pt_pos, pt_valid, pt_normal,
                pt_min_dist, pt_max_dist, already,
                budget=4096, scale_factor=cfg.orb.scale_factor,
                n_levels=n_levels,
            )
            r2 = TK.match_local_points(
                frame, local, pt_desc, pt1,
                th=1.0, scale_factors=scale_factors, use_pallas=use_pallas,
            )
            valid2 = r2.pt_idx >= 0
            o2 = optimize_pose(
                cam, o1.Tcw, pt_pos[jnp.clip(r2.pt_idx, 0)],
                frame.uvr, inv_s2, valid2, is_st,
            )
            pt2 = jnp.where(o2.inlier, r2.pt_idx, -1)

            # visibility / found statistics (sync-mode map update)
            vis_idx = jnp.where(local.idx >= 0, local.idx, P)
            new_visible = pt_visible.at[vis_idx].add(1, mode="drop")
            fnd_idx = jnp.where(pt2 >= 0, pt2, P)
            new_found = pt_found.at[fnd_idx].add(1, mode="drop")

            # keyframe-decision statistics (NeedNewKeyFrame close counts,
            # Tracking.cc:911-927)
            close = (frame.depth > 0) & (frame.depth < th_depth_m) & frame.valid
            tracked_close = jnp.sum((close & (pt2 >= 0)).astype(jnp.int32))
            untracked_close = jnp.sum((close & (pt2 < 0)).astype(jnp.int32))

            # nRefMatches = reference keyframe's landmarks with >= min_obs
            # observations (KeyFrame::TrackedMapPoints, Tracking.cc:899) —
            # counting ALL landmarks would inflate the c2 ratio with
            # fresh single-observation points and spam keyframes.
            # Count observations WITHOUT any gather over the (P, O) table:
            # obs slots of culled keyframes are cleared by remove_keyframe
            # (map_ops/local_mapping), so ``pt_obs_kf >= 0`` alone is the
            # validity test and n_obs is a pure elementwise reduce.  The
            # previous `take(kf_valid, pt_obs_kf)` formulation measured
            # +16.5 ms/frame inside this program on v5e (70% of the whole
            # fused step) even though it is ~0.03 ms standalone — XLA
            # lowers the fused 2M-element random gather pathologically.
            n_obs = jnp.sum((pt_obs_kf >= 0).astype(jnp.int32), axis=1)
            ref_pt = kf_point_idx[ref_kf]
            ref_has = (
                (ref_pt >= 0) & kf_feat_valid[ref_kf]
                & jnp.take(pt_valid, jnp.clip(ref_pt, 0))
                & (jnp.take(n_obs, jnp.clip(ref_pt, 0)) >= min_obs)
            )
            ref_tracked = jnp.sum(ref_has.astype(jnp.int32))

            # relative-pose log entry (System.cc:372-390 semantics)
            Tcr = o2.Tcw @ se3.inv(kf_pose[ref_kf])

            # outputs the host reads every frame are PACKED into two leaves
            # (one (6,) scalar vector + one (2,4,4) pose stack): device_get
            # fetches per leaf, and each fetch pays a tunnel round trip —
            # nine leaves cost ~40 ms/frame on the remote-TPU path
            scalars = jnp.stack([
                r.n_matches, o1.n_inliers, o2.n_inliers,
                tracked_close, untracked_close, ref_tracked,
            ]).astype(jnp.int32)
            poses_out = jnp.stack([o2.Tcw, Tcr])
            return (frame, poses_out, pt2, local.idx,
                    new_visible, new_found, scalars)

        self._jit_fused_track = jax.jit(step)

    # -------------------------------------------------------- facade control
    def activate_localization_mode(self):
        """Track against the frozen map without inserting keyframes
        (System::ActivateLocalizationMode, System.cc:311-319)."""
        self.flush_pipeline()
        self._drain_mapping()
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
        self._ref_matches = 0
        self.last_kf_frame_id = -1
        self.last_reloc_frame_id = -1
        self.trajectory = []
        self.culled_chain = {}
        self.vocab = None
        self.db = None
        self.loop_state = LC.LoopState()
        self._init_ref = None
        self._pending_vis = []
        self._inflight = []
        self._coop_pending = []
        self._coop_gen = None
        self.abort_ba = False
        self.mb_vo = False
        self._stop_gba = True
        self.gba_epoch += 1

    # ------------------------------------------------------------- tracking
    def track_stereo(self, img_l, img_r, timestamp: float) -> Optional[np.ndarray]:
        return self._track_entry(
            jnp.asarray(_encode_img(img_l)), jnp.asarray(_encode_img(img_r)),
            timestamp,
        )

    def track_rgbd(self, img, depth, timestamp: float) -> Optional[np.ndarray]:
        return self._track_entry(
            jnp.asarray(_encode_img(img)), jnp.asarray(_encode_depth(depth)),
            timestamp,
        )

    def track_monocular(self, img, timestamp: float) -> Optional[np.ndarray]:
        img = jnp.asarray(_encode_img(img))
        return self._track_entry(img, img, timestamp)

    # Device-resident frame entry points: frames already in the wire
    # encoding (uint8 grayscale, uint16 mm depth) and already in HBM —
    # the production path for a sensor DMA-ing into device memory, and
    # the only path whose throughput the tunneled bench can measure
    # without the host link dominating (see scripts/probe_tunnel.py).
    def track_rgbd_device(self, img_u8, depth_u16,
                          timestamp: float) -> Optional[np.ndarray]:
        return self._track_entry(img_u8, depth_u16, timestamp)

    def track_stereo_device(self, img_l_u8, img_r_u8,
                            timestamp: float) -> Optional[np.ndarray]:
        return self._track_entry(img_l_u8, img_r_u8, timestamp)

    def track_monocular_device(self, img_u8,
                               timestamp: float) -> Optional[np.ndarray]:
        return self._track_entry(img_u8, img_u8, timestamp)

    def _track_entry(self, raw_a, raw_b, timestamp: float):
        self.frame_id += 1
        jump = getattr(self, "_pending_pose_jump", None)
        if jump is not None:
            # a loop correction landed on the mapper thread: re-anchor
            self.last_pose = self.map.kf_pose[jump]
            self.velocity = None
            self._pending_pose_jump = None
        if self.state == TrackState.OK and not self.localization_only:
            # steady-state: the whole per-frame path is ONE fused program
            if self.pipelined:
                return self._track_pipelined(raw_a, raw_b, timestamp)
            return self._track_fused(raw_a, raw_b, timestamp)
        self.flush_pipeline()
        # init / lost / localization-only paths run the decomposed kernels
        if self.sensor == "monocular":
            frame = self._jit_frame(raw_a)
        else:
            frame = self._jit_frame(raw_a, raw_b)
        return self._track(frame, timestamp)

    def _dispatch_fused(self, raw_a, raw_b, timestamp: float) -> dict:
        """Enqueue the fused per-frame program and return an unresolved
        record (device arrays + the tracker state it was dispatched from)."""
        last = self.last_frame
        have_vel = self.velocity is not None
        vel = (
            jnp.asarray(self.velocity) if have_vel
            else jnp.eye(4, dtype=jnp.float32)
        )
        m = self.map
        min_obs = 3 if self.n_kf > 2 else 2   # Tracking.cc:897
        frame, poses_out, pt2, local_idx, nvis, nfnd, sc = (
            self._jit_fused_track(
                raw_a, raw_b,
                last.xy, self.last_pt_idx, last.octave, last.angle,
                self.last_pose, vel, jnp.asarray(have_vel),
                jnp.int32(self.ref_kf), jnp.int32(min_obs),
                m.kf_pose, m.kf_valid, m.kf_point_idx, m.kf_feat_valid,
                m.pt_pos, m.pt_valid, m.pt_desc, m.pt_normal,
                m.pt_min_dist, m.pt_max_dist, m.pt_visible, m.pt_found,
                m.pt_obs_kf,
            )
        )
        return dict(
            frame=frame, poses_out=poses_out, pt2=pt2, local_idx=local_idx,
            nvis=nvis, nfnd=nfnd, sc=sc,
            timestamp=timestamp, frame_id=self.frame_id,
            prev_pose=self.last_pose, prev_frame=last,
            prev_pt_idx=self.last_pt_idx, prev_velocity=self.velocity,
        )

    def _commit_fused(self, rec: dict, *, optimistic: bool) -> Optional[np.ndarray]:
        """Run the per-frame state machine on a (now resolved) fused record.

        ``optimistic``: the tracker's last_* already point at this record's
        outputs (pipelined mode) and must be ROLLED BACK to rec['prev_*']
        before a fallback or a loss.  Returns the frame's pose (np) or None.
        """
        # two leaves only: each device_get leaf pays a tunnel round trip
        poses_np, s = jax.device_get((rec["poses_out"], rec["sc"]))
        pose_np, Tcr_np = poses_np[0], poses_np[1]
        frame = rec["frame"]
        timestamp = rec["timestamp"]
        frame_id = rec["frame_id"]
        n_motion, n_inl1, n_map, t_close, u_close, ref_tracked = (
            int(x) for x in s
        )
        ok_motion = (
            n_motion >= 20
            and n_inl1 >= self.cfg.tracking.min_inliers_track
        )

        def rollback():
            if optimistic:
                self.last_pose = rec["prev_pose"]
                self.last_frame = rec["prev_frame"]
                self.last_pt_idx = rec["prev_pt_idx"]
                self.velocity = rec["prev_velocity"]

        if ok_motion:
            self.stats["motion_tracks"] += 1
            pose, pt_idx = rec["poses_out"][0], rec["pt2"]
            n_map_inliers = n_map
            if self.mapper is None:
                if optimistic:
                    # the map may have advanced since dispatch; apply the
                    # counters as index updates against the live banks
                    self.map = self._jit_visibility(
                        self.map, rec["local_idx"], pt_idx
                    )
                else:
                    self.map = self.map._replace(
                        pt_visible=rec["nvis"], pt_found=rec["nfnd"]
                    )
            else:
                self._pending_vis.append((rec["local_idx"], pt_idx))
                if len(self._pending_vis) > 256:
                    self._pending_vis.pop(0)
            close_counts = (t_close, u_close)
            self._ref_matches = ref_tracked
        else:
            # TrackReferenceKeyFrame fallback + decomposed local map
            rollback()
            ok, pose, pt_idx = self._track_reference_keyframe(frame)
            if not ok:
                self.state = TrackState.LOST
                self._log_frame(timestamp, lost=True, frame_id=frame_id)
                return None
            self.stats["ref_kf_tracks"] += 1
            pose, pt_idx, n_mi = self._track_local_map(frame, pose, pt_idx)
            n_map_inliers = int(n_mi)
            close_counts = None
            Tcr_np = None
            pose_np = None

        recent_reloc = (
            self.last_reloc_frame_id >= 0
            and frame_id - self.last_reloc_frame_id
            < self.cfg.tracking.max_frames_between_kf
        )
        local_bar = (
            self.cfg.tracking.min_inliers_local_map_reloc
            if recent_reloc else self.cfg.tracking.min_inliers_local_map
        )
        if n_map_inliers < local_bar:
            rollback()
            self.state = TrackState.LOST
            self._log_frame(timestamp, lost=True, frame_id=frame_id)
            return None

        if ok_motion and optimistic:
            # last_* already hold this record's outputs
            pass
        else:
            self.velocity = pose @ se3.inv(
                rec["prev_pose"] if optimistic else self.last_pose
            )
            self.last_pose = pose
            self.last_frame = frame
            self.last_pt_idx = pt_idx
        self.state = TrackState.OK
        if self._need_new_keyframe(frame, pt_idx, n_map_inliers, close_counts,
                                   frame_id=frame_id):
            self._create_keyframe(frame, pose, pt_idx)
            Tcr_np = None   # reference keyframe changed; recompute
        self._log_frame(timestamp, lost=False, Tcr=Tcr_np, frame_id=frame_id)
        return np.asarray(pose) if pose_np is None else pose_np

    def _track_fused(self, raw_a, raw_b, timestamp: float):
        """Steady-state tracked frame: one dispatch, one device_get."""
        rec = self._dispatch_fused(raw_a, raw_b, timestamp)
        pose = self._commit_fused(rec, optimistic=False)
        if self.cooperative:
            self._pump_mapping()
        return pose

    def flush_pipeline(self):
        """Resolve all in-flight pipelined frames (no-op in sync mode).

        If an older frame turns out lost, the younger in-flight frames'
        optimistic results are invalid: they are reprocessed through the
        decomposed path with full fidelity (their FrameData is retained)."""
        while self._inflight:
            rec = self._inflight.pop(0)
            if self.state == TrackState.OK:
                self._commit_fused(rec, optimistic=True)
            else:
                saved = self.frame_id
                self.frame_id = rec["frame_id"]
                try:
                    self._track(rec["frame"], rec["timestamp"])
                finally:
                    self.frame_id = saved

    def _track_pipelined(self, raw_a, raw_b, timestamp: float):
        """Optimistic pipelined tracking (SURVEY §7: "async dispatch ahead
        of frame arrival"): dispatch this frame against the tracker's
        unresolved device-side state, resolve the frame dispatched
        ``pipeline_depth`` calls ago (its results have long arrived), and
        return this frame's pose as a lazy device array.  A failure is
        detected up to ``depth`` frames late; the affected frames are then
        reprocessed through the decomposed path with full fidelity."""
        # depth 1 resolves the previous frame before dispatching this one:
        # every dispatch then sees fully committed keyframe/map state, and
        # it measures bit-identical to sync mode.  Depth d>1 keeps d frames
        # in flight: keyframe insertion lands up to d-1 frames late and the
        # frames dispatched in between track against the pre-keyframe map —
        # the same staleness class the reference tolerates between its
        # tracking and mapping threads, but NOT free: on the tum_room
        # fixture depth 3 + cooperative mapping measured ATE 0.104 m vs
        # 0.0027 m at sync/depth-1 (round-5 measurement, BASELINE.md) —
        # transient pose spikes from frames chained on optimistic state
        # across map updates.  Use depth 1 when trajectory accuracy is the
        # objective; deeper pipelines buy throughput on high-latency
        # dispatch paths.
        depth = self.pipeline_depth
        while len(self._inflight) >= depth:
            rec = self._inflight.pop(0)
            self._commit_fused(rec, optimistic=True)
            if self.state != TrackState.OK:
                # an in-flight frame was lost: reprocess the younger
                # in-flight frames and this one through the decomposed path
                self.flush_pipeline()
                if self.sensor == "monocular":
                    frame = self._jit_frame(raw_a)
                else:
                    frame = self._jit_frame(raw_a, raw_b)
                return self._track(frame, timestamp)
        rec = self._dispatch_fused(raw_a, raw_b, timestamp)
        pose_dev = rec["poses_out"][0]
        for leaf in (rec["poses_out"], rec["sc"]):
            leaf.copy_to_host_async()
        # optimistic tracker state: the next dispatch chains on device values
        self.velocity = pose_dev @ se3.inv(self.last_pose)
        self.last_pose = pose_dev
        self.last_frame = rec["frame"]
        self.last_pt_idx = rec["pt2"]
        self._inflight.append(rec)
        # advance the cooperative mapping pipeline in the shadow of this
        # frame's in-flight device work: one bounded step in steady state,
        # proportionally more when keyframes are queuing up
        if self.cooperative:
            backlog = self._coop_backlog()
            self._pump_mapping(1 if backlog <= 1 else 4 * backlog)
        return pose_dev

    def _track(self, frame: FrameData, timestamp: float) -> Optional[np.ndarray]:
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

        relocalized = False
        if self.state == TrackState.LOST:
            # auto-reset when lost right after initialization
            # (Tracking.cc:421-428)
            if self.n_kf <= 5 and not self.localization_only:
                self.reset()
                return None
            ok_reloc, pose, pt_idx = self._relocalize(frame)
            if not ok_reloc:
                self._log_frame(timestamp, lost=True)
                return None
            # re-anchor; reference goes straight to TrackLocalMap after a
            # successful relocalization (Tracking.cc:291, 335-346)
            relocalized = True
            self.velocity = None
            self.last_reloc_frame_id = self.frame_id

        if not relocalized and self.localization_only and self.mb_vo:
            # VO mode: the map is out of view; try relocalizing every frame
            # (Tracking.cc:312-361)
            ok_r, pose_r, pt_r = self._relocalize(frame)
            if ok_r:
                relocalized = True
                pose, pt_idx = pose_r, pt_r
                self.mb_vo = False
                self.velocity = None
                self.last_reloc_frame_id = self.frame_id

        vo_n_tot = 0
        if not relocalized:
            # --- pose prediction + motion-model tracking -------------------
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
            if self.localization_only and self.sensor != "monocular":
                # localization-only tracking always augments the motion
                # model with temporal VO points from last-frame depth
                # (UpdateLastFrame, Tracking.cc:724-778); mbVO = map matches
                # collapsed (Tracking.cc:299-361)
                pose, pt_idx, n_map, n_tot = self._track_vo(
                    frame, pose0, pt_idx, th
                )
                vo_n_tot = n_tot
                ok = n_tot > 20
                self.mb_vo = ok and n_map < 10
                if self.mb_vo:
                    self.stats["vo_tracks"] += 1
            elif int(n_m) >= 20:
                # Deliberate divergence from the reference (configurable:
                # tracking.seed_pose_opt_from_prediction): by default the
                # velocity prediction seeds only the *matching window*; LM
                # starts from the last pose.  Measured on the 125-frame
                # miscalibrated street circuit (scripts/exp_pose_seed.py,
                # committed in docs/EXPERIMENTS.md): neutral seed 0 lost /
                # ATE 0.375 m / loop closed; predicted seed 49 lost /
                # ATE 5.91 m / no loop.  The prediction-consistent LM fixed
                # point amplifies drift through the outlier-reclassification
                # rounds; the neutral start converges to the map consensus.
                seed = (
                    pose0 if self.cfg.tracking.seed_pose_opt_from_prediction
                    else self.last_pose
                )
                pose, pt_idx, n_inliers = self._pose_opt_against_map(
                    frame, seed, pt_idx
                )
                ok = int(n_inliers) >= self.cfg.tracking.min_inliers_track
                if ok:
                    self.stats["motion_tracks"] += 1

            if not ok:
                # TrackReferenceKeyFrame (Tracking.cc:681-719): after motion-
                # model failure, match against the reference keyframe's
                # landmark-bearing features and optimize from the last pose.
                ok2, pose2, pt2 = self._track_reference_keyframe(frame)
                if ok2:
                    ok, pose, pt_idx = ok2, pose2, pt2
                    self.stats["ref_kf_tracks"] += 1
                    self.mb_vo = False

            if not ok:
                self.state = TrackState.LOST
                self._log_frame(timestamp, lost=True)
                return None

        if self.localization_only and self.mb_vo:
            # pure-VO frame: no local map in view (Tracking.cc:330-346)
            return self._finish_vo_frame(frame, pose, pt_idx, timestamp)

        # --- track local map ----------------------------------------------
        pose, pt_idx, n_map_inliers = self._track_local_map(frame, pose, pt_idx)
        # stricter bar right after a relocalization (Tracking.cc:870-877)
        recent_reloc = (
            self.last_reloc_frame_id >= 0
            and self.frame_id - self.last_reloc_frame_id
            < self.cfg.tracking.max_frames_between_kf
        )
        local_bar = (
            self.cfg.tracking.min_inliers_local_map_reloc
            if recent_reloc else self.cfg.tracking.min_inliers_local_map
        )
        if int(n_map_inliers) < local_bar:
            if self.localization_only and vo_n_tot > 20:
                # divergence from the reference (which goes LOST here,
                # Tracking.cc:352-361): with the map frozen and frame-to-
                # frame VO still strong, degrade to VO instead of losing —
                # the map cannot be corrupted in localization mode, and VO
                # keeps the trajectory through the map's boundary zone
                self.mb_vo = True
                self.stats["vo_tracks"] += 1
                return self._finish_vo_frame(frame, pose, pt_idx, timestamp)
            self.state = TrackState.LOST
            self._log_frame(timestamp, lost=True)
            return None

        # --- bookkeeping ---------------------------------------------------
        # after relocalization there is no previous pose to difference
        # against (Tracking.cc:376-383 skips velocity on empty last pose)
        self.velocity = (
            None if relocalized else np.asarray(pose @ se3.inv(self.last_pose))
        )
        self.last_pose = pose
        self.last_frame = frame
        self.last_pt_idx = pt_idx
        self.state = TrackState.OK

        if not self.localization_only and self._need_new_keyframe(frame, pt_idx, int(n_map_inliers)):
            self._create_keyframe(frame, pose, pt_idx)

        self._log_frame(timestamp, lost=False)
        return np.asarray(pose)

    # ----------------------------------------------------------- sub-steps

    def _set_ref_kf(self, kf_slot: int):
        """Update the reference keyframe and its tracked-landmark count
        (KeyFrame::TrackedMapPoints(nMinObs): only landmarks with enough
        observations count toward NeedNewKeyFrame's c2 ratio,
        Tracking.cc:887-899).  The fused tracking program refreshes the
        count live each frame; this host computation seeds it."""
        self.ref_kf = int(kf_slot)
        from .models.map_state import n_observations

        min_obs = 3 if self.n_kf > 2 else 2
        pt = self.map.kf_point_idx[self.ref_kf]
        has = (
            (pt >= 0)
            & self.map.kf_feat_valid[self.ref_kf]
            & jnp.take(self.map.pt_valid, jnp.clip(pt, 0))
            & (jnp.take(n_observations(self.map), jnp.clip(pt, 0)) >= min_obs)
        )
        self._ref_matches = int(jnp.sum(has.astype(jnp.int32)))

    def _finish_vo_frame(self, frame, pose, pt_idx, timestamp):
        """Bookkeeping for a localization-only VO frame (no local map)."""
        self.velocity = np.asarray(pose @ se3.inv(self.last_pose))
        self.last_pose = pose
        self.last_frame = frame
        self.last_pt_idx = pt_idx
        self.state = TrackState.OK
        self._log_frame(timestamp, lost=False)
        return np.asarray(pose)

    def _track_reference_keyframe(self, frame):
        """TrackReferenceKeyFrame (Tracking.cc:681-719): descriptor-match the
        current frame against the reference keyframe's landmark features,
        pose-optimize from the last pose, require >= 10 map inliers.

        Returns (ok, pose, pt_idx)."""
        res = self._jit_match_ref(
            frame,
            self.map.kf_desc[self.ref_kf],
            self.map.kf_point_idx[self.ref_kf],
            self.map.kf_feat_valid[self.ref_kf],
            self.map.kf_angle[self.ref_kf],
            self.map.pt_valid,
            nn_ratio=self.cfg.matcher.nn_ratio_ref_kf,
        )
        if int(res.n_matches) < self.cfg.tracking.min_matches_ref_kf:
            return False, None, None
        pose, pt_idx, n_inl = self._pose_opt_against_map(
            frame, self.last_pose, res.pt_idx
        )
        ok = int(n_inl) >= self.cfg.tracking.min_inliers_track
        return ok, pose, pt_idx

    def _track_vo(self, frame, pose0, pt_idx, th):
        """Combine surviving map matches with temporal VO points from the
        last frame's depth, then pose-optimize over the union.  Returns
        (pose, map_pt_idx, n_map_inliers, n_total_inliers)."""
        last = self.last_frame
        res = self._jit_match_vo(
            self.cam, pose0, frame,
            last.xy, last.depth, last.valid, self.last_pt_idx,
            last.octave, last.angle, last.desc, self.last_pose,
            th=float(2 * th), scale_factors=self.scale_factors,
        )
        map_valid = (pt_idx >= 0) & jnp.take(
            self.map.pt_valid, jnp.clip(pt_idx, 0)
        )
        pw = jnp.where(
            map_valid[:, None],
            self.map.pt_pos[jnp.clip(pt_idx, 0)],
            res.pw,
        )
        valid = map_valid | res.mask
        inv_s2 = jnp.take(
            self.inv_sigma2_table,
            jnp.clip(frame.octave, 0, len(self.scale_factors) - 1),
        )
        is_stereo = frame.uvr[:, 2] >= 0
        result = self._jit_pose_opt(
            self.cam, self.last_pose, pw, frame.uvr, inv_s2, valid, is_stereo
        )
        n_map = int(jnp.sum(result.inlier & map_valid))
        n_tot = int(result.n_inliers)
        new_pt = jnp.where(result.inlier & map_valid, pt_idx, -1)
        return result.Tcw, new_pt, n_map, n_tot

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
        # visibility/found statistics feed MapPointCulling.  In async mode
        # the tracker must not write the map (the mapper owns it); buffer
        # the counters and flush them at keyframe insertion.
        if self.mapper is None:
            self.map = self._jit_visibility(self.map, local.idx, pt_idx)
        else:
            self._pending_vis.append((local.idx, pt_idx))
            if len(self._pending_vis) > 256:
                self._pending_vis.pop(0)
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
        self._set_ref_kf(kf_slot)
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
        self._set_ref_kf(kf1)
        self.last_kf_frame_id = self.frame_id
        self._init_ref = None
        return True

    # ----------------------------------------------------------- keyframes
    def _need_new_keyframe(self, frame, pt_idx, n_inliers: int,
                           close_counts=None, frame_id=None) -> bool:
        """Adapted NeedNewKeyFrame (Tracking.cc:880-962).  ``close_counts``
        = (tracked_close, untracked_close) precomputed by the fused tracking
        program; computed here otherwise."""
        if self.n_kf >= self.cfg.map.max_keyframes - 2:
            telemetry.warn(
                "kf_capacity",
                f"keyframe bank full ({self.n_kf}/{self.cfg.map.max_keyframes})"
                " — no further keyframes will be inserted; raise "
                "MapConfig.max_keyframes",
            )
            return False
        if self.mapper is not None:
            mapper_idle = self.mapper.idle
        elif self.cooperative:
            mapper_idle = not self._coop_busy()
        else:
            mapper_idle = True
        fid = self.frame_id if frame_id is None else frame_id
        frames_since = fid - self.last_kf_frame_id
        # reference-match count = points in ref KF, cached host-side at the
        # moments the reference keyframe changes (avoids a per-frame sync)
        ref_matches = self._ref_matches
        # thRefRatio (Tracking.cc:922-928): 0.4 with a near-empty map,
        # 0.9 for monocular, 0.75 otherwise
        if self.sensor == "monocular":
            th_ratio = 0.9
        elif self.n_kf < 2:
            th_ratio = 0.4
        else:
            th_ratio = 0.75

        need_close = False
        if self.sensor != "monocular":
            if close_counts is not None:
                tracked_close, untracked_close = close_counts
            else:
                d = np.asarray(frame.depth)
                pid = np.asarray(pt_idx)
                close = (d > 0) & (d < self.th_depth_m)
                tracked_close = int((close & (pid >= 0)).sum())
                untracked_close = int((close & (pid < 0)).sum())
            need_close = tracked_close < 100 and untracked_close > 70

        # c1a/c1b/c1c/c2 exactly as Tracking.cc:929-943: c1b additionally
        # requires local mapping to be idle
        c1a = frames_since >= self.cfg.tracking.max_frames_between_kf
        c1b = (
            frames_since >= self.cfg.tracking.min_frames_between_kf
            and mapper_idle
        )
        c1c = self.sensor != "monocular" and (
            n_inliers < ref_matches * 0.25 or need_close
        )
        c2 = (n_inliers < ref_matches * th_ratio or need_close) and n_inliers > 15
        if not ((c1a or c1b or c1c) and c2):
            return False
        if mapper_idle:
            return True
        # mapper busy: interrupt its local BA (Tracking.cc:951 InterruptBA)
        # and, for stereo/RGB-D, insert anyway while the queue is short
        # (Tracking.cc:952-959)
        self.abort_ba = True
        if self.sensor == "monocular":
            return False
        if self.cooperative:
            # cooperative backpressure: drain the pipeline directly (no
            # waiting — the work happens right here on this thread)
            if self._coop_backlog() >= 3:
                self._pump_mapping(32)
            return self._coop_backlog() < 3
        if self.mapper.queue_len() < 3:
            return True
        # Single-chip async backpressure: the reference's LocalMapping runs
        # on its own core and essentially never falls 3 keyframes behind;
        # on one time-sliced chip an unpaced tracker can outrun mapping,
        # and silently skipping needed keyframes starves the map until
        # tracking is lost.  Give the worker a bounded window to drain
        # instead (the tracker sleeps, yielding the device and the GIL).
        deadline = time.monotonic() + 0.5
        while time.monotonic() < deadline:
            time.sleep(0.005)
            if self.mapper.queue_len() < 3:
                return True
        telemetry.warn(
            "mapping_backlog",
            "mapping queue still full after 500 ms backpressure window — "
            "keyframe skipped (mapping cannot keep up with the frame rate)",
        )
        return False

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
        """Ensure the vocabulary exists, then add the keyframe's tf-idf
        signature to the database.

        Vocabulary resolution order (System.cc:74-121 loads the corpus-
        trained ORBvoc asset; the reference cannot run without it):
        1. an explicit ``cfg.vocab_path``;
        2. the packaged corpus-trained asset (assets/vocab.npz, produced by
           scripts/train_vocab.py on rendered multi-scene corpora);
        3. a missing asset raises, unless cfg.allow_vocab_fallback opts in
           to training a small one-frame vocabulary (degraded recall).
        """
        from .place.vocab import load_vocabulary, train_vocabulary
        from .place.keyframe_db import KeyFrameDB

        if self.vocab is None:
            import os

            path = self.cfg.vocab_path or os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "assets", "vocab.npz",
            )
            if os.path.exists(path):
                self.vocab = load_vocabulary(path)
            elif self.cfg.allow_vocab_fallback:
                telemetry.warn(
                    "vocab_fallback",
                    f"vocabulary asset not found at {path} — training a "
                    "one-frame fallback vocabulary (degraded loop recall)",
                )
                descs = np.asarray(frame.desc)[np.asarray(frame.valid)]
                n_words = min(256, max(32, len(descs) // 4))
                self.vocab = train_vocabulary(descs, n_words=n_words, iters=4)
            else:
                raise FileNotFoundError(
                    f"vocabulary asset not found at {path}; train one with "
                    "scripts/train_vocab.py, point cfg.vocab_path at it, or "
                    "opt in to the degraded one-frame fallback with "
                    "SystemConfig(allow_vocab_fallback=True) "
                    "(the reference likewise requires ORBvoc, System.cc:74-83)"
                )
            self.db = KeyFrameDB(self.vocab, self.cfg.map.max_keyframes)
        self.db.add(kf_slot, frame.desc, frame.valid)

    def _flush_pending_vis(self):
        for vis, fnd in self._pending_vis:
            self.map = self._jit_visibility(self.map, vis, fnd)
        self._pending_vis.clear()

    def _insert_kf_with_points(self, frame, pose, pt_idx) -> int:
        kf_slot = self._insert_keyframe_arrays(frame, pose, pt_idx, parent=self.ref_kf)
        # stereo/RGB-D: create close points for untracked features
        # (CreateNewKeyFrame, Tracking.cc:976-1023)
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
        return kf_slot

    def _create_keyframe(self, frame, pose, pt_idx):
        if self.mapper is not None:
            # take the map-writer lock for the (cheap) insertion; the
            # mapping worker's in-flight local BA was already interrupted
            # by _need_new_keyframe setting abort_ba
            with self.mapper.paused():
                self._flush_pending_vis()
                kf_slot = self._insert_kf_with_points(frame, pose, pt_idx)
        else:
            kf_slot = self._insert_kf_with_points(frame, pose, pt_idx)
        self._set_ref_kf(kf_slot)
        self.last_kf_frame_id = self.frame_id
        # the tracker's associations only re-anchor on the keyframe when no
        # newer frame is in flight (pipelined mode keeps its optimistic
        # chain: last_pt_idx must stay aligned with last_frame)
        if not self._inflight:
            self.last_pt_idx = self.map.kf_point_idx[kf_slot]
        if self.mapper is not None:
            self.mapper.submit(kf_slot)
        elif self.cooperative:
            self._coop_pending.append(kf_slot)
        else:
            self._mapping_pipeline(kf_slot)
            # fusion may have merged landmarks the tracker references;
            # re-read the keyframe's (remapped) associations so motion
            # matching keeps its rows alive (MapPoint::Replace semantics
            # for the tracker's pointers)
            if not self._inflight:
                self.last_pt_idx = self.map.kf_point_idx[kf_slot]

    def _mapping_pipeline(self, kf_slot: int):
        """Synchronous keyframe-rate pipeline: mapping core + loop closing
        (the async path splits these between two workers)."""
        self._mapping_core(kf_slot)
        if self.loop_closing_enabled:
            self._try_close_loop(kf_slot)

    # ------------------------------------------------- cooperative mapping
    def _coop_busy(self) -> bool:
        return self._coop_gen is not None or bool(self._coop_pending)

    def _coop_backlog(self) -> int:
        return len(self._coop_pending) + (1 if self._coop_gen else 0)

    def _pump_mapping(self, budget: int = 1):
        """Advance the cooperative mapping pipeline by up to ``budget``
        steps (each step = one bounded dispatch bundle or one host sync;
        see _mapping_steps).  Called once per tracked frame."""
        for _ in range(budget):
            if self._coop_gen is None:
                if not self._coop_pending:
                    return
                kf = self._coop_pending.pop(0)
                self._coop_gen = self._coop_steps(kf)
            try:
                next(self._coop_gen)
            except StopIteration:
                self._coop_gen = None

    def _coop_steps(self, kf_slot: int):
        yield from self._mapping_steps(kf_slot)
        if self.loop_closing_enabled:
            yield
            self._try_close_loop(kf_slot)

    def _drain_mapping(self, max_steps: int = 10000):
        """Run the cooperative pipeline to completion (shutdown/export)."""
        steps = 0
        while self._coop_busy() and steps < max_steps:
            self._pump_mapping(16)
            steps += 16

    def _map_lock(self):
        """Writer lock for map mutations (a no-op context in sync mode).

        Lock-hold discipline: hold it only across a jit DISPATCH plus the
        ``self.map`` attribute swap — dispatch is asynchronous, so the hold
        time is milliseconds even for a 50 ms device program.  Host syncs
        (np.asarray / int()) and device execution must happen OUTSIDE the
        lock, or the tracker's keyframe insertion blocks for the whole
        mapping pipeline (measured 500-700 ms/keyframe wall — the round-4
        mean-vs-median gap)."""
        import contextlib

        if self.mapper is not None:
            return self.mapper.write_lock
        return contextlib.nullcontext()

    def _mapping_core(self, kf_slot: int):
        """The LocalMapping::Run body, run to completion (async worker and
        sync mode).  Cooperative mode advances ``_mapping_steps`` one step
        per tracked frame instead."""
        for _ in self._mapping_steps(kf_slot):
            pass

    def _mapping_steps(self, kf_slot: int):
        """The LocalMapping::Run body (LocalMapping.cc:44-104) as a
        STEP GENERATOR: triangulate, fuse, cull, refresh statistics, local
        BA (per-chunk), keyframe culling — yielding after each bounded unit
        of device work.

        The whole per-keyframe pipeline makes exactly TWO host syncs (the
        triangulation-count reconcile and the keyframe-redundancy ratios);
        neighbor/window/candidate selection happens on device
        (mapping_work_sets).  The generator form is the single-chip analog
        of the reference's second core (LocalMapping.cc:44): cooperative
        mode pumps one step between frame dispatches, so no single mapping
        program ever stalls the tracker for more than one bounded chunk,
        and there is no cross-thread GIL/dispatch contention at all."""
        mono = self.sensor == "monocular"
        nn = self.cfg.map.fuse_neighbors or (20 if mono else 10)
        n_nb = self.cfg.map.triangulate_neighbors or (20 if mono else 10)
        t_cap = 3 * nn + 2
        (tri_nb, fuse_slots, n_fuse, fuse_mask, window, fixed, cull_cands) = (
            self._jit_work_sets(
                self.map, jnp.int32(kf_slot), jnp.int32(self.ref_kf),
                nn=nn, t_cap=t_cap, n_neighbors=n_nb,
            )
        )
        yield
        # triangulate new landmarks with covisible neighbours
        # (CreateNewMapPoints; mono's only source of new points)
        n_new_dev, pt_base = self._triangulate_new_points(kf_slot, tri_nb)
        if n_new_dev is not None:
            # start the scalar downloads now; the reconcile step reads them
            # several yields later, after the transfers completed in the
            # shadow of the intervening frames
            n_new_dev.copy_to_host_async()
            n_fuse.copy_to_host_async()
        yield
        # fuse duplicates (SearchInNeighbors) and cull weak recent points
        # (MapPointCulling iterates mlpRecentAddedMapPoints only,
        # LocalMapping.cc:155-183 — the recent slice IS the reference set)
        self._fuse_neighbors(kf_slot, fuse_slots, fuse_mask, t_cap=t_cap)
        yield
        with self._map_lock():
            self.map = self._jit_cull_recent(
                self.map, jnp.int32(kf_slot), jnp.int32(self.n_pt)
            )
            # refresh stats for exactly the points whose observation sets
            # this keyframe touched (triangulated/fused points are all
            # observed by kf_slot after fusion) — 64x cheaper than the
            # full-bank refresh
            self.map = self._jit_update_stats_subset(
                self.map, self.map.kf_point_idx[kf_slot],
                scale_factor=self.cfg.orb.scale_factor,
                n_levels=self.cfg.orb.n_levels,
            )
        yield
        # sync point 1: reconcile the reserved triangulation slots (the
        # device has long since produced the real count) + the fuse-target
        # overflow telemetry, one fetch
        self._reconcile_triangulation(n_new_dev, pt_base, n_fuse, t_cap)
        yield
        if self.n_kf >= 3:
            self.abort_ba = False  # fresh run (LocalMapping.cc:66)
            yield from self._windowed_ba_steps(window, fixed, 5, 10)
            # keep the tracker's pose consistent with the adjusted keyframe
            # (only safe when mapping runs on the tracking thread AND no
            # newer frame is in flight: the async mapper / pipelined
            # tracker must not move the live pose under the optimistic
            # chain)
            if self.mapper is None and not self._inflight:
                self.last_pose = self.map.kf_pose[kf_slot]
        yield
        ratios_dev = None
        if self.n_kf >= 5:
            # dispatch the redundancy ratios and start their download one
            # step ahead of the (host-side) culling decision
            ratios_dev = self._jit_kf_redundancy_batch(
                self.map, jnp.clip(cull_cands, 0)
            )
            cull_cands.copy_to_host_async()
            ratios_dev.copy_to_host_async()
            yield
        self._cull_keyframes(kf_slot, cull_cands, ratios_dev=ratios_dev)

    def _fuse_neighbors(self, kf_slot: int, fuse_slots, fuse_mask, *,
                        t_cap: int):
        """SearchInNeighbors (LocalMapping.cc:425-509): both-direction
        landmark fusion over the 1st ring (10 covisible neighbors; 20 for
        monocular) plus each neighbor's 5-neighbor 2nd ring — the current
        keyframe's landmarks are fused into every target, then all targets'
        landmarks into the current keyframe.  ``fuse_slots``/``fuse_mask``
        come from mapping_work_sets (device, no host sync)."""
        if self.n_kf < 2:
            return
        # direction 1: this keyframe's landmarks into each target — all
        # targets in ONE scanned program (one dispatch, not ~25), with the
        # candidate set passed compactly (C = N feature slots, not a P mask)
        with self._map_lock():
            cur_pt = self.map.kf_point_idx[kf_slot]
            self.map = self._jit_fuse_multi(
                self.map, fuse_slots, self.cam, None,
                budget=1024, scale_factor=self.cfg.orb.scale_factor,
                n_levels=self.cfg.orb.n_levels, cand_idx=cur_pt,
            )
            # direction 2: all targets' landmarks into this keyframe.
            # Membership via comparison against the <= t_cap slot list —
            # a full-bank take(mask, pt_obs_kf) is a 2M random gather
            # that XLA lowers pathologically on TPU.
            obs = self.map.pt_obs_kf
            obs_in_tgt = jnp.any(
                obs[:, :, None] == fuse_slots[None, None, :], axis=-1
            ) & (obs >= 0)
            tgt_mask = self.map.pt_valid & jnp.any(obs_in_tgt, axis=1)
            self.map = self._jit_fuse_masked(
                self.map, jnp.int32(kf_slot), self.cam, tgt_mask,
                budget=2048, scale_factor=self.cfg.orb.scale_factor,
                n_levels=self.cfg.orb.n_levels,
            )

    def _triangulate_new_points(self, kf_slot: int, neighbors):
        """CreateNewMapPoints over the device-selected neighbor list
        (mapping_work_sets tri_neighbors; covis weight > 15)."""
        if self.n_kf < 2:
            return None, 0
        # mono requires a baseline >= 1% of median depth (LocalMapping.cc:219)
        min_bl = 0.01 if self.sensor == "monocular" else 0.005
        cap = self.map.pt_pos.shape[0]
        n_res = 64 * int(neighbors.shape[0])
        # all neighbors triangulated in ONE scanned program; the kernel stops
        # allocating when the bank can't hold another max_new batch.
        # Slot allocation is RESERVED optimistically (worst case per
        # neighbor) so the count sync can happen outside the writer lock;
        # _reconcile_triangulation returns the unused tail if no other
        # allocation landed in between.
        with self._map_lock():
            pt_base = self.n_pt
            self.map, n_new = self._jit_triangulate_multi(
                self.map, jnp.int32(kf_slot), neighbors,
                self.cam, jnp.int32(pt_base), max_new=64,
                scale_factor=self.cfg.orb.scale_factor,
                n_levels=self.cfg.orb.n_levels,
                min_baseline_ratio=min_bl,
            )
            reserved_end = min(pt_base + n_res, cap)
            self.n_pt = reserved_end
        self._tri_reserved_end = reserved_end
        if self.n_pt >= cap - 64:
            telemetry.warn(
                "pt_capacity",
                f"map-point bank full ({self.n_pt}/{cap}) — triangulation "
                "suspended; raise MapConfig.max_points",
            )
        return n_new, pt_base

    def _reconcile_triangulation(self, n_new_dev, pt_base: int,
                                 n_fuse_dev=None, t_cap: int = 0):
        """Release the optimistically reserved triangulation slots (if no
        other allocation happened since, shrink n_pt to the real count)
        and surface the fuse-target overflow telemetry — ONE host fetch."""
        if n_new_dev is None:
            return
        if n_fuse_dev is not None:
            n_new, n_fuse = (int(x) for x in jax.device_get(
                (n_new_dev, n_fuse_dev)))
            if n_fuse > t_cap:
                telemetry.warn(
                    "fuse_target_overflow",
                    f"SearchInNeighbors has {n_fuse} fuse targets; only "
                    f"{t_cap} scanned (densely covisible graph — raise "
                    "MapConfig.fuse_neighbors ring budget)",
                )
        else:
            n_new = int(n_new_dev)      # device sync — OUTSIDE the lock
        with self._map_lock():
            if self.n_pt == self._tri_reserved_end:
                self.n_pt = pt_base + n_new

    # ------------------------------------------------------------ local BA
    def _run_ba_chunked(
        self, prob, iters1: int, iters2: int, *,
        solver: str = "dense", n_cg: int = 0, chunk: int = 5,
        should_stop=None, yield_device: bool = False,
    ):
        """Run the two-phase LM schedule as host-polled jitted chunks.

        Cooperative interruption between chunks reproduces g2o's force-stop
        flag semantics: local BA keeps partial progress when aborted
        (Optimizer.cc:650-694 still writes back after ``mbAbortBA``), the
        GBA caller discards on abort (LoopClosing.cc:631).  Returns
        (BAResult, stopped_early).
        """
        cam = self.cam
        poses, points, lam = prob.kf_poses, prob.points, jnp.float32(1e-4)
        stopped = False

        def phase(n, poses, points, lam):
            nonlocal stopped
            done = 0
            while done < n and not stopped:
                k = min(chunk, n - done)
                poses, points, lam = self._jit_lm_chunk(
                    cam, prob, poses, points, lam,
                    n_iters=k, use_huber=True, solver=solver, n_cg=n_cg,
                )
                if yield_device:
                    # wait for this chunk before enqueueing the next: on one
                    # chip the device runs programs in submission order, so
                    # an unbounded mapping backlog would stall the tracker's
                    # next per-frame dispatch behind it.  Blocking per chunk
                    # caps the tracker's queueing delay at one chunk
                    # (~tens of ms) — the single-chip analog of mapping
                    # running on its own core (LocalMapping.cc:44).
                    jax.block_until_ready(lam)
                done += k
                if should_stop is not None and done < n and should_stop():
                    stopped = True
            return poses, points, lam

        poses, points, lam = phase(iters1, poses, points, lam)
        if iters2 > 0 and not stopped:
            new_valid = self._jit_classify_outliers(cam, prob, poses, points)
            prob = prob._replace(obs_valid=new_valid)
            # fresh damping for the re-classified problem, like g2o
            # re-initializing lambda per optimize() call (BA.run does the
            # same between phases)
            poses, points, lam = phase(
                iters2, poses, points, jnp.float32(1e-4)
            )
        final_valid = self._jit_classify_outliers(cam, prob, poses, points)
        result = BA.BAResult(
            kf_poses=poses, points=points, obs_valid=final_valid,
            total_chi2=jnp.float32(0.0),
        )
        return result, stopped

    def _windowed_ba(self, window_mask, fixed_mask, iters1: int, iters2: int,
                     abortable: bool = False):
        """Compact-window BA run to completion (see _windowed_ba_steps).
        ``abortable``: poll the tracker's ``abort_ba`` flag between LM
        chunks (mbAbortBA) — partial progress is still written back, as in
        the reference."""
        for _ in self._windowed_ba_steps(window_mask, fixed_mask,
                                         iters1, iters2,
                                         abortable=abortable):
            pass

    def _windowed_ba_steps(self, window_mask, fixed_mask,
                           iters1: int, iters2: int, abortable: bool = True):
        """Compact-window BA as a step generator: gather the covisibility
        subgraph into small static arrays, dense Schur solve per LM chunk,
        scatter results back.  Cost scales with the window, not with map
        capacity.  Yields after the gather and after every LM chunk; the
        tracker's ``abort_ba`` flag is honoured between chunks (mbAbortBA,
        partial progress still written back, Optimizer.cc:650-694)."""
        mcfg = self.cfg.map
        prob, kf_sel, pt_sel, obs_sel, n_pt_in = self._jit_gather_ba(
            self.map, window_mask, fixed_mask, self.inv_sigma2_table,
            max_kfs=mcfg.local_ba_max_kfs, max_points=mcfg.local_ba_max_points,
            max_obs=mcfg.local_ba_max_obs,
        )
        # start the overflow-telemetry download without blocking; read it
        # after the LM chunks (the transfer completes in their shadow)
        n_pt_in.copy_to_host_async()
        yield
        cam = self.cam
        poses, points, lam = prob.kf_poses, prob.points, jnp.float32(1e-4)
        chunk = 5
        stopped = False

        def chunks(n, poses, points, lam):
            nonlocal stopped
            done = 0
            while done < n and not stopped:
                k = min(chunk, n - done)
                poses, points, lam = self._jit_lm_chunk(
                    cam, prob, poses, points, lam,
                    n_iters=k, use_huber=True, solver="dense", n_cg=0,
                )
                if self.mapper is not None:
                    # async worker: wait for this chunk before enqueueing
                    # the next — on one chip the device runs programs in
                    # submission order, and an unbounded mapping backlog
                    # would stall the tracker's next dispatch behind it
                    # (cooperative mode gets this spacing for free from
                    # the per-frame pump cadence)
                    jax.block_until_ready(lam)
                done += k
                yield poses, points, lam
                if abortable and done < n and self.abort_ba:
                    stopped = True

        for poses, points, lam in chunks(iters1, poses, points, lam):
            yield
        if iters2 > 0 and not stopped:
            new_valid = self._jit_classify_outliers(cam, prob, poses, points)
            prob = prob._replace(obs_valid=new_valid)
            yield
            for poses, points, lam in chunks(
                iters2, poses, points, jnp.float32(1e-4)
            ):
                yield
        final_valid = self._jit_classify_outliers(cam, prob, poses, points)
        with self._map_lock():
            self.map = self._jit_scatter_ba(
                self.map, prob, kf_sel, pt_sel, obs_sel,
                poses, points, final_valid,
            )
        if int(n_pt_in) > mcfg.local_ba_max_points:
            telemetry.warn(
                "local_ba_point_overflow",
                f"local BA window has {int(n_pt_in)} points; only "
                f"{mcfg.local_ba_max_points} optimized (raise "
                f"MapConfig.local_ba_max_points)",
            )

    def _global_ba(self, window_mask, fixed_mask, iters: int):
        """Full-map BA with the matrix-free Schur-PCG solver
        (Optimizer::GlobalBundleAdjustemnt, Optimizer.cc:43-50): no window
        compaction, memory stays O(P*O) — the (K,K) Schur fill-in is never
        materialized.  Synchronous; the abortable epoch-guarded variant is
        ``_launch_gba``."""
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

    def _local_ba(self, kf_slot: int, window_mask=None, fixed_mask=None):
        """Covisibility-window BA (Optimizer::LocalBundleAdjustment),
        interruptible by the tracker's abort flag in async mode.
        ``window_mask``/``fixed_mask`` come from mapping_work_sets (device,
        top-20 covisible + self, origin never moves); computed on demand
        for direct callers."""
        if self.n_kf < 3:
            return
        if window_mask is None:
            covis = self._jit_covis(self.map)
            row = np.asarray(covis[kf_slot])
            window = np.zeros(row.shape[0], bool)
            window[kf_slot] = True
            neighbors = np.argsort(-row)[:20]
            window[neighbors[row[neighbors] > 0]] = True
            window[0] = False  # never move the origin keyframe
            window_mask = jnp.asarray(window)
            fixed_mask = jnp.asarray(~window) & self.map.kf_valid
        self.abort_ba = False  # fresh run (LocalMapping.cc:66)
        self._windowed_ba(window_mask, fixed_mask, 5, 10,
                          abortable=self.mapper is not None)
        # keep the tracker's pose consistent with the adjusted keyframe
        # (only safe when mapping runs on the tracking thread AND no newer
        # frame is in flight; the async mapper / pipelined tracker must not
        # move the live pose out from under the optimistic chain)
        if self.mapper is None and not self._inflight:
            self.last_pose = self.map.kf_pose[kf_slot]

    # ------------------------------------------------------------ global BA
    def _launch_gba(self, kf_cur: int, iters: int = 10):
        """RunGlobalBundleAdjustment (LoopClosing.cc:618-715): optimize the
        whole map with the matrix-free PCG solver.  Sync mode runs inline;
        async mode runs on a dedicated thread over an immutable snapshot
        (mapping continues), polls the stop flag + epoch between LM chunks,
        and merges under the writer lock with spanning-tree propagation of
        corrections to keyframes/points created during the run."""
        import threading

        self.gba_epoch += 1
        epoch = self.gba_epoch
        self._stop_gba = False
        snapshot = self.map
        n_kf_snap, n_pt_snap = self.n_kf, self.n_pt
        if self.mapper is None:
            self._gba_worker(snapshot, epoch, n_kf_snap, n_pt_snap, iters)
        else:
            t = threading.Thread(
                target=self._gba_worker, name="global-ba", daemon=True,
                args=(snapshot, epoch, n_kf_snap, n_pt_snap, iters),
            )
            self._gba_thread = t
            t.start()

    def _abort_running_gba(self):
        """Stop an in-flight GBA and invalidate its epoch
        (LoopClosing.cc:382-393)."""
        if self._gba_thread is not None and self._gba_thread.is_alive():
            self._stop_gba = True
            self.gba_epoch += 1

    def _gba_worker(self, snapshot, epoch, n_kf_snap, n_pt_snap, iters):
        K = snapshot.kf_pose.shape[0]
        window = snapshot.kf_valid & (jnp.arange(K) != 0)
        fixed = jnp.zeros(K, bool).at[0].set(True)
        prob = self._jit_build_ba(
            snapshot, window, fixed, self.inv_sigma2_table
        )
        # multi-device: shard the point-major arrays over the mesh; XLA
        # turns the Schur matvec's camera reductions into psum collectives
        # (parallel/dist_ba design) — the distributed-BA path IS the live
        # GBA path whenever more than one chip is visible
        if len(jax.devices()) > 1:
            from .parallel.dist_ba import make_mesh, shard_ba_problem

            prob = shard_ba_problem(prob, make_mesh())
        result, stopped = self._run_ba_chunked(
            prob, iters, 0, solver="pcg", n_cg=self.cfg.map.gba_cg_iters,
            chunk=2,
            should_stop=lambda: self._stop_gba or self.gba_epoch != epoch,
        )
        self.stats["gba_runs"] += 1
        if stopped or self.gba_epoch != epoch:
            self.stats["gba_aborted"] += 1
            return
        if self.mapper is not None:
            with self.mapper.paused():
                if self.gba_epoch != epoch:   # re-check under the lock
                    self.stats["gba_aborted"] += 1
                    return
                self._merge_gba_result(snapshot, result, n_kf_snap, n_pt_snap)
        else:
            self._merge_gba_result(snapshot, result, n_kf_snap, n_pt_snap)

    def _merge_gba_result(self, snapshot, result, n_kf_snap, n_pt_snap):
        """Write GBA results into the live map, propagating corrections to
        keyframes/points created during the run through the spanning tree
        (LoopClosing.cc:648-703).  Caller holds the writer lock."""
        m = self.map
        K = m.kf_pose.shape[0]
        cur_valid = np.asarray(m.kf_valid)
        in_gba = np.zeros(K, bool)
        in_gba[:n_kf_snap] = np.asarray(snapshot.kf_valid)[:n_kf_snap]
        old_pose = np.asarray(m.kf_pose)
        corrected = old_pose.copy()
        sel = in_gba & cur_valid
        corrected[sel] = np.asarray(result.kf_poses)[sel]
        # keyframes created during GBA: child pose = (old child<-parent
        # relative) composed onto the corrected parent, ascending slot order
        # so parents are corrected first
        parents = np.asarray(m.kf_parent)
        for k in range(n_kf_snap, self.n_kf):
            p = int(parents[k])
            if not cur_valid[k] or p < 0 or not cur_valid[p]:
                continue
            T_rel = old_pose[k] @ np.linalg.inv(old_pose[p])
            corrected[k] = T_rel @ corrected[p]

        P = m.pt_pos.shape[0]
        cur_pt_valid = np.asarray(m.pt_valid)
        in_gba_pt = np.zeros(P, bool)
        in_gba_pt[:n_pt_snap] = np.asarray(snapshot.pt_valid)[:n_pt_snap]
        pos = np.asarray(m.pt_pos).copy()
        psel = in_gba_pt & cur_pt_valid
        pos[psel] = np.asarray(result.points)[psel]
        # newer points: move with their reference keyframe
        # (LoopClosing.cc:680-700): x' = Twc_corrected * (Tcw_old * x)
        others = np.where(cur_pt_valid & ~in_gba_pt)[0]
        if len(others):
            ref = np.asarray(m.pt_ref_kf)[others]
            ok = (ref >= 0) & cur_valid[np.clip(ref, 0, K - 1)]
            idx, ref = others[ok], ref[ok]
            T_old, T_new = old_pose[ref], corrected[ref]
            xc = (
                np.einsum("nij,nj->ni", T_old[:, :3, :3], pos[idx])
                + T_old[:, :3, 3]
            )
            pos[idx] = np.einsum(
                "nji,nj->ni", T_new[:, :3, :3], xc - T_new[:, :3, 3]
            )
        self.map = m._replace(
            kf_pose=jnp.asarray(corrected), pt_pos=jnp.asarray(pos)
        )
        if self.mapper is None and not self._inflight:
            self.last_pose = self.map.kf_pose[self.ref_kf]
        else:
            # tracker re-anchors at its next frame boundary
            self._pending_pose_jump = int(self.ref_kf)

    def _cull_keyframes(self, kf_slot: int, cull_cands=None, ratios_dev=None):
        """KeyFrameCulling: drop covisible keyframes with >= 90% redundant
        landmarks (LocalMapping.cc:595-655).

        All candidates' redundancy ratios are evaluated in ONE batched
        program (vmapped keyframe_redundancy) over the device-selected
        candidate list (mapping_work_sets; covis >= 15, excluding
        origin/self/ref); candidates + ratios download in one fetch —
        mapping's second and last host sync.  Ratios are re-evaluated only
        when an earlier candidate in the same round was actually culled
        (culling removes observations, which can only lower other
        ratios)."""
        if self.n_kf < 5:
            return
        if cull_cands is None:
            covis = np.asarray(self._jit_covis(self.map))
            cands = np.where(covis[kf_slot] >= 15)[0]
            cands = [int(c) for c in cands
                     if c != 0 and c != kf_slot and c != self.ref_kf][:32]
            cull_cands = jnp.asarray(
                np.pad(np.asarray(cands, np.int32), (0, 32 - len(cands)),
                       constant_values=-1)
            )
        if ratios_dev is None:
            ratios_dev = self._jit_kf_redundancy_batch(
                self.map, jnp.clip(cull_cands, 0)
            )
        cands_np, ratios_full = jax.device_get((cull_cands, ratios_dev))
        candidates = [int(c) for c in cands_np if c >= 0]
        if not candidates:
            return
        ratios = ratios_full[: len(candidates)]
        parents = np.asarray(self.map.kf_parent)
        culled_this_round = False
        for cand, ratio in zip(candidates, ratios):
            if ratio < 0.9:
                continue
            if culled_this_round:
                # a prior cull changed the observation graph; re-check
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
            with self._map_lock():
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
            culled_this_round = True

    # -------------------------------------------------------- relocalization
    def _reloc_rescue(self, frame, pose, cand, pt_idx, th, max_dist):
        """Projection-search rescue round (ORBmatcher.cc:1385-1504)."""
        res = self._jit_reloc_rescue(
            self.cam, pose, frame,
            self.map.kf_point_idx[cand], self.map.kf_feat_valid[cand],
            self.map.kf_angle[cand],
            self.map.pt_pos, self.map.pt_valid, self.map.pt_desc,
            self.map.pt_max_dist, pt_idx,
            th=float(th), max_dist=int(max_dist),
            scale_factors=self.scale_factors,
            scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
        )
        return res.pt_idx, int(res.n_matches)

    def _relocalize(self, frame):
        """Relocalization after tracking loss (Tracking.cc:1217-1363):
        BoW candidate keyframes -> descriptor matching against their
        landmark-holding features -> batched EPnP RANSAC -> pose
        optimization -> up to two projection-search rescue rounds
        (window 10/dist 100, then window 3/dist 64), accepting only at
        >= 50 inliers (Tracking.cc:1290-1360).

        Returns (ok, pose, pt_idx)."""
        from .place.keyframe_db import detect_reloc_candidates
        from .solvers.epnp import epnp_ransac
        from .geometry import camera as cam_mod
        from .ops.descriptors import hamming as _ham
        from .ops import matching as M

        if self.db is None:
            return False, None, None
        target = self.cfg.tracking.min_inliers_reloc
        bow = self.db.signature_of(frame.desc, frame.valid)
        covis = self._jit_covis(self.map)
        cands, _ = detect_reloc_candidates(self.db, bow, covis)
        for cand in np.asarray(cands):
            if cand < 0:
                continue
            cand = int(cand)
            pt_idx_kf = self.map.kf_point_idx[cand]
            has_pt = (
                (pt_idx_kf >= 0)
                & self.map.kf_feat_valid[cand]
                & jnp.take(self.map.pt_valid, jnp.clip(pt_idx_kf, 0))
            )
            dist = _ham(self.map.kf_desc[cand], frame.desc)
            res = M.nn_match(
                dist, row_valid=has_pt, col_valid=frame.valid,
                max_dist=50, ratio=self.cfg.matcher.nn_ratio_reloc,
                mutual=True,
            )
            if int(jnp.sum(res.mask)) < 15:  # SearchByBoW bar (Tracking.cc:1253)
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
            n_inl = int(n_inl)
            if n_inl < 10:
                continue
            # rescue round 1: wide window, loose distance (Tracking.cc:1315)
            if n_inl < target:
                pt_idx, n_add = self._reloc_rescue(
                    frame, pose, cand, pt_idx, th=10.0, max_dist=100
                )
                if n_inl + n_add >= target:
                    pose, pt_idx, n_inl = self._pose_opt_against_map(
                        frame, pose, pt_idx
                    )
                    n_inl = int(n_inl)
                    # rescue round 2: narrow window around the refined pose
                    # (Tracking.cc:1330-1345)
                    if target > n_inl > 30:
                        pt_idx, n_add = self._reloc_rescue(
                            frame, pose, cand, pt_idx, th=3.0, max_dist=64
                        )
                        if n_inl + n_add >= target:
                            pose, pt_idx, n_inl = self._pose_opt_against_map(
                                frame, pose, pt_idx
                            )
                            n_inl = int(n_inl)
            if n_inl >= target:
                self._set_ref_kf(cand)
                self.state = TrackState.OK
                self.stats["relocs"] += 1
                return True, pose, pt_idx
            self.stats["reloc_rejects"] += 1
        return False, None, None

    # ---------------------------------------------------------- loop closing
    def _try_close_loop(self, kf_slot: int) -> bool:
        """Detect and correct a loop at keyframe ``kf_slot``
        (LoopClosing::Run body, synchronous)."""
        if self.db is None or self.n_kf < self.cfg.loop.kf_gap + 2:
            return False
        covis_dev = self._jit_covis(self.map)
        # detect downloads only candidate ROWS (usually none) — the full
        # (K, K) matrix costs ~50 ms/keyframe through a degraded tunnel
        bow = self.db.bow[kf_slot]
        cands = LC.detect(
            self.loop_state, self.db, None, kf_slot, bow,
            kf_gap=self.cfg.loop.kf_gap,
            consistency_th=self.cfg.loop.covisibility_consistency_th,
            covis_dev=covis_dev,
        )
        for cand in cands:
            ok, R_cm, t_cm, s_cm, pairs = LC.compute_sim3(
                self.map, self.cam, kf_slot, cand,
                fix_scale=self.sensor != "monocular",
                key=jax.random.PRNGKey(self.frame_id),
                min_inliers=self.cfg.loop.min_bow_matches,
                scale_factor=self.cfg.orb.scale_factor,
                n_levels=self.cfg.orb.n_levels,
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
            cand_row = np.asarray(covis_dev[cand])
            group_mask = jnp.asarray(
                (cand_row >= 15) | (np.arange(cand_row.shape[0]) == cand)
            ) & self.map.kf_valid
            n_total = LC.count_loop_projection_matches(
                self.map, self.cam, kf_slot, group_mask, *S_cw,
            ) + len(pairs)
            if n_total < self.cfg.loop.min_total_matches:
                continue
            # abort any in-flight GBA before correcting (LoopClosing.cc:382)
            self._abort_running_gba()
            if self.mapper is not None:
                with self.mapper.paused():
                    self._correct_loop(kf_slot, cand, R_cm, t_cm, s_cm)
            else:
                self._correct_loop(kf_slot, cand, R_cm, t_cm, s_cm)
            # spawn the epoch-guarded global BA (LoopClosing.cc:556)
            self._launch_gba(kf_slot)
            return True
        return False

    def _correct_loop(self, kf_cur: int, kf_loop: int, R_cm, t_cm, s_cm):
        """CorrectLoop (LoopClosing.cc:375-563), in the reference's order:
        Sim3 propagation through the covisible group + group-point remap,
        SearchAndFuse of the loop neighbourhood's landmarks into *every*
        corrected keyframe, LoopConnections derivation, essential-graph
        optimization, landmark correction.  The global BA is spawned by the
        caller (_try_close_loop) after this returns."""
        from .optim import pose_graph as PG

        K = self.map.kf_pose.shape[0]
        kf_valid = np.asarray(self.map.kf_valid)
        covis_before = np.asarray(self._jit_covis(self.map))
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
            int(i) for i in np.where(covis_before[kf_cur] >= 15)[0]
            if kf_valid[i]
        }
        mid_R, mid_t, mid_s = old_R, old_t, old_s
        T_cw_old = jnp.asarray(old_pose[kf_cur])
        for i in sorted(group):
            T_ic = jnp.asarray(old_pose[i]) @ se3.inv(T_cw_old)
            S_iw = sim3.compose(
                T_ic[:3, :3], T_ic[:3, 3], jnp.asarray(1.0, jnp.float32), *S_cw
            )
            mid_R = mid_R.at[i].set(S_iw[0])
            mid_t = mid_t.at[i].set(S_iw[1])
            mid_s = mid_s.at[i].set(S_iw[2])

        # write the corrected group poses + remap the group's landmarks into
        # the live map (LoopClosing.cc:413-508) so fusion happens in the
        # corrected frame
        group_arr = np.zeros(K, bool)
        group_arr[sorted(group)] = True
        group_mask = jnp.asarray(group_arr)
        pt_group = jnp.take(
            group_mask, jnp.clip(self.map.pt_ref_kf, 0)
        ) & (self.map.pt_ref_kf >= 0) & self.map.pt_valid
        mid_pts = PG.correct_points_after_pose_graph(
            self.map.pt_pos, self.map.pt_ref_kf, old_R, old_t, old_s,
            mid_R, mid_t, mid_s,
        )
        mid_se3_t = mid_t / mid_s[:, None]
        mid_poses = jax.vmap(se3.from_rt)(mid_R, mid_se3_t)
        self.map = self.map._replace(
            kf_pose=jnp.where(group_mask[:, None, None], mid_poses,
                              self.map.kf_pose),
            pt_pos=jnp.where(pt_group[:, None], mid_pts, self.map.pt_pos),
        )

        # SearchAndFuse (LoopClosing.cc:565-590): fuse the loop
        # neighbourhood's landmarks into every keyframe of the corrected
        # group (radius th=4)
        loop_group = jnp.asarray(
            (covis_before[kf_loop] >= 15)
            | (np.arange(K) == kf_loop)
        ) & self.map.kf_valid
        obs_in_loop = jnp.take(
            loop_group, jnp.clip(self.map.pt_obs_kf, 0)
        ) & (self.map.pt_obs_kf >= 0)
        loop_pt_mask = self.map.pt_valid & jnp.any(obs_in_loop, axis=1)
        for i in sorted(group):
            self.map = self._jit_fuse_masked(
                self.map, jnp.int32(i), self.cam, loop_pt_mask,
                budget=1024, scale_factor=self.cfg.orb.scale_factor,
                n_levels=self.cfg.orb.n_levels, th=4.0,
            )
        self.map = self._jit_update_stats(
            self.map, scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
        )

        # LoopConnections (LoopClosing.cc:517-539): covisibility edges the
        # fusion just created between the corrected group and the loop side
        covis_after = np.asarray(self._jit_covis(self.map))
        loop_connections: list[tuple[int, int]] = []
        for i in sorted(group):
            new_nb = np.where(
                (covis_after[i] >= 15) & (covis_before[i] < 15)
            )[0]
            for j in new_nb:
                if int(j) not in group and kf_valid[j]:
                    loop_connections.append((i, int(j)))

        # essential-graph edges: spanning tree + strong covisibility from
        # PRE-correction geometry (NonCorrectedSim3), historic loop edges,
        # the new loop connections measured in the corrected frame, and the
        # measured loop edge itself
        kf_parent = np.asarray(self.map.kf_parent)
        historic_pairs = []
        for k in range(self.n_kf):
            for le in np.asarray(self.map.kf_loop_edges[k]):
                if le >= 0 and le > k:
                    historic_pairs.append((k, int(le)))
        edges = LC.build_essential_graph_edges(
            kf_parent, covis_before, kf_valid, historic_pairs,
            old_R, old_t, old_s,
            min_covis_weight=self.cfg.map.ess_graph_min_weight,
        )
        edge_sets = [edges]
        if loop_connections:
            li = jnp.asarray([a for a, _ in loop_connections], jnp.int32)
            lj = jnp.asarray([b for _, b in loop_connections], jnp.int32)
            edge_sets.append(PG.make_edges_from_poses(
                li, lj, mid_R, mid_t, mid_s,
                jnp.ones(len(loop_connections), bool),
            ))
        # the measured loop edge: M_ji with i=loop, j=cur is exactly S_cm
        edge_sets.append(PG.PoseGraphEdges(
            i=jnp.asarray([kf_loop], jnp.int32),
            j=jnp.asarray([kf_cur], jnp.int32),
            R=jnp.asarray(R_cm)[None],
            t=jnp.asarray(t_cm)[None],
            s=jnp.asarray([np.float32(s_cm)]),
            weight=jnp.asarray([1.0], jnp.float32),
            valid=jnp.asarray([True]),
        ))
        edges = PG.PoseGraphEdges(*[
            jnp.concatenate(parts, axis=0) for parts in zip(*edge_sets)
        ])

        node_valid = jnp.asarray(kf_valid)
        node_fixed = jnp.zeros(K, bool).at[kf_loop].set(True)
        # initial values: corrected poses for the group, old elsewhere
        pg_solver = self.cfg.map.pose_graph_solver
        if pg_solver == "auto":
            pg_solver = (
                "pcg" if K > self.cfg.map.pose_graph_dense_max else "dense"
            )
        opt_R, opt_t, opt_s = PG.optimize_pose_graph(
            mid_R, mid_t, mid_s, node_valid, node_fixed, edges,
            fix_scale=self.sensor != "monocular",
            solver=pg_solver,
            n_cg=self.cfg.map.pose_graph_cg_iters or None,
        )

        # correct landmarks through their reference keyframes — from the
        # post-propagation (mid) frame, since group points were already
        # remapped — then convert Sim3 nodes back to SE3 (LoopClosing.cc:488)
        new_pts = PG.correct_points_after_pose_graph(
            self.map.pt_pos, self.map.pt_ref_kf, mid_R, mid_t, mid_s,
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
            kf_loop_edges=self.map.kf_loop_edges
                .at[kf_cur, 0].set(kf_loop)
                .at[kf_loop, 0].set(kf_cur),
        )
        self.map = self._jit_update_stats(
            self.map, scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
        )
        self.loop_state.last_loop_kf = kf_cur
        if self.mapper is None:
            self.last_pose = self.map.kf_pose[kf_cur]
            self.velocity = None
        else:
            # tracker applies the corrected pose at its next frame boundary
            self._pending_pose_jump = kf_cur

    # ----------------------------------------------------------- trajectory
    def _log_frame(self, timestamp, lost: bool, Tcr=None, frame_id=None):
        if Tcr is None:
            Tcr = np.asarray(
                self.last_pose @ se3.inv(self.map.kf_pose[self.ref_kf])
            )
        self.trajectory.append(
            FrameLog(self.frame_id if frame_id is None else frame_id,
                     timestamp, Tcr, self.ref_kf, lost)
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
        """Drain the mapping pipeline (System::Shutdown, System.cc:336-353)."""
        self.flush_pipeline()
        self._drain_mapping()
        if self.mapper is not None:
            self.mapper.wait_idle(timeout=300)
            self.mapper.shutdown()
            self.mapper = None

    def wait_mapping_idle(self, timeout: float = 60.0) -> bool:
        """Block until mapping (async worker or cooperative pipeline) has
        consumed every queued keyframe.  Benchmark/health hook."""
        self._drain_mapping()
        if self.mapper is not None:
            return self.mapper.wait_idle(timeout=timeout)
        return not self._coop_busy()

    def tracked_logs(self) -> list[FrameLog]:
        """Frame logs with a pose, i.e. excluding lost frames — lost frames
        are skipped in every trajectory product, matching the reference
        (System.cc:387-388 ``if(*lbL) continue``)."""
        self.flush_pipeline()
        return [log for log in self.trajectory if not log.lost]

    def tracked_frame_ids(self) -> np.ndarray:
        return np.asarray([log.frame_id for log in self.tracked_logs()])

    def frame_poses(self) -> np.ndarray:
        """(n, 4, 4) Tcw per *tracked* frame (lost frames skipped),
        recomposed through current KF poses (System::SaveTrajectoryTUM
        semantics, System.cc:355-415)."""
        kf_poses = np.asarray(self.map.kf_pose)
        out = [
            log.Tcr @ self._resolve_kf_pose(log.ref_kf, kf_poses)
            for log in self.tracked_logs()
        ]
        if not out:
            return np.zeros((0, 4, 4), dtype=np.float32)
        return np.stack(out)

    def camera_centers(self) -> np.ndarray:
        poses = self.frame_poses()
        return np.stack([-(T[:3, :3].T @ T[:3, 3]) for T in poses])

    def export_trajectory_tum(self, path: str):
        poses = self.frame_poses()
        with open(path, "w") as f:
            for log, Tcw in zip(self.tracked_logs(), poses):
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
