"""The SLAM map as fixed-shape arrays (structure-of-arrays, functional updates).

Replaces the reference's pointer-graph map — Map (Map.cc), KeyFrame
(KeyFrame.cc), MapPoint (MapPoint.cc) — and its mutex discipline with
immutable padded banks + validity masks.  Tombstones (``SetBadFlag``) become
cleared valid bits; the "visited marker" scratch fields
(mnTrackReferenceForFrame & co.) become ephemeral masks computed on demand;
the big map-update lock becomes functional snapshots (readers keep the old
arrays, writers produce new ones).

Capacities are static (from MapConfig): K keyframe slots x N feature slots,
P point slots x O observation slots.  All update functions are jit-safe and
return a new MapState.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import MapConfig


class MapState(NamedTuple):
    """Device-resident map banks.  Invalid slots are masked, never read."""

    # --- keyframe bank ----------------------------------------------------
    kf_pose: jax.Array        # (K, 4, 4) Tcw
    kf_valid: jax.Array       # (K,) bool
    kf_frame_id: jax.Array    # (K,) int32 source frame index
    # per-keyframe feature banks (snapshot of the Frame at insertion)
    kf_xy: jax.Array          # (K, N, 2) float32 undistorted keypoint coords
    kf_uvr: jax.Array         # (K, N, 3) float32 (u, v, uR); uR<0 => mono obs
    kf_octave: jax.Array      # (K, N) int32
    kf_angle: jax.Array       # (K, N) float32 degrees
    kf_desc: jax.Array        # (K, N, 8) uint32 packed rBRIEF
    kf_feat_valid: jax.Array  # (K, N) bool
    kf_point_idx: jax.Array   # (K, N) int32 map-point slot per feature (-1)
    # --- map-point bank ---------------------------------------------------
    pt_pos: jax.Array         # (P, 3) world position
    pt_valid: jax.Array       # (P,) bool
    pt_desc: jax.Array        # (P, 8) uint32 distinctive descriptor
    pt_normal: jax.Array      # (P, 3) mean viewing direction
    pt_min_dist: jax.Array    # (P,) scale-invariance band (MapPoint.cc:383-391)
    pt_max_dist: jax.Array    # (P,)
    pt_ref_kf: jax.Array      # (P,) int32 reference keyframe slot
    pt_first_kf: jax.Array    # (P,) int32 kf slot that created the point
    pt_visible: jax.Array     # (P,) int32 times predicted visible
    pt_found: jax.Array       # (P,) int32 times actually matched
    # observation incidence, point-major (transpose of kf_point_idx)
    pt_obs_kf: jax.Array      # (P, O) int32 keyframe slot (-1 empty)
    pt_obs_feat: jax.Array    # (P, O) int32 feature slot in that keyframe
    # --- graph ------------------------------------------------------------
    kf_parent: jax.Array      # (K,) int32 spanning-tree parent (-1 root)
    kf_loop_edges: jax.Array  # (K, 8) int32 loop edge targets (-1 empty)

    @property
    def capacity(self):
        K, N = self.kf_feat_valid.shape
        P, O = self.pt_obs_kf.shape
        return K, N, P, O


def create_empty(cfg: MapConfig, n_feat_slots: int) -> MapState:
    K, P, O = cfg.max_keyframes, cfg.max_points, cfg.max_obs_per_point
    N = n_feat_slots
    f32, i32 = jnp.float32, jnp.int32
    return MapState(
        kf_pose=jnp.tile(jnp.eye(4, dtype=f32), (K, 1, 1)),
        kf_valid=jnp.zeros(K, bool),
        kf_frame_id=jnp.full(K, -1, i32),
        kf_xy=jnp.zeros((K, N, 2), f32),
        kf_uvr=jnp.full((K, N, 3), -1.0, f32),
        kf_octave=jnp.zeros((K, N), i32),
        kf_angle=jnp.zeros((K, N), f32),
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_feat_valid=jnp.zeros((K, N), bool),
        kf_point_idx=jnp.full((K, N), -1, i32),
        pt_pos=jnp.zeros((P, 3), f32),
        pt_valid=jnp.zeros(P, bool),
        pt_desc=jnp.zeros((P, 8), jnp.uint32),
        pt_normal=jnp.zeros((P, 3), f32),
        pt_min_dist=jnp.zeros(P, f32),
        pt_max_dist=jnp.zeros(P, f32),
        pt_ref_kf=jnp.full(P, -1, i32),
        pt_first_kf=jnp.full(P, -1, i32),
        pt_visible=jnp.zeros(P, i32),
        pt_found=jnp.zeros(P, i32),
        pt_obs_kf=jnp.full((P, O), -1, i32),
        pt_obs_feat=jnp.full((P, O), -1, i32),
        kf_parent=jnp.full(K, -1, i32),
        kf_loop_edges=jnp.full((K, 8), -1, i32),
    )


# ---------------------------------------------------------------------------
# Covisibility graph (replaces KeyFrame::UpdateConnections, KeyFrame.cc:268-354)
# ---------------------------------------------------------------------------

_COVIS_CHUNK = 8192


def covisibility_matrix(state: MapState) -> jax.Array:
    """(K, K) int32 weights: number of map points seen by both keyframes.

    One MXU matmul per point chunk: scatter each chunk's observations into
    a point-by-keyframe incidence matrix B and accumulate B^T B.  Replaces
    KeyFrame::UpdateConnections' per-object counting (KeyFrame.cc:268-354)
    and the earlier O(O^2) segment-sum unroll (which at full capacity was
    1024 scatters over K^2 segments).
    """
    K, N, P, O = state.capacity
    kf = state.pt_obs_kf                          # (P, O)
    valid = (kf >= 0) & state.pt_valid[:, None]
    kfc = jnp.where(valid, kf, -1)

    chunk = min(_COVIS_CHUNK, P)
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    if pad:
        kfc = jnp.pad(kfc, ((0, pad), (0, 0)), constant_values=-1)

    ids = jnp.arange(K, dtype=jnp.int32)

    def body(carry, kf_c):                        # kf_c: (chunk, O)
        # incidence B via vectorized one-hot compares (TPU scatter-add
        # serializes; compare+sum stays on the VPU at full lane width).
        # Accumulate per observation slot so no (chunk, O, K) temporary
        # is materialized.
        B = jnp.zeros((kf_c.shape[0], K), jnp.float32)
        for o in range(O):
            B = B + (kf_c[:, o, None] == ids[None, :]).astype(jnp.float32)
        return carry + B.T @ B, None

    W, _ = jax.lax.scan(
        body,
        jnp.zeros((K, K), jnp.float32),
        kfc.reshape(n_chunks, chunk, O),
    )
    W = W.astype(jnp.int32)
    return W * (1 - jnp.eye(K, dtype=jnp.int32))


def best_covisible(weights: jax.Array, kf: jax.Array, top_k: int):
    """Top-k covisible neighbors of keyframe ``kf`` (GetBestCovisibilityKeyFrames)."""
    w = weights[kf]
    vals, idx = jax.lax.top_k(w, top_k)
    return jnp.where(vals > 0, idx, -1), vals


# ---------------------------------------------------------------------------
# Point statistics (replaces MapPoint::ComputeDistinctiveDescriptors /
# UpdateNormalAndDepth, MapPoint.cc:229-391)
# ---------------------------------------------------------------------------

def update_point_stats(
    state: MapState, scale_factor: float, n_levels: int
) -> MapState:
    """Recompute distinctive descriptor, normal, and distance band for all
    valid points from their current observations.  Fully batched.
    """
    P, O = state.pt_obs_kf.shape
    kfc = jnp.clip(state.pt_obs_kf, 0)
    ftc = jnp.clip(state.pt_obs_feat, 0)
    obs_ok = (state.pt_obs_kf >= 0) & state.pt_valid[:, None]
    obs_ok = obs_ok & jnp.take(state.kf_valid, kfc)

    # descriptors of all observations: (P, O, 8)
    descs = state.kf_desc[kfc, ftc]
    from ..ops.descriptors import unpack_pm1

    # pairwise Hamming inside each point's observation set, chunked over P
    # so the (chunk, O, 256) unpack stays tens of MB at full map capacity
    big = 1e9
    chunk = min(2048, P)
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    descs_c = jnp.pad(descs, ((0, pad), (0, 0), (0, 0))) if pad else descs
    ok_c = jnp.pad(obs_ok, ((0, pad), (0, 0))) if pad else obs_ok

    def chunk_best(args):
        d, ok = args                                   # (chunk, O, 8), (chunk, O)
        pm1 = unpack_pm1(d, dtype=jnp.float32)         # (chunk, O, 256)
        # +-1 dots are exact integers in [-256, 256]: bf16-exact, so the
        # MXU can run at DEFAULT precision (6x the f32-highest rate)
        dots = jnp.einsum("poi,pqi->poq", pm1, pm1,
                          precision=jax.lax.Precision.DEFAULT)
        ham = (256.0 - dots) * 0.5
        pair_ok = ok[:, :, None] & ok[:, None, :]
        # median distance to others per observation ~ reference takes
        # median; sum is an equivalent minimizer for typical O and cheaper
        ham_sum = jnp.where(
            ok, jnp.sum(jnp.where(pair_ok, ham, 0.0), axis=2), big
        )
        return jnp.argmin(ham_sum, axis=1)

    best_obs = jax.lax.map(
        chunk_best,
        (descs_c.reshape(n_chunks, chunk, O, 8), ok_c.reshape(n_chunks, chunk, O)),
    ).reshape(-1)[:P]
    new_desc = descs[jnp.arange(P), best_obs]
    has_obs = jnp.any(obs_ok, axis=1)
    pt_desc = jnp.where(has_obs[:, None], new_desc, state.pt_desc)

    # normals: mean of unit vectors from camera centres to the point
    Twc_R = jnp.swapaxes(state.kf_pose[:, :3, :3], 1, 2)     # (K,3,3)
    centers = -jnp.einsum("kij,kj->ki", Twc_R, state.kf_pose[:, :3, 3])
    cam_c = centers[kfc]                                     # (P, O, 3)
    vec = state.pt_pos[:, None, :] - cam_c
    n = vec / (jnp.linalg.norm(vec, axis=-1, keepdims=True) + 1e-12)
    normal = jnp.sum(jnp.where(obs_ok[..., None], n, 0.0), axis=1)
    cnt = jnp.maximum(jnp.sum(obs_ok, axis=1), 1)
    normal = normal / cnt[:, None]
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.where(nn < 1e-12, 1.0, nn)
    pt_normal = jnp.where(has_obs[:, None], normal, state.pt_normal)

    # distance band from the reference observation's octave
    # (MapPoint.cc:365-380: dist * scale^level relative to ref KF)
    ref_slot = best_obs  # use the distinctive obs as reference
    ref_kf = kfc[jnp.arange(P), ref_slot]
    ref_ft = ftc[jnp.arange(P), ref_slot]
    dist_ref = jnp.linalg.norm(state.pt_pos - centers[ref_kf], axis=-1)
    level = state.kf_octave[ref_kf, ref_ft]
    level_sf = scale_factor ** level.astype(jnp.float32)
    max_dist = dist_ref * level_sf
    min_dist = max_dist / (scale_factor ** (n_levels - 1))
    pt_max = jnp.where(has_obs, max_dist, state.pt_max_dist)
    pt_min = jnp.where(has_obs, min_dist, state.pt_min_dist)

    return state._replace(
        pt_desc=pt_desc, pt_normal=pt_normal,
        pt_min_dist=pt_min, pt_max_dist=pt_max,
    )


def update_point_stats_subset(
    state: MapState, pt_idx: jax.Array, scale_factor: float, n_levels: int
) -> MapState:
    """Refresh distinctive descriptor / normal / distance band for the
    point slots in ``pt_idx`` ((M,) int32; negatives = padding).

    The per-keyframe incremental form of :func:`update_point_stats`: only
    points whose observation set changed need refreshing, and every such
    point is observed by the current keyframe after triangulation/fusion —
    so local mapping passes ``kf_point_idx[kf_slot]``.  The reference does
    the same work per-point on observation changes
    (MapPoint::ComputeDistinctiveDescriptors + UpdateNormalAndDepth,
    MapPoint.cc:225-296); the full-bank batch refresh at 64k points
    measured 56 ms/keyframe on v5e — 64x this subset's cost."""
    from ..ops.descriptors import unpack_pm1

    P, O = state.pt_obs_kf.shape
    M = pt_idx.shape[0]
    row_ok = (pt_idx >= 0) & (pt_idx < P)
    pi = jnp.clip(pt_idx, 0, P - 1)
    obs_kf = state.pt_obs_kf[pi]                       # (M, O)
    obs_ft = state.pt_obs_feat[pi]
    kfc = jnp.clip(obs_kf, 0)
    ftc = jnp.clip(obs_ft, 0)
    obs_ok = (
        (obs_kf >= 0) & state.pt_valid[pi][:, None]
        & jnp.take(state.kf_valid, kfc) & row_ok[:, None]
    )
    descs = state.kf_desc[kfc, ftc]                    # (M, O, 8)
    pm1 = unpack_pm1(descs, dtype=jnp.float32)
    dots = jnp.einsum("poi,pqi->poq", pm1, pm1,
                      precision=jax.lax.Precision.DEFAULT)
    ham = (256.0 - dots) * 0.5
    pair_ok = obs_ok[:, :, None] & obs_ok[:, None, :]
    ham_sum = jnp.where(
        obs_ok, jnp.sum(jnp.where(pair_ok, ham, 0.0), axis=2), 1e9
    )
    best_obs = jnp.argmin(ham_sum, axis=1)             # (M,)
    rows = jnp.arange(M)
    new_desc = descs[rows, best_obs]
    has_obs = jnp.any(obs_ok, axis=1) & row_ok

    Twc_R = jnp.swapaxes(state.kf_pose[:, :3, :3], 1, 2)
    centers = -jnp.einsum("kij,kj->ki", Twc_R, state.kf_pose[:, :3, 3])
    cam_c = centers[kfc]                               # (M, O, 3)
    pos = state.pt_pos[pi]
    vec = pos[:, None, :] - cam_c
    n = vec / (jnp.linalg.norm(vec, axis=-1, keepdims=True) + 1e-12)
    normal = jnp.sum(jnp.where(obs_ok[..., None], n, 0.0), axis=1)
    cnt = jnp.maximum(jnp.sum(obs_ok, axis=1), 1)
    normal = normal / cnt[:, None]
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.where(nn < 1e-12, 1.0, nn)

    ref_kf = kfc[rows, best_obs]
    ref_ft = ftc[rows, best_obs]
    dist_ref = jnp.linalg.norm(pos - centers[ref_kf], axis=-1)
    level = state.kf_octave[ref_kf, ref_ft]
    level_sf = scale_factor ** level.astype(jnp.float32)
    max_dist = dist_ref * level_sf
    min_dist = max_dist / (scale_factor ** (n_levels - 1))

    tgt = jnp.where(has_obs, pi, P)                    # drop pad rows
    return state._replace(
        pt_desc=state.pt_desc.at[tgt].set(new_desc, mode="drop"),
        pt_normal=state.pt_normal.at[tgt].set(normal, mode="drop"),
        pt_min_dist=state.pt_min_dist.at[tgt].set(min_dist, mode="drop"),
        pt_max_dist=state.pt_max_dist.at[tgt].set(max_dist, mode="drop"),
    )


def predict_scale(
    state_dist: jax.Array, max_dist: jax.Array, scale_factor: float, n_levels: int
) -> jax.Array:
    """Octave prediction from distance (MapPoint::PredictScale, MapPoint.cc:393-423)."""
    ratio = max_dist / jnp.maximum(state_dist, 1e-9)
    # small epsilon so exact level boundaries (ratio == sf^k) don't round up
    level = jnp.ceil(jnp.log(ratio) / np.log(scale_factor) - 1e-4).astype(jnp.int32)
    return jnp.clip(level, 0, n_levels - 1)


def n_observations(state: MapState) -> jax.Array:
    """(P,) int32 observation counts (MapPoint::Observations)."""
    ok = (state.pt_obs_kf >= 0) & jnp.take(
        state.kf_valid, jnp.clip(state.pt_obs_kf, 0)
    )
    return jnp.sum(ok.astype(jnp.int32), axis=1)
