"""Jitted kernels for the per-frame tracking path.

These are the array forms of the reference's tracking searches:
- ``match_motion_model``  = ORBmatcher::SearchByProjection(Frame, LastFrame)
  (ORBmatcher.cc:1247-1383): project last frame's points with the velocity
  pose, window by radius*scale, octave band, ratio + rotation gates.
- ``select_local_points`` = Tracking::UpdateLocalPoints + Frame::isInFrustum
  (Tracking.cc:1090-1113, Frame.cc:284-339): frustum/distance/angle culling
  of the point bank, then a top-k budget so downstream matching has a
  static shape.
- ``match_local_points``  = ORBmatcher::SearchByProjection(Frame, vector)
  (ORBmatcher.cc:45-135): radius from viewing cosine, predicted-octave band.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from ..geometry.camera import Camera
from ..models.map_state import predict_scale
from ..ops import matching as M
from ..ops.descriptors import hamming


class ProjMatchResult(NamedTuple):
    pt_idx: jax.Array     # (N,) map-point slot matched to each feature (-1)
    n_matches: jax.Array  # () int32


def match_motion_model(
    cam: Camera,
    Tcw: jax.Array,
    frame,                    # FrameData
    last_xy: jax.Array,       # (N, 2) last frame keypoint coords (unused, doc)
    last_pt: jax.Array,       # (N,) last frame's matched point slots (-1)
    last_octave: jax.Array,   # (N,) last frame keypoint octaves
    pt_pos: jax.Array,        # (P, 3) point bank
    pt_valid: jax.Array,      # (P,)
    pt_desc: jax.Array,       # (P, 8)
    last_angle: jax.Array,    # (N,) last frame keypoint angles (degrees)
    *,
    th: float,
    scale_factors: np.ndarray,
    nn_max_dist: int = 100,   # TH_HIGH (ORBmatcher.cc:1291)
    nn_ratio: float = 0.9,    # mfNNratio for tracking (Tracking.cc:784)
) -> ProjMatchResult:
    """Project last frame's tracked points into the current frame and match.

    Rows = last-frame features carrying points; cols = current features.
    Returns per-current-feature point assignment.
    """
    has_pt = (last_pt >= 0) & jnp.take(pt_valid, jnp.clip(last_pt, 0))
    pw = pt_pos[jnp.clip(last_pt, 0)]                  # (N, 3)
    pc = se3.transform(Tcw, pw)
    z_ok = pc[:, 2] > 1e-3
    z_safe = jnp.where(z_ok, pc[:, 2], 1.0)
    u = cam.fx * pc[:, 0] / z_safe + cam.cx
    v = cam.fy * pc[:, 1] / z_safe + cam.cy
    uv = jnp.stack([u, v], axis=-1)
    in_img = (
        (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    )
    row_valid = has_pt & z_ok & in_img

    sf = jnp.asarray(scale_factors)
    radius = th * jnp.take(sf, jnp.clip(last_octave, 0, len(scale_factors) - 1))
    geo = M.window_mask(uv, frame.xy, radius)
    geo = geo & M.octave_band_mask(last_octave, frame.octave, -1, 1)

    desc_rows = pt_desc[jnp.clip(last_pt, 0)]
    dist = hamming(desc_rows, frame.desc)
    res = M.nn_match(
        dist,
        row_valid=row_valid,
        col_valid=frame.valid,
        extra_mask=geo,
        max_dist=nn_max_dist,
        ratio=nn_ratio,
        mutual=True,
    )
    res = M.resolve_duplicates(res, frame.n_slots)
    # rotation-consistency histogram between last-frame and current angles
    # (ORBmatcher.cc:1336-1378): without it, a wrong velocity prediction can
    # lock onto shifted repeats of the texture and run away.
    keep = M.rotation_consistency_mask(last_angle, frame.angle, res)
    res = M.MatchResult(
        idx=jnp.where(keep, res.idx, -1),
        dist=jnp.where(keep, res.dist, M.BIG),
        mask=keep,
    )

    # scatter: current feature -> point slot
    pt_of_feat = jnp.full((frame.n_slots,), -1, jnp.int32)
    col = jnp.where(res.mask, res.idx, frame.n_slots)
    pt_of_feat = pt_of_feat.at[col].set(
        jnp.where(res.mask, last_pt, -1).astype(jnp.int32), mode="drop"
    )
    return ProjMatchResult(
        pt_idx=pt_of_feat, n_matches=jnp.sum(res.mask.astype(jnp.int32))
    )


def match_reference_kf(
    frame,                    # FrameData
    kf_desc: jax.Array,       # (N, 8) reference keyframe descriptors
    kf_pt_idx: jax.Array,     # (N,) reference keyframe's point slots (-1)
    kf_feat_valid: jax.Array, # (N,)
    kf_angle: jax.Array,      # (N,) degrees
    pt_valid: jax.Array,      # (P,)
    *,
    nn_ratio: float = 0.7,    # matcher(0.7, true) (Tracking.cc:688)
    max_dist: int = 50,       # TH_LOW (SearchByBoW, ORBmatcher.cc:198)
) -> ProjMatchResult:
    """TrackReferenceKeyFrame matching (Tracking.cc:681-719): associate the
    current frame's features with the reference keyframe's landmark-bearing
    features by descriptor distance.

    The reference goes through SearchByBoW (ORBmatcher.cc:161-273) — BoW
    node buckets exist only to prune the O(N^2) CPU loop; here the full
    masked Hamming matrix is one MXU matmul, so the buckets are dropped and
    the gates (TH_LOW, 0.7 ratio, rotation histogram, one-to-one) are kept.
    """
    has_pt = (
        (kf_pt_idx >= 0)
        & kf_feat_valid
        & jnp.take(pt_valid, jnp.clip(kf_pt_idx, 0))
    )
    dist = hamming(kf_desc, frame.desc)
    res = M.nn_match(
        dist, row_valid=has_pt, col_valid=frame.valid,
        max_dist=max_dist, ratio=nn_ratio, mutual=True,
    )
    res = M.resolve_duplicates(res, frame.n_slots)
    keep = M.rotation_consistency_mask(kf_angle, frame.angle, res)
    res = M.MatchResult(
        idx=jnp.where(keep, res.idx, -1),
        dist=jnp.where(keep, res.dist, M.BIG),
        mask=keep,
    )
    pt_of_feat = jnp.full((frame.n_slots,), -1, jnp.int32)
    col = jnp.where(res.mask, res.idx, frame.n_slots)
    pt_of_feat = pt_of_feat.at[col].set(
        jnp.where(res.mask, kf_pt_idx, -1).astype(jnp.int32), mode="drop"
    )
    return ProjMatchResult(
        pt_idx=pt_of_feat, n_matches=jnp.sum(res.mask.astype(jnp.int32))
    )


def match_kf_points_by_projection(
    cam: Camera,
    Tcw: jax.Array,
    frame,                     # FrameData
    kf_pt_idx: jax.Array,      # (N,) candidate keyframe's point slots
    kf_feat_valid: jax.Array,  # (N,)
    kf_angle: jax.Array,       # (N,) degrees (for the rotation histogram)
    pt_pos: jax.Array,         # (P, 3)
    pt_valid: jax.Array,       # (P,)
    pt_desc: jax.Array,        # (P, 8)
    pt_max_dist: jax.Array,    # (P,) scale band for octave prediction
    existing_pt: jax.Array,    # (N,) current frame's matches (kept, excluded)
    *,
    th: float,
    max_dist: int,
    scale_factors: np.ndarray,
    scale_factor: float,
    n_levels: int,
) -> ProjMatchResult:
    """Relocalization rescue search (ORBmatcher::SearchByProjection(Frame,
    KeyFrame, sAlreadyFound, th, ORBdist), ORBmatcher.cc:1385-1504): project
    the candidate keyframe's landmarks not already found into the current
    frame at the current pose estimate, window by th*scale^predictedLevel,
    octave band [pred-1, pred+1], distance <= ORBdist, rotation histogram.

    Rows = candidate keyframe features; returns additional associations
    merged onto ``existing_pt``.
    """
    P = pt_pos.shape[0]
    scatter_idx = jnp.where(existing_pt >= 0, existing_pt, P)
    already = jnp.zeros(P, bool).at[scatter_idx].set(True, mode="drop")

    has_pt = (
        kf_feat_valid
        & (kf_pt_idx >= 0)
        & jnp.take(pt_valid, jnp.clip(kf_pt_idx, 0))
        & ~jnp.take(already, jnp.clip(kf_pt_idx, 0))
    )
    pw = pt_pos[jnp.clip(kf_pt_idx, 0)]
    pc = se3.transform(Tcw, pw)
    z_ok = pc[:, 2] > 1e-3
    z_safe = jnp.where(z_ok, pc[:, 2], 1.0)
    u = cam.fx * pc[:, 0] / z_safe + cam.cx
    v = cam.fy * pc[:, 1] / z_safe + cam.cy
    uv = jnp.stack([u, v], axis=-1)
    in_img = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    row_valid = has_pt & z_ok & in_img

    Twc = se3.inv(Tcw)
    center = se3.translation(Twc)
    dist3d = jnp.linalg.norm(pw - center, axis=-1)
    pred = predict_scale(
        dist3d, jnp.take(pt_max_dist, jnp.clip(kf_pt_idx, 0)),
        scale_factor, n_levels,
    )
    sf = jnp.asarray(scale_factors)
    radius = th * jnp.take(sf, jnp.clip(pred, 0, len(scale_factors) - 1))
    geo = M.window_mask(uv, frame.xy, radius)
    geo = geo & M.octave_band_mask(pred, frame.octave, -1, 1)

    col_free = frame.valid & (existing_pt < 0)
    dmat = hamming(pt_desc[jnp.clip(kf_pt_idx, 0)], frame.desc)
    res = M.nn_match(
        dmat, row_valid=row_valid, col_valid=col_free,
        extra_mask=geo, max_dist=max_dist,
    )
    res = M.resolve_duplicates(res, frame.n_slots)
    keep = M.rotation_consistency_mask(kf_angle, frame.angle, res)
    res = M.MatchResult(
        idx=jnp.where(keep, res.idx, -1),
        dist=jnp.where(keep, res.dist, M.BIG),
        mask=keep,
    )
    col = jnp.where(res.mask, res.idx, frame.n_slots)
    pt_of_feat = existing_pt.at[col].set(
        jnp.where(res.mask, kf_pt_idx, -1).astype(jnp.int32), mode="drop"
    )
    return ProjMatchResult(
        pt_idx=pt_of_feat, n_matches=jnp.sum(res.mask.astype(jnp.int32))
    )


class VoMatchResult(NamedTuple):
    pw: jax.Array        # (N, 3) temporal 3D point per current feature
    mask: jax.Array      # (N,) matched to a temporal point
    n_matches: jax.Array


def match_vo_points(
    cam: Camera,
    Tcw_pred: jax.Array,       # predicted pose of the current frame
    frame,                     # current FrameData
    last_xy: jax.Array,        # (N, 2) last frame keypoints
    last_depth: jax.Array,     # (N,) last frame per-feature depth (<=0 none)
    last_valid: jax.Array,     # (N,)
    last_pt: jax.Array,        # (N,) last frame map-point slots (-1)
    last_octave: jax.Array,
    last_angle: jax.Array,
    last_desc: jax.Array,      # (N, 8)
    Tcw_last: jax.Array,       # last frame pose
    *,
    th: float,
    scale_factors: np.ndarray,
    nn_max_dist: int = 100,
    nn_ratio: float = 0.9,
) -> VoMatchResult:
    """Localization-only visual-odometry matching (`mbVO`,
    Tracking.cc:299-361 + UpdateLastFrame temporal points,
    Tracking.cc:724-778): unproject the last frame's *unmatched* depth
    features into temporal 3D points and match them into the current frame,
    so tracking survives unmapped regions with the map frozen.
    """
    has_depth = last_valid & (last_depth > 0) & (last_pt < 0)
    z = jnp.where(has_depth, last_depth, 1.0)
    xc = (last_xy[:, 0] - cam.cx) / cam.fx * z
    yc = (last_xy[:, 1] - cam.cy) / cam.fy * z
    pc = jnp.stack([xc, yc, z], axis=-1)
    Twc_last = se3.inv(Tcw_last)
    pw = se3.transform(Twc_last, pc)                      # (N, 3)

    pcc = se3.transform(Tcw_pred, pw)
    z_ok = pcc[:, 2] > 1e-3
    z_safe = jnp.where(z_ok, pcc[:, 2], 1.0)
    u = cam.fx * pcc[:, 0] / z_safe + cam.cx
    v = cam.fy * pcc[:, 1] / z_safe + cam.cy
    uv = jnp.stack([u, v], axis=-1)
    in_img = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    row_valid = has_depth & z_ok & in_img

    sf = jnp.asarray(scale_factors)
    radius = th * jnp.take(sf, jnp.clip(last_octave, 0, len(scale_factors) - 1))
    geo = M.window_mask(uv, frame.xy, radius)
    geo = geo & M.octave_band_mask(last_octave, frame.octave, -1, 1)
    dist = hamming(last_desc, frame.desc)
    res = M.nn_match(
        dist, row_valid=row_valid, col_valid=frame.valid,
        extra_mask=geo, max_dist=nn_max_dist, ratio=nn_ratio, mutual=True,
    )
    res = M.resolve_duplicates(res, frame.n_slots)
    keep = M.rotation_consistency_mask(last_angle, frame.angle, res)

    # scatter temporal point positions onto current features
    col = jnp.where(keep, res.idx, frame.n_slots)
    out_pw = jnp.zeros((frame.n_slots, 3), pw.dtype).at[col].set(
        pw, mode="drop"
    )
    out_mask = jnp.zeros((frame.n_slots,), bool).at[col].set(
        keep, mode="drop"
    )
    return VoMatchResult(
        pw=out_pw, mask=out_mask,
        n_matches=jnp.sum(keep.astype(jnp.int32)),
    )


class LocalPoints(NamedTuple):
    idx: jax.Array        # (B,) point slots (-1 pad)
    valid: jax.Array      # (B,)
    uv: jax.Array         # (B, 2) projected pixel coords
    pred_level: jax.Array # (B,) predicted octave
    view_cos: jax.Array   # (B,)


def select_local_points(
    cam: Camera,
    Tcw: jax.Array,
    pt_pos: jax.Array,
    pt_valid: jax.Array,
    pt_normal: jax.Array,
    pt_min_dist: jax.Array,
    pt_max_dist: jax.Array,
    already_matched: jax.Array,   # (P,) bool — tracked this frame, skip
    *,
    budget: int,
    scale_factor: float,
    n_levels: int,
) -> LocalPoints:
    """Frustum-cull the point bank and keep a static-size candidate set.

    Reproduces Frame::isInFrustum gates (Frame.cc:284-339): positive depth,
    in image, distance within [0.8*min, 1.2*max], viewing cos > 0.5; plus
    scale prediction for the matcher.
    """
    P = pt_pos.shape[0]
    pc = se3.transform(Tcw, pt_pos)
    z = pc[:, 2]
    z_ok = z > 1e-3
    z_safe = jnp.where(z_ok, z, 1.0)
    u = cam.fx * pc[:, 0] / z_safe + cam.cx
    v = cam.fy * pc[:, 1] / z_safe + cam.cy
    in_img = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)

    Twc = se3.inv(Tcw)
    center = se3.translation(Twc)
    po = pt_pos - center
    dist = jnp.linalg.norm(po, axis=-1)
    dist_ok = (dist >= 0.8 * pt_min_dist) & (dist <= 1.2 * pt_max_dist)
    view_cos = jnp.sum(po * pt_normal, axis=-1) / jnp.maximum(dist, 1e-9)
    angle_ok = view_cos > 0.5

    ok = pt_valid & z_ok & in_img & dist_ok & angle_ok & ~already_matched
    # static-size candidate set: prefer close points (they constrain pose best)
    score = jnp.where(ok, -dist, -jnp.inf)
    top_score, top_idx = jax.lax.top_k(score, budget)
    sel_valid = jnp.isfinite(top_score)
    pred = predict_scale(
        jnp.take(dist, top_idx), jnp.take(pt_max_dist, top_idx),
        scale_factor, n_levels,
    )
    return LocalPoints(
        idx=jnp.where(sel_valid, top_idx, -1).astype(jnp.int32),
        valid=sel_valid,
        uv=jnp.stack([jnp.take(u, top_idx), jnp.take(v, top_idx)], axis=-1),
        pred_level=pred,
        view_cos=jnp.take(view_cos, top_idx),
    )


def match_local_points(
    frame,
    local: LocalPoints,
    pt_desc: jax.Array,
    existing_pt: jax.Array,     # (N,) current per-feature match (kept)
    *,
    th: float,
    scale_factors: np.ndarray,
    nn_ratio: float = 0.8,
    nn_max_dist: int = 100,     # TH_HIGH gate (ORBmatcher.cc:109)
    use_pallas: bool = False,
) -> ProjMatchResult:
    """Match the selected local points against unmatched frame features.

    Radius: (2.5 if viewCos > 0.998 else 4.0) * th_factor * scale^predLevel
    (ORBmatcher.cc:85,130-135); octave band [pred-1, pred]; ratio 0.8 between
    best and second best (ORBmatcher.cc:105-124).

    use_pallas routes the distance+mask+top-2 through the fused streaming
    TPU kernel (ops.pallas_hamming) — ~2x over the XLA path at these sizes.
    """
    sf = jnp.asarray(scale_factors)
    base_r = jnp.where(local.view_cos > 0.998, 2.5, 4.0)
    radius = base_r * th * jnp.take(
        sf, jnp.clip(local.pred_level, 0, len(scale_factors) - 1)
    )
    col_free = frame.valid & (existing_pt < 0)

    if use_pallas:
        from .pallas_glue import window_best2_padded

        d1, i1, d2 = window_best2_padded(
            pt_desc[jnp.clip(local.idx, 0)], frame.desc,
            local.uv, frame.xy, radius, local.pred_level, frame.octave,
            local.valid, col_free, (-1, 0),
        )
        ok = local.valid & (d1 <= nn_max_dist)
        ok = ok & (d1.astype(jnp.float32) < nn_ratio * d2.astype(jnp.float32))
        res = M.MatchResult(
            idx=jnp.where(ok, i1, -1),
            dist=jnp.where(ok, d1, M.BIG),
            mask=ok,
        )
    else:
        geo = M.window_mask(local.uv, frame.xy, radius)
        geo = geo & M.octave_band_mask(local.pred_level, frame.octave, -1, 0)
        desc_rows = pt_desc[jnp.clip(local.idx, 0)]
        dist = hamming(desc_rows, frame.desc)
        res = M.nn_match(
            dist,
            row_valid=local.valid,
            col_valid=col_free,
            extra_mask=geo,
            max_dist=nn_max_dist,
            ratio=nn_ratio,
        )
    res = M.resolve_duplicates(res, frame.n_slots)
    col = jnp.where(res.mask, res.idx, frame.n_slots)
    pt_of_feat = existing_pt.at[col].set(
        jnp.where(res.mask, local.idx, -1).astype(jnp.int32), mode="drop"
    )
    n_new = jnp.sum(res.mask.astype(jnp.int32))
    return ProjMatchResult(pt_idx=pt_of_feat, n_matches=n_new)
