"""Loop closing: detection, Sim3 alignment, correction, essential graph, GBA.

Array-native replacement for the LoopClosing thread (LoopClosing.cc):

- ``detect``       = DetectLoop (LoopClosing.cc:94-215): keyframe-gap gate,
  dense BoW candidate retrieval (place.keyframe_db), covisibility-
  consistency chaining over 3 consecutive keyframes.
- ``compute_sim3`` = ComputeSim3 (LoopClosing.cc:217-373): descriptor
  matching between the current and candidate keyframes restricted to
  features holding map points, batched Horn Sim3 RANSAC (scale free for
  monocular), inlier refit, match-count acceptance.
- ``correct``      = CorrectLoop (LoopClosing.cc:375-563): propagate the
  corrected Sim3 through the current keyframe's covisible group, remap
  their landmarks, fuse loop-side landmarks, optimize the essential graph
  (spanning tree + strong covisibility + loop edges; Sim3 for mono, SE3
  otherwise), then run global BA (the reference spawns a GBA thread with
  epoch invalidation; here mapping is synchronous so GBA runs inline).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3, sim3
from ..models.map_state import n_observations
from ..ops import matching as M
from ..ops.descriptors import hamming
from ..optim import pose_graph as PG
from ..solvers.horn_sim3 import horn_sim3, horn_sim3_masked, sim3_ransac


@dataclasses.dataclass
class LoopState:
    """Host-side loop-closing bookkeeping (consistency chains, last loop)."""

    consistent_groups: list = dataclasses.field(default_factory=list)
    last_loop_kf: int = -1


def detect(
    loop_state: LoopState,
    db,
    covis: np.ndarray,
    kf_slot: int,
    query_bow,
    *,
    kf_gap: int = 10,
    consistency_th: int = 3,
    covis_neighbor_th: int = 15,
    covis_dev=None,
) -> list[int]:
    """Loop detection with covisibility-consistency chaining.

    ``covis``: full (K, K) covisibility weight matrix (host numpy, used by
    the consistency-group logic) — may be None when ``covis_dev`` is given,
    in which case only the candidate ROWS are downloaded (2 KB each vs the
    ~1 MB full matrix; most keyframes produce zero candidates and transfer
    nothing).  ``covis_dev``: the matrix as a device array.  Returns
    keyframe slots that have been consistently detected over
    ``consistency_th`` consecutive keyframes (usually empty).
    """
    from ..place.keyframe_db import detect_loop_candidates

    if loop_state.last_loop_kf >= 0 and kf_slot - loop_state.last_loop_kf < kf_gap:
        return []
    if kf_slot < kf_gap:
        return []
    cands, scores = detect_loop_candidates(
        db, query_bow, kf_slot,
        covis_dev if covis_dev is not None else jnp.asarray(covis),
    )
    cands = [int(c) for c in np.asarray(cands) if c >= 0]
    if not cands:
        loop_state.consistent_groups = []
        return []

    if covis is None:
        rows = np.asarray(covis_dev[jnp.asarray(cands)])   # one small fetch
        row_of = dict(zip(cands, rows))
    else:
        row_of = {c: covis[c] for c in cands}

    enough: list[int] = []
    new_groups = []
    for c in cands:
        group = {c} | {
            int(i) for i in np.where(row_of[c] >= covis_neighbor_th)[0]
        }
        count = 0
        for prev_group, prev_count in loop_state.consistent_groups:
            if group & prev_group:
                count = max(count, prev_count + 1)
        new_groups.append((group, count))
        if count + 1 >= consistency_th:
            enough.append(c)
    loop_state.consistent_groups = new_groups
    return enough


def compute_sim3(
    state,
    cam,
    kf_cur: int,
    kf_cand: int,
    *,
    fix_scale: bool,
    key,
    min_inliers: int = 20,
    scale_factor: float = 1.2,
    n_levels: int = 8,
) -> tuple[bool, np.ndarray, np.ndarray, float, np.ndarray]:
    """Estimate S_cm mapping candidate-frame coords into current-frame.

    Returns (ok, R_cm, t_cm, s_cm, matched_pt_pairs (N, 2) point slots).

    The whole candidate evaluation (BoW match -> RANSAC -> masked Horn
    refit -> SearchBySim3 growth -> joint refinement) runs as ONE jitted
    program with two packed downloads; the previous eager form paid ~6
    tunnel round trips per candidate (~550 ms measured; this is ~130 ms).
    """
    scal, ints = _compute_sim3_impl(
        state, cam, jnp.int32(kf_cur), jnp.int32(kf_cand), key,
        fix_scale=fix_scale, min_inliers=min_inliers,
        scale_factor=scale_factor, n_levels=n_levels,
    )
    scal = np.asarray(scal)
    n_matches, success, n_final = (
        int(scal[0]), bool(scal[1] > 0), int(scal[2])
    )
    if n_matches < min_inliers or not success or n_final < min_inliers:
        return False, None, None, 1.0, None
    s_o = float(scal[3])
    R_o = scal[4:13].reshape(3, 3)
    t_o = scal[13:16]
    ints = np.asarray(ints)
    inlier_o = ints[0] > 0
    idx = np.where(inlier_o)[0]
    pairs = np.stack([ints[1][idx], ints[2][idx]], axis=1)
    return True, R_o, t_o, s_o, pairs


@functools.partial(
    jax.jit,
    static_argnames=("fix_scale", "min_inliers", "scale_factor", "n_levels"),
)
def _compute_sim3_impl(state, cam, kf_cur, kf_cand, key, *,
                       fix_scale: bool, min_inliers: int,
                       scale_factor: float, n_levels: int):
    K, N, P, O = state.capacity
    desc_c = state.kf_desc[kf_cur]
    desc_m = state.kf_desc[kf_cand]
    pt_c = state.kf_point_idx[kf_cur]
    pt_m = state.kf_point_idx[kf_cand]
    has_c = (pt_c >= 0) & state.kf_feat_valid[kf_cur]
    has_m = (pt_m >= 0) & state.kf_feat_valid[kf_cand]

    dist = hamming(desc_c, desc_m)
    res = M.nn_match(
        dist, row_valid=has_c, col_valid=has_m,
        max_dist=50, ratio=0.75, mutual=True,
    )
    n_matches = jnp.sum(res.mask.astype(jnp.int32))

    # camera-frame 3D positions of the matched landmarks in each keyframe
    Tc = state.kf_pose[kf_cur]
    Tm = state.kf_pose[kf_cand]
    ptc_idx = jnp.clip(pt_c, 0)
    ptm_idx0 = jnp.clip(jnp.take(pt_m, jnp.clip(res.idx, 0)), 0)
    p_c = se3.transform(Tc, state.pt_pos[ptc_idx])           # (N, 3)
    p_m = se3.transform(Tm, state.pt_pos[ptm_idx0])
    xy_c = state.kf_xy[kf_cur]
    xy_m = state.kf_xy[kf_cand][jnp.clip(res.idx, 0)]
    xn_c = jnp.stack(
        [(xy_c[:, 0] - cam.cx) / cam.fx, (xy_c[:, 1] - cam.cy) / cam.fy], axis=1
    )
    xn_m = jnp.stack(
        [(xy_m[:, 0] - cam.cx) / cam.fx, (xy_m[:, 1] - cam.cy) / cam.fy], axis=1
    )
    # chi2 9.21 * sigma2 in pixels -> normalized (Sim3Solver.cc:85-86)
    oct_c = jnp.clip(state.kf_octave[kf_cur], 0, 7)
    sf = 1.2 ** oct_c.astype(jnp.float32)
    th1 = 9.21 * (sf / cam.fx) ** 2
    result = sim3_ransac(
        p_c, p_m, xn_c, xn_m, res.mask, key,
        fix_scale=fix_scale, chi2_th1=th1, chi2_th2=th1,
        min_inliers=min_inliers,
    )
    # Horn refit on the RANSAC inliers (masked; static shapes)
    R_r, t_r, s_r = horn_sim3_masked(
        p_c, p_m, result.inliers, fix_scale=fix_scale
    )
    # grow the BoW matches by mutual projection under the RANSAC Sim3
    # (SearchBySim3, ORBmatcher.cc:1029-1245; called LoopClosing.cc:262)
    # before the joint refinement — marginal loops start from ~20 BoW
    # matches and need the grown set to clear the >= 20-inlier bar
    existing_rows = res.mask
    matched_col = jnp.zeros((N,), bool).at[
        jnp.where(res.mask, res.idx, N)
    ].set(True, mode="drop")
    grow_rows, grow_cols = search_by_sim3(
        state, cam, kf_cur, kf_cand,
        R_r, t_r, jnp.asarray(s_r, jnp.float32),
        existing_rows, matched_col,
        scale_factor=scale_factor, n_levels=n_levels,
    )
    comb_idx = jnp.where(res.mask, res.idx,
                         jnp.where(grow_cols >= 0, grow_cols, -1))
    comb_mask = res.mask | (grow_cols >= 0)
    ptm_idx = jnp.clip(jnp.take(pt_m, jnp.clip(comb_idx, 0)), 0)
    p_m2 = se3.transform(Tm, state.pt_pos[ptm_idx])
    xy_m2 = state.kf_xy[kf_cand][jnp.clip(comb_idx, 0)]
    xn_m2 = jnp.stack(
        [(xy_m2[:, 0] - cam.cx) / cam.fx, (xy_m2[:, 1] - cam.cy) / cam.fy],
        axis=1,
    )
    # joint bidirectional refinement (OptimizeSim3) over the grown set
    R_o, t_o, s_o, inlier_o = optimize_sim3(
        p_c, p_m2, xn_c, xn_m2, comb_mask,
        R_r, t_r, jnp.asarray(s_r, jnp.float32),
        fix_scale=fix_scale,
        inv_sigma2=cam.fx ** 2,
        chi2_th=10.0,
    )
    n_final = jnp.sum(inlier_o.astype(jnp.int32))
    scal = jnp.concatenate([
        jnp.stack([
            n_matches.astype(jnp.float32),
            result.success.astype(jnp.float32),
            n_final.astype(jnp.float32),
            s_o.astype(jnp.float32),
        ]),
        R_o.reshape(9), t_o,
    ])
    ints = jnp.stack([
        inlier_o.astype(jnp.int32), ptc_idx.astype(jnp.int32),
        ptm_idx.astype(jnp.int32),
    ])
    return scal, ints


def search_by_sim3(
    state,
    cam,
    kf_cur: int,
    kf_cand: int,
    R_cm, t_cm, s_cm,          # current Sim3 estimate: cand-frame -> cur-frame
    existing_rows,             # (N,) bool — cur features already matched (kept)
    existing_cols,             # (N,) bool — cand features already matched
    *,
    th: float = 7.5,           # search radius factor (LoopClosing.cc:262)
    max_dist: int = 100,       # TH_HIGH (ORBmatcher.cc:1156, 1204)
    scale_factor: float = 1.2,
    n_levels: int = 8,
):
    """Grow loop matches by mutual projection under the current Sim3
    (ORBmatcher::SearchBySim3, ORBmatcher.cc:1029-1245).

    Projects each keyframe's landmarks into the other image through
    S_cm / S_mc, windows by the predicted octave's radius, and keeps
    mutually-agreeing descriptor matches among features not already matched.
    Returns (rows, cols) int32 arrays of new feature pairs (-1 padded, N).
    """
    K, N, P, O = state.capacity
    from ..models.map_state import predict_scale

    Tc = state.kf_pose[kf_cur]
    Tm = state.kf_pose[kf_cand]
    pt_c = state.kf_point_idx[kf_cur]
    pt_m = state.kf_point_idx[kf_cand]
    has_c = (
        (pt_c >= 0) & state.kf_feat_valid[kf_cur]
        & jnp.take(state.pt_valid, jnp.clip(pt_c, 0)) & ~existing_rows
    )
    has_m = (
        (pt_m >= 0) & state.kf_feat_valid[kf_cand]
        & jnp.take(state.pt_valid, jnp.clip(pt_m, 0)) & ~existing_cols
    )
    sf = jnp.asarray([scale_factor ** i for i in range(n_levels)], jnp.float32)

    def project(p_cam):
        z = jnp.maximum(p_cam[:, 2], 1e-6)
        u = cam.fx * p_cam[:, 0] / z + cam.cx
        v = cam.fy * p_cam[:, 1] / z + cam.cy
        ok = (
            (p_cam[:, 2] > 1e-3) & (u >= 0) & (u < cam.width)
            & (v >= 0) & (v < cam.height)
        )
        return jnp.stack([u, v], axis=1), ok, jnp.linalg.norm(p_cam, axis=1)

    # direction 1: cand landmarks -> cur image (rows = cur, cols = cand)
    p_m_cam = se3.transform(Tm, state.pt_pos[jnp.clip(pt_m, 0)])
    p_m_in_c = sim3.apply(R_cm, t_cm, s_cm, p_m_cam)
    uv_m_in_c, ok_m, dist_m = project(p_m_in_c)
    pred_m = predict_scale(
        dist_m, jnp.take(state.pt_max_dist, jnp.clip(pt_m, 0)) * s_cm,
        scale_factor, n_levels,
    )
    r_m = th * jnp.take(sf, jnp.clip(pred_m, 0, n_levels - 1))
    geo1 = M.window_mask(uv_m_in_c, state.kf_xy[kf_cur], r_m).T   # (Nc, Nm)
    # octave band of the predicted level (ORBmatcher.cc:1137-1142)
    band1 = M.octave_band_mask(pred_m, state.kf_octave[kf_cur], -1, 0).T

    # direction 2: cur landmarks -> cand image
    R_mc, t_mc, s_mc = sim3.inverse(R_cm, t_cm, jnp.asarray(s_cm, jnp.float32))
    p_c_cam = se3.transform(Tc, state.pt_pos[jnp.clip(pt_c, 0)])
    p_c_in_m = sim3.apply(R_mc, t_mc, s_mc, p_c_cam)
    uv_c_in_m, ok_c, dist_c = project(p_c_in_m)
    pred_c = predict_scale(
        dist_c, jnp.take(state.pt_max_dist, jnp.clip(pt_c, 0)) * s_mc,
        scale_factor, n_levels,
    )
    r_c = th * jnp.take(sf, jnp.clip(pred_c, 0, n_levels - 1))
    geo2 = M.window_mask(uv_c_in_m, state.kf_xy[kf_cand], r_c)    # (Nc, Nm)
    band2 = M.octave_band_mask(pred_c, state.kf_octave[kf_cand], -1, 0)

    dmat = hamming(state.kf_desc[kf_cur], state.kf_desc[kf_cand])
    valid_pair = has_c[:, None] & has_m[None, :]
    m1 = valid_pair & geo1 & band1 & (ok_m[None, :])
    m2 = valid_pair & geo2 & band2 & (ok_c[:, None])

    d1 = jnp.where(m1, dmat, M.BIG)
    d2 = jnp.where(m2, dmat, M.BIG)
    best_row_for_col = jnp.argmin(d1, axis=0)                 # (Nm,)
    col_ok = jnp.min(d1, axis=0) <= max_dist
    best_col_for_row = jnp.argmin(d2, axis=1)                 # (Nc,)
    row_ok = jnp.min(d2, axis=1) <= max_dist

    # mutual agreement (ORBmatcher.cc:1226-1243)
    rows = jnp.arange(N, dtype=jnp.int32)
    agree = (
        row_ok
        & jnp.take(col_ok, best_col_for_row)
        & (jnp.take(best_row_for_col, best_col_for_row) == rows)
    )
    new_rows = jnp.where(agree, rows, -1)
    new_cols = jnp.where(agree, best_col_for_row.astype(jnp.int32), -1)
    return new_rows, new_cols


def build_essential_graph_edges(
    kf_parent: np.ndarray,
    covis: np.ndarray,
    kf_valid: np.ndarray,
    loop_pairs: list[tuple[int, int]],
    poses_R: jax.Array,
    poses_t: jax.Array,
    poses_s: jax.Array,
    *,
    min_covis_weight: int = 100,
) -> PG.PoseGraphEdges:
    """Essential-graph topology (Optimizer.cc:796-1000): spanning tree +
    covisibility edges above weight 100 + loop edges.  Measurements from the
    *pre-correction* poses except loop edges, which the caller appends with
    their Sim3 measurements."""
    ii, jj = [], []
    K = len(kf_parent)
    for k in range(K):
        if not kf_valid[k]:
            continue
        p = kf_parent[k]
        if p >= 0 and kf_valid[p]:
            ii.append(p)
            jj.append(k)
    cov = np.triu(covis, 1)
    strong = np.argwhere(cov >= min_covis_weight)
    for a, b in strong:
        if kf_valid[a] and kf_valid[b]:
            ii.append(int(a))
            jj.append(int(b))
    for a, b in loop_pairs:
        ii.append(int(a))
        jj.append(int(b))
    i = jnp.asarray(ii, jnp.int32)
    j = jnp.asarray(jj, jnp.int32)
    return PG.make_edges_from_poses(
        i, j, poses_R, poses_t, poses_s, jnp.ones(len(ii), bool)
    )


def optimize_sim3(
    p_c: jax.Array,        # (N, 3) camera-frame positions of matches in KF-c
    p_m: jax.Array,        # (N, 3) positions in KF-m
    xn_c: jax.Array,       # (N, 2) normalized observations in KF-c
    xn_m: jax.Array,       # (N, 2) observations in KF-m
    valid: jax.Array,      # (N,)
    R0: jax.Array, t0: jax.Array, s0: jax.Array,
    *,
    fix_scale: bool,
    inv_sigma2: jax.Array | float = 1.0,
    chi2_th: float = 9.815,   # th2 in OptimizeSim3 (Optimizer.cc:1476)
    iters: int = 10,
):
    """Joint Sim3 refinement with bidirectional projection residuals
    (Optimizer::OptimizeSim3, Optimizer.cc:1381-1573): minimize reprojection
    of S_cm·p_m into KF-c's image and S_cm^-1·p_c into KF-m's image over the
    7-DoF (or 6-DoF) relative transform, Huber-robustified, with a
    mid-schedule chi2 outlier drop like the reference's two-phase run.

    Returns (R, t, s, inlier_mask).
    """
    from ..geometry import sim3 as s3

    zero7 = jnp.zeros(7, dtype=t0.dtype)

    def residuals(zeta, R, t, s):
        Rd, td, sd = s3.exp(zeta)
        Rc, tc, sc = s3.compose(Rd, td, sd, R, t, s)
        p_in_c = s3.apply(Rc, tc, sc, p_m)
        zc = jnp.maximum(p_in_c[:, 2], 1e-6)
        rc = p_in_c[:, :2] / zc[:, None] - xn_c
        Ri, ti, si = s3.inverse(Rc, tc, sc)
        p_in_m = s3.apply(Ri, ti, si, p_c)
        zm = jnp.maximum(p_in_m[:, 2], 1e-6)
        rm = p_in_m[:, :2] / zm[:, None] - xn_m
        pos = (p_in_c[:, 2] > 1e-6) & (p_in_m[:, 2] > 1e-6)
        return jnp.concatenate([rc, rm], axis=1), pos   # (N, 4)

    def chi2_of(r):
        return (jnp.sum(r[:, :2] ** 2, axis=1) + jnp.sum(r[:, 2:] ** 2, axis=1)) * inv_sigma2

    def lm(R, t, s, active, n_iters):
        def body(_, carry):
            R, t, s, lam = carry
            r0, pos = residuals(zero7, R, t, s)
            J = jax.jacfwd(lambda z: residuals(z, R, t, s)[0])(zero7)  # (N,4,7)
            w = jnp.where(active & pos, inv_sigma2, 0.0)
            chi2 = chi2_of(r0)
            hw = jnp.where(chi2 <= 10.0, 1.0, jnp.sqrt(10.0 / jnp.maximum(chi2, 1e-9)))
            w = w * hw
            H = jnp.einsum("nri,n,nrj->ij", J, w, J)
            g = jnp.einsum("nri,n,nr->i", J, w, r0)
            if fix_scale:
                sel = jnp.zeros((7, 7)).at[6, 6].set(1.0)
                keep = jnp.eye(7) - sel
                H = keep @ H @ keep + sel
                g = keep @ g
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(7)
            dz = -jnp.linalg.solve(Hd, g)
            if fix_scale:
                dz = dz.at[6].set(0.0)
            Rd, td, sd = s3.exp(dz)
            Rn, tn, sn = s3.compose(Rd, td, sd, R, t, s)
            r_new, pos_new = residuals(zero7, Rn, tn, sn)
            err_old = jnp.sum(jnp.where(active & pos, chi2, 0.0))
            err_new = jnp.sum(jnp.where(active & pos_new, chi2_of(r_new), 0.0))
            acc = err_new < err_old
            R = jnp.where(acc, Rn, R)
            t = jnp.where(acc, tn, t)
            s = jnp.where(acc, sn, s)
            lam = jnp.clip(jnp.where(acc, lam * 0.5, lam * 4.0), 1e-10, 1e6)
            return R, t, s, lam

        R, t, s, _ = jax.lax.fori_loop(0, n_iters, body, (R, t, s, jnp.float32(1e-4)))
        return R, t, s

    R, t, s = lm(R0, t0, s0, valid, iters // 2)
    r, pos = residuals(zero7, R, t, s)
    inlier = valid & pos & (chi2_of(r) <= chi2_th)
    R, t, s = lm(R, t, s, inlier, iters)
    r, pos = residuals(zero7, R, t, s)
    inlier = valid & pos & (chi2_of(r) <= chi2_th)
    return R, t, s, inlier


def count_loop_projection_matches(
    state,
    cam,
    kf_cur: int,
    group_kf_mask: jax.Array,   # (K,) loop keyframe + its covisible group
    R_cw, t_cw, s_cw,           # corrected Sim3 pose of the current keyframe
    *,
    budget: int = 2048,
    radius_px: float = 10.0,
    max_dist: int = 50,
) -> int:
    """Final loop acceptance evidence (LoopClosing::ComputeSim3 tail,
    LoopClosing.cc:330-373): project the loop neighbourhood's landmarks into
    the current keyframe through the corrected Sim3 and count descriptor
    matches.  The reference demands >= 40 to accept the loop."""
    K, N, P, O = state.capacity
    kfc = jnp.clip(state.pt_obs_kf, 0)
    in_group = jnp.take(group_kf_mask, kfc) & (state.pt_obs_kf >= 0)
    loop_pt = state.pt_valid & jnp.any(in_group, axis=1)

    pc = sim3.apply(R_cw, t_cw, s_cw, state.pt_pos)
    z = pc[:, 2]
    z_ok = z > 1e-3
    z_safe = jnp.where(z_ok, z, 1.0)
    u = cam.fx * pc[:, 0] / z_safe + cam.cx
    v = cam.fy * pc[:, 1] / z_safe + cam.cy
    in_img = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    ok = loop_pt & z_ok & in_img
    score = jnp.where(ok, -z, -jnp.inf)
    top_score, top_idx = jax.lax.top_k(score, budget)
    sel_ok = jnp.isfinite(top_score)
    uv_sel = jnp.stack([jnp.take(u, top_idx), jnp.take(v, top_idx)], axis=-1)

    feat_valid = state.kf_feat_valid[kf_cur]
    geo = M.window_mask(uv_sel, state.kf_xy[kf_cur], radius_px)
    dmat = hamming(state.pt_desc[jnp.clip(top_idx, 0)], state.kf_desc[kf_cur])
    res = M.nn_match(
        dmat, row_valid=sel_ok, col_valid=feat_valid,
        extra_mask=geo, max_dist=max_dist,
    )
    res = M.resolve_duplicates(res, N)
    return int(jnp.sum(res.mask))
