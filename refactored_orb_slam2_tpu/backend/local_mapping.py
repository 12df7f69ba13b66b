"""Local mapping operations: point fusion, culling, and statistics upkeep.

Array-native replacements for the reference's LocalMapping thread duties:
- ``fuse_into_keyframe``  = ORBmatcher::Fuse + MapPoint::Replace
  (ORBmatcher.cc:766-907, MapPoint.cc:172-206, driven by
  LocalMapping::SearchInNeighbors LocalMapping.cc:425-509).  Projects map
  points into a keyframe; features already holding a *different* point
  trigger a merge (the point with more observations wins), unmatched
  features gain an observation.
- ``cull_map_points``     = LocalMapping::MapPointCulling
  (LocalMapping.cc:155-183): found/visible ratio < 0.25, or too few
  observations shortly after creation.
- ``update_visibility``   = the mbTrackInView / IncreaseVisible /
  IncreaseFound statistics the tracker maintains (Tracking.cc:1034-1088).

Without fusion, every keyframe's depth-created points duplicate existing
landmarks with the current pose error baked in, and window-gated matching
then preferentially locks onto the drifted copies — the classic positive
feedback the reference's SearchInNeighbors exists to prevent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from ..geometry.camera import Camera
from ..models.map_state import MapState, predict_scale, n_observations
from ..ops import matching as M
from ..ops.descriptors import hamming


def fuse_into_keyframe(
    state: MapState,
    kf_slot: jax.Array,
    cam: Camera,
    pt_mask: jax.Array | None = None,
    *,
    budget: int,
    scale_factor: float,
    n_levels: int,
    th: float = 3.0,
    max_dist: int = 50,     # TH_LOW (ORBmatcher.cc:849)
    cand_idx: jax.Array | None = None,
) -> MapState:
    """Project map points into keyframe ``kf_slot``; add observations for
    unmatched features and merge duplicate landmarks.

    ``pt_mask`` optionally restricts the candidate set — used by loop
    correction's SearchAndFuse (LoopClosing.cc:565-590), which fuses only
    the loop neighbourhood's landmarks into each corrected keyframe.

    ``cand_idx`` ((C,) point slots, -1 padded) is the compact form: the
    frustum gate, scale prediction, and matching all run on C rows instead
    of the full P-point bank (and the P-wide top_k disappears).  Local
    mapping's direction-1 fuse passes the current keyframe's own point row
    (C = N ≈ 1k vs P = 65k: ~2.7x faster per target measured end-to-end).
    """
    K, N, P, O = state.capacity
    Tcw = state.kf_pose[kf_slot]

    if cand_idx is not None and pt_mask is not None:
        raise ValueError(
            "fuse_into_keyframe: pt_mask is only honoured in the full-bank "
            "path; fold the mask into cand_idx (or pass cand_idx=None)"
        )
    if cand_idx is None:
        # --- frustum-select candidate points (not already in this KF) -----
        observed_here = jnp.any(state.pt_obs_kf == kf_slot, axis=1)
        if pt_mask is not None:
            observed_here = observed_here | ~pt_mask
        pos = state.pt_pos
        pt_valid_c = state.pt_valid
        normal_c = state.pt_normal
        min_d_c, max_d_c = state.pt_min_dist, state.pt_max_dist
        slot_of = None
    else:
        ci = jnp.clip(cand_idx, 0)
        row_ok = cand_idx >= 0
        observed_here = (
            jnp.any(state.pt_obs_kf[ci] == kf_slot, axis=1) | ~row_ok
        )
        pos = state.pt_pos[ci]
        pt_valid_c = state.pt_valid[ci] & row_ok
        normal_c = state.pt_normal[ci]
        min_d_c, max_d_c = state.pt_min_dist[ci], state.pt_max_dist[ci]
        slot_of = ci
    pc = se3.transform(Tcw, pos)
    z = pc[:, 2]
    z_ok = z > 1e-3
    z_safe = jnp.where(z_ok, z, 1.0)
    u = cam.fx * pc[:, 0] / z_safe + cam.cx
    v = cam.fy * pc[:, 1] / z_safe + cam.cy
    in_img = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    Twc = se3.inv(Tcw)
    center = se3.translation(Twc)
    po = pos - center
    dist = jnp.linalg.norm(po, axis=-1)
    dist_ok = (dist >= 0.8 * min_d_c) & (dist <= 1.2 * max_d_c)
    view_cos = jnp.sum(po * normal_c, axis=-1) / jnp.maximum(dist, 1e-9)
    ok = pt_valid_c & z_ok & in_img & dist_ok & (view_cos > 0.5) & ~observed_here
    if cand_idx is None:
        score = jnp.where(ok, -dist, -jnp.inf)
        top_score, top_idx = jax.lax.top_k(score, budget)
        sel_ok = jnp.isfinite(top_score)
        dist_sel = jnp.take(dist, top_idx)
        maxd_sel = jnp.take(state.pt_max_dist, top_idx)
        u_sel, v_sel = jnp.take(u, top_idx), jnp.take(v, top_idx)
    else:
        top_idx = slot_of                       # (C,) point slots
        sel_ok = ok
        dist_sel, maxd_sel = dist, max_d_c
        u_sel, v_sel = u, v
    pred = predict_scale(dist_sel, maxd_sel, scale_factor, n_levels)
    uv_sel = jnp.stack([u_sel, v_sel], axis=-1)

    # --- match against this keyframe's features ---------------------------
    sf = jnp.asarray(
        [scale_factor ** i for i in range(n_levels)], dtype=jnp.float32
    )
    radius = th * jnp.take(sf, jnp.clip(pred, 0, n_levels - 1))
    feat_xy = state.kf_xy[kf_slot]
    feat_valid = state.kf_feat_valid[kf_slot]
    geo = M.window_mask(uv_sel, feat_xy, radius)
    geo = geo & M.octave_band_mask(pred, state.kf_octave[kf_slot], -1, 1)
    dmat = hamming(state.pt_desc[jnp.clip(top_idx, 0)], state.kf_desc[kf_slot])
    res = M.nn_match(
        dmat, row_valid=sel_ok, col_valid=feat_valid,
        extra_mask=geo, max_dist=max_dist,
    )
    res = M.resolve_duplicates(res, N)

    # candidate point per feature (-1 none)
    cand_pt = jnp.full((N,), -1, jnp.int32)
    col = jnp.where(res.mask, res.idx, N)
    cand_pt = cand_pt.at[col].set(
        jnp.where(res.mask, top_idx, -1).astype(jnp.int32), mode="drop"
    )

    existing_pt = state.kf_point_idx[kf_slot]                # (N,)
    n_obs = n_observations(state)                            # (P,)

    # --- case A: feature has no point -> add observation ------------------
    add_pt = jnp.where((existing_pt < 0) & (cand_pt >= 0), cand_pt, -1)
    # --- case B: feature has a different point -> merge -------------------
    merge_mask = (existing_pt >= 0) & (cand_pt >= 0) & (existing_pt != cand_pt)
    pe = jnp.clip(existing_pt, 0)
    pcand = jnp.clip(cand_pt, 0)
    cand_wins = jnp.take(n_obs, pcand) >= jnp.take(n_obs, pe)
    loser = jnp.where(cand_wins, pe, pcand)
    winner = jnp.where(cand_wins, pcand, pe)

    # rewrite every keyframe's reference to a loser via the loser's own
    # observation list — a bounded (N, O) scatter instead of a full (K, N)
    # gather-rewrite (losers are mirrored in their obs lists; a reference
    # orphaned by an earlier overflow stays behind but is masked everywhere
    # by pt_valid)
    l_list = jnp.where(merge_mask, loser, 0)
    w_list = jnp.where(merge_mask, winner, 0).astype(jnp.int32)
    lref_kf = state.pt_obs_kf[l_list]                        # (N, O)
    lref_ft = state.pt_obs_feat[l_list]
    upd_ok = merge_mask[:, None] & (lref_kf >= 0)
    new_kf_point_idx = state.kf_point_idx.at[
        jnp.where(upd_ok, lref_kf, K), jnp.where(upd_ok, lref_ft, 0)
    ].set(jnp.broadcast_to(w_list[:, None], lref_kf.shape), mode="drop")
    # the fused keyframe's own row is rewritten directly (merge_mask/winner
    # are per-feature here), so it never depends on the obs mirror
    own_row = jnp.where(merge_mask, w_list, new_kf_point_idx[kf_slot])
    new_kf_point_idx = new_kf_point_idx.at[kf_slot].set(own_row)

    # invalidate losers
    is_loser = jnp.zeros(P, bool).at[jnp.where(merge_mask, loser, P)].set(
        True, mode="drop"
    )
    pt_valid = state.pt_valid & ~is_loser

    # transfer: for each winner row, pull the loser's observation list into
    # free slots.  Winners live in the budget-sized candidate set, so the
    # pack/argsort runs on (budget, 2O) rows and is scattered back — never
    # on the full (P, 2O) bank.
    loser_of = jnp.full((P,), -1, jnp.int32).at[
        jnp.where(merge_mask, winner, P)
    ].set(jnp.where(merge_mask, loser, -1).astype(jnp.int32), mode="drop")
    w_rows = jnp.clip(top_idx, 0)                            # (budget,)
    loser_b = loser_of[w_rows]                               # (budget,)
    has_loser_b = (loser_b >= 0) & sel_ok
    l_idx_b = jnp.clip(loser_b, 0)
    l_obs_kf = jnp.where(has_loser_b[:, None], state.pt_obs_kf[l_idx_b], -1)
    l_obs_ft = jnp.where(has_loser_b[:, None], state.pt_obs_feat[l_idx_b], -1)
    w_obs_kf = state.pt_obs_kf[w_rows]
    w_obs_ft = state.pt_obs_feat[w_rows]
    cat_kf = jnp.concatenate([w_obs_kf, l_obs_kf], axis=1)   # (budget, 2O)
    cat_ft = jnp.concatenate([w_obs_ft, l_obs_ft], axis=1)
    order = jnp.argsort(jnp.where(cat_kf >= 0, 0, 1), axis=1, stable=True)
    cat_kf = jnp.take_along_axis(cat_kf, order, axis=1)[:, :O]
    cat_ft = jnp.take_along_axis(cat_ft, order, axis=1)[:, :O]
    scatter_rows = jnp.where(has_loser_b, w_rows, P)
    pt_obs_kf = state.pt_obs_kf.at[scatter_rows].set(cat_kf, mode="drop")
    pt_obs_feat = state.pt_obs_feat.at[scatter_rows].set(cat_ft, mode="drop")
    pt_obs_kf = jnp.where(pt_valid[:, None], pt_obs_kf, -1)
    pt_obs_feat = jnp.where(pt_valid[:, None], pt_obs_feat, -1)

    s = state._replace(
        kf_point_idx=new_kf_point_idx,
        pt_valid=pt_valid,
        pt_obs_kf=pt_obs_kf,
        pt_obs_feat=pt_obs_feat,
    )
    # register case-A observations (and the merged feature's winner if the
    # feature slot was previously pointing at the loser it's handled by remap)
    from ..models.map_ops import add_observations

    s = add_observations(s, kf_slot, add_pt)
    kf_pt = s.kf_point_idx[kf_slot]
    kf_pt = jnp.where(add_pt >= 0, add_pt, kf_pt)
    s = s._replace(kf_point_idx=s.kf_point_idx.at[kf_slot].set(kf_pt))
    return s


def fuse_into_keyframes(
    state: MapState,
    kf_slots: jax.Array,        # (T,) target keyframe slots (-1 pad)
    cam: Camera,
    pt_mask: jax.Array,
    *,
    budget: int,
    scale_factor: float,
    n_levels: int,
    th: float = 3.0,
    max_dist: int = 50,
    cand_idx: jax.Array | None = None,
) -> MapState:
    """Fuse a fixed point set into several keyframes in ONE program.

    SearchInNeighbors direction 1 (LocalMapping.cc:439-466) issues one Fuse
    per covisible target; as separate dispatches each pays full launch
    latency on a tunneled chip.  A lax.scan runs all targets in a single
    XLA program; padded (-1) slots skip via cond.  ``cand_idx`` restricts
    candidates to a compact point-slot list (see fuse_into_keyframe).

    The scan carries ONLY the four banks fuse mutates (kf_point_idx,
    pt_valid, pt_obs_kf, pt_obs_feat, ~18 MB); everything fuse merely
    reads (descriptors, positions, keypoint banks, ~45 MB) is closed over
    as a loop invariant — carrying the whole MapState measured
    ~15 ms/target on v5e (a full-state copy per iteration), vs ~1.5 ms
    with the split carry.
    """
    def body(carry, slot):
        def do(carry):
            kf_point_idx, pt_valid, pt_obs_kf, pt_obs_feat = carry
            s = state._replace(
                kf_point_idx=kf_point_idx, pt_valid=pt_valid,
                pt_obs_kf=pt_obs_kf, pt_obs_feat=pt_obs_feat,
            )
            s = fuse_into_keyframe(
                s, slot, cam, pt_mask, budget=budget,
                scale_factor=scale_factor, n_levels=n_levels,
                th=th, max_dist=max_dist, cand_idx=cand_idx,
            )
            return (s.kf_point_idx, s.pt_valid, s.pt_obs_kf, s.pt_obs_feat)

        return jax.lax.cond(slot >= 0, do, lambda c: c, carry), None

    carry0 = (state.kf_point_idx, state.pt_valid,
              state.pt_obs_kf, state.pt_obs_feat)
    (kf_point_idx, pt_valid, pt_obs_kf, pt_obs_feat), _ = jax.lax.scan(
        body, carry0, kf_slots
    )
    return state._replace(
        kf_point_idx=kf_point_idx, pt_valid=pt_valid,
        pt_obs_kf=pt_obs_kf, pt_obs_feat=pt_obs_feat,
    )


def update_visibility(
    state: MapState,
    visible_pt: jax.Array,    # (B,) point slots predicted visible (-1 pad)
    found_pt: jax.Array,      # (N,) point slots actually matched (-1 pad)
) -> MapState:
    """IncreaseVisible / IncreaseFound counters (MapPoint.cc:214-227)."""
    P = state.pt_visible.shape[0]
    vis_idx = jnp.where(visible_pt >= 0, visible_pt, P)
    pt_visible = state.pt_visible.at[vis_idx].add(1, mode="drop")
    fnd_idx = jnp.where(found_pt >= 0, found_pt, P)
    pt_found = state.pt_found.at[fnd_idx].add(1, mode="drop")
    return state._replace(pt_visible=pt_visible, pt_found=pt_found)


def mapping_work_sets(
    state: MapState,
    kf_slot: jax.Array,
    ref_kf: jax.Array,
    *,
    nn: int,
    t_cap: int,
    n_neighbors: int,
    window_k: int = 20,
    cull_cap: int = 32,
):
    """All per-keyframe neighbor/window/candidate selections in ONE device
    program — no covisibility download.

    The mapping worker previously downloaded the full (K, K) covisibility
    matrix (~1 MB, a ~50 ms tunnel round trip in degraded mode) and did the
    neighbor ranking on the host; on the single-tunneled-chip deployment
    those per-keyframe host syncs serialized the worker against the
    tracker's dispatch stream and mapping could not keep up with an
    unpaced tracker (measured: the worker got zero work done during a
    full-speed 160-frame drive).  Everything the reference derives from
    GetBestCovisibilityKeyFrames (LocalMapping.cc:189/430, KeyFrame.cc:310)
    is a top-k/threshold over one covisibility row — computed here on
    device and consumed by the downstream programs without leaving HBM.

    Returns (tri_neighbors, fuse_slots, n_fuse_targets, fuse_tgt_mask,
    window_mask, fixed_mask, cull_cands):
    - tri_neighbors (n_neighbors,): top covisible neighbors with weight
      > 15 for CreateNewMapPoints (-1 padded);
    - fuse_slots (t_cap,): SearchInNeighbors first ring (top nn, weight
      > 0) plus each neighbor's 5-neighbor second ring, deduplicated
      (-1 padded; slot order, not BFS order — fuse is order-insensitive
      up to merge tie-breaks);
    - n_fuse_targets: true target count before the t_cap clamp (overflow
      telemetry);
    - fuse_tgt_mask (K,): the same set as a mask (direction-2 fuse);
    - window_mask/fixed_mask (K,): local-BA window = top window_k + self
      (origin keyframe never moves);
    - cull_cands (cull_cap,): KeyFrameCulling candidates (weight >= 15,
      excluding origin/self/ref keyframe; -1 padded).
    """
    from ..models.map_state import covisibility_matrix

    K = state.kf_pose.shape[0]
    covis = covisibility_matrix(state)
    ids = jnp.arange(K)
    kf_ok = state.kf_valid
    row = jnp.where(kf_ok & (ids != kf_slot), covis[kf_slot], 0)

    tri_w, tri_idx = jax.lax.top_k(row, n_neighbors)
    tri_neighbors = jnp.where(tri_w > 15, tri_idx, -1).astype(jnp.int32)

    f_w, f_idx = jax.lax.top_k(row, nn)
    first_ok = f_w > 0
    mask = jnp.zeros(K, bool).at[
        jnp.where(first_ok, f_idx, K)
    ].set(True, mode="drop")
    rows2 = jnp.where(kf_ok[None, :], covis[jnp.clip(f_idx, 0)], 0)
    s_w, s_idx = jax.lax.top_k(rows2, 5)
    ok2 = (s_w > 0) & first_ok[:, None]
    mask = mask.at[jnp.where(ok2, s_idx, K)].set(True, mode="drop")
    mask = (mask & kf_ok).at[kf_slot].set(False)
    n_fuse_targets = jnp.sum(mask.astype(jnp.int32))
    (fuse_slots,) = jnp.nonzero(mask, size=t_cap, fill_value=-1)
    fuse_slots = fuse_slots.astype(jnp.int32)

    w_w, w_idx = jax.lax.top_k(row, window_k)
    window = jnp.zeros(K, bool).at[
        jnp.where(w_w > 0, w_idx, K)
    ].set(True, mode="drop")
    window = window.at[kf_slot].set(True).at[0].set(False) & kf_ok
    fixed = ~window & kf_ok

    cull_ok = (
        (covis[kf_slot] >= 15) & kf_ok
        & (ids != 0) & (ids != kf_slot) & (ids != ref_kf)
    )
    (cull_cands,) = jnp.nonzero(cull_ok, size=cull_cap, fill_value=-1)
    return (tri_neighbors, fuse_slots, n_fuse_targets, mask, window, fixed,
            cull_cands.astype(jnp.int32))


def cull_recent_map_points(
    state: MapState,
    current_kf: jax.Array,
    n_pt: jax.Array,
    *,
    recent_cap: int = 4096,
    recent_window: int = 2,
    min_found_ratio: float = 0.25,
    min_obs_stereo: int = 3,
) -> MapState:
    """MapPointCulling over the RECENT point slots only.

    The reference iterates ``mlpRecentAddedMapPoints`` exclusively
    (LocalMapping.cc:155-183) — both the found-ratio and the
    too-few-observations tests apply to recently created points, not the
    whole bank.  Point slots are allocated monotonically, so the recent
    set is a contiguous ``recent_cap`` slice ending at ``n_pt``; operating
    on the slice instead of the full (P, O) bank cuts the per-keyframe
    cull from ~25 ms to ~2 ms at P=65k on v5e (profile_mapping2.py), and
    the keyframe-side back-pointer cleanup scatters only the slice's own
    observation pairs.
    """
    K, N, P, O = state.capacity
    R = min(recent_cap, P)
    start = jnp.clip(n_pt.astype(jnp.int32) - R, 0, P - R)

    sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start, R, axis=0)
    r_valid = sl(state.pt_valid)
    r_found = sl(state.pt_found)
    r_visible = sl(state.pt_visible)
    r_first = sl(state.pt_first_kf)
    r_obs_kf = sl(state.pt_obs_kf)
    r_obs_ft = sl(state.pt_obs_feat)

    n_obs = jnp.sum((r_obs_kf >= 0).astype(jnp.int32), axis=1)
    ratio = r_found.astype(jnp.float32) / jnp.maximum(
        r_visible.astype(jnp.float32), 1.0
    )
    seen_enough = r_visible >= 3
    bad_ratio = seen_enough & (ratio < min_found_ratio)
    age = current_kf - r_first
    recent = (age >= recent_window) & (age <= recent_window + 1)
    too_few = recent & (n_obs < min_obs_stereo)
    cull = r_valid & (bad_ratio | too_few)

    upd = lambda x, v: jax.lax.dynamic_update_slice_in_dim(x, v, start, axis=0)
    pt_valid = upd(state.pt_valid, r_valid & ~cull)
    new_obs_kf = jnp.where(cull[:, None], -1, r_obs_kf)
    new_obs_ft = jnp.where(cull[:, None], -1, r_obs_ft)
    pt_obs_kf = upd(state.pt_obs_kf, new_obs_kf)
    pt_obs_feat = upd(state.pt_obs_feat, new_obs_ft)

    # clear keyframe-side back pointers via the culled slice's own obs
    # pairs (R*O scatter, not a (K, N) gather over the whole bank)
    kfc = jnp.clip(r_obs_kf, 0)
    ftc = jnp.clip(r_obs_ft, 0)
    flat = jnp.where(cull[:, None] & (r_obs_kf >= 0), kfc * N + ftc, K * N)
    clear = jnp.zeros((K * N,), jnp.int32).at[flat.reshape(-1)].max(
        1, mode="drop"
    )
    kf_point_idx = jnp.where(clear.reshape(K, N) > 0, -1, state.kf_point_idx)
    return state._replace(
        pt_valid=pt_valid,
        kf_point_idx=kf_point_idx,
        pt_obs_kf=pt_obs_kf,
        pt_obs_feat=pt_obs_feat,
    )


def cull_map_points(
    state: MapState,
    current_kf: jax.Array,
    recent_window: int = 2,
    min_found_ratio: float = 0.25,
    min_obs_mono: int = 2,
    min_obs_stereo: int = 3,
) -> MapState:
    """MapPointCulling (LocalMapping.cc:155-183), batched.

    Culls points whose found/visible ratio is below 0.25, and recently
    created points (first_kf within ``recent_window`` keyframes of current)
    with fewer than 3 observations.
    """
    n_obs = n_observations(state)
    ratio = state.pt_found.astype(jnp.float32) / jnp.maximum(
        state.pt_visible.astype(jnp.float32), 1.0
    )
    seen_enough = state.pt_visible >= 3   # only judge points with history
    bad_ratio = seen_enough & (ratio < min_found_ratio)
    age = current_kf - state.pt_first_kf
    recent = (age >= recent_window) & (age <= recent_window + 1)
    too_few = recent & (n_obs < min_obs_stereo)
    cull = state.pt_valid & (bad_ratio | too_few)
    pt_valid = state.pt_valid & ~cull
    # drop their observations from both sides
    K, N, P, O = state.capacity
    kf_pt = state.kf_point_idx
    pt_of_feat_culled = jnp.take(cull, jnp.clip(kf_pt, 0)) & (kf_pt >= 0)
    kf_point_idx = jnp.where(pt_of_feat_culled, -1, kf_pt)
    return state._replace(
        pt_valid=pt_valid,
        kf_point_idx=kf_point_idx,
        pt_obs_kf=jnp.where(cull[:, None], -1, state.pt_obs_kf),
        pt_obs_feat=jnp.where(cull[:, None], -1, state.pt_obs_feat),
    )


def triangulate_with_neighbor(
    state: MapState,
    kf_a: jax.Array,
    kf_b: jax.Array,
    cam: Camera,
    pt_base: jax.Array,
    *,
    max_new: int,
    scale_factor: float,
    n_levels: int,
    min_baseline_ratio: float = 0.01,
) -> tuple[MapState, jax.Array]:
    """Create new landmarks by triangulating unmatched features between two
    keyframes (LocalMapping::CreateNewMapPoints, LocalMapping.cc:185-423 +
    ORBmatcher::SearchForTriangulation, ORBmatcher.cc:614-764).

    Epipolar-constrained descriptor matching between the keyframes'
    *unmatched* features, DLT triangulation, then the reference's gates:
    positive depth in both views, sufficient parallax, reprojection chi2,
    scale-consistency between octaves.  Returns (state, n_created).
    """
    K, N, P, O = state.capacity
    Ta = state.kf_pose[kf_a]
    Tb = state.kf_pose[kf_b]
    sf = jnp.asarray([scale_factor ** i for i in range(n_levels)], jnp.float32)
    sigma2 = sf * sf

    # baseline gate (LocalMapping.cc:219-233): for mono, require the
    # baseline to be a reasonable fraction of the scene depth
    Ca = se3.translation(se3.inv(Ta))
    Cb = se3.translation(se3.inv(Tb))
    baseline = jnp.linalg.norm(Cb - Ca)

    # relative geometry a->b and essential matrix for the epipolar gate
    Tba = Tb @ se3.inv(Ta)
    Rba = Tba[:3, :3]
    tba = Tba[:3, 3]
    E = se3.hat(tba) @ Rba

    # normalized coords of both keyframes' features
    def norm_coords(kf):
        xy = state.kf_xy[kf]
        x = (xy[:, 0] - cam.cx) / cam.fx
        y = (xy[:, 1] - cam.cy) / cam.fy
        return jnp.stack([x, y], axis=-1)

    xa = norm_coords(kf_a)
    xb = norm_coords(kf_b)

    free_a = state.kf_feat_valid[kf_a] & (state.kf_point_idx[kf_a] < 0)
    free_b = state.kf_feat_valid[kf_b] & (state.kf_point_idx[kf_b] < 0)

    # epipolar distance of xb from the line E @ xa (in normalized coords,
    # scaled to pixels via fx for the sigma-based gate)
    xah = jnp.concatenate([xa, jnp.ones((N, 1))], axis=1)      # (N, 3)
    xbh = jnp.concatenate([xb, jnp.ones((N, 1))], axis=1)
    lines = xah @ E.T                                          # (N, 3) epiline in b
    num = jnp.abs(jnp.einsum("aj,bj->ab", lines, xbh))         # (Na, Nb)
    den = jnp.sqrt(lines[:, 0] ** 2 + lines[:, 1] ** 2)[:, None] + 1e-12
    dist_px = num / den * cam.fx
    oct_b = jnp.clip(state.kf_octave[kf_b], 0, n_levels - 1)
    epi_ok = dist_px < 3.84 * jnp.sqrt(jnp.take(sigma2, oct_b))[None, :]

    dmat = hamming(state.kf_desc[kf_a], state.kf_desc[kf_b])
    res = M.nn_match(
        dmat, row_valid=free_a, col_valid=free_b,
        extra_mask=epi_ok, max_dist=50,   # TH_LOW (ORBmatcher.cc:645)
    )
    keep = M.rotation_consistency_mask(
        state.kf_angle[kf_a], state.kf_angle[kf_b], res
    )
    res = M.MatchResult(
        idx=jnp.where(keep, res.idx, -1),
        dist=jnp.where(keep, res.dist, M.BIG),
        mask=keep,
    )
    res = M.resolve_duplicates(res, N)

    # triangulate all matches
    Pa = Ta[:3]
    Pb = Tb[:3]
    from ..geometry.triangulation import triangulate_dlt

    xb_m = xb[jnp.clip(res.idx, 0)]
    p3d = triangulate_dlt(Pa, Pb, xa, xb_m)

    # acceptance gates
    pca = se3.transform(Ta, p3d)
    pcb = se3.transform(Tb, p3d)
    za, zb = pca[:, 2], pcb[:, 2]
    pos = (za > 1e-3) & (zb > 1e-3)
    finite = jnp.all(jnp.isfinite(p3d), axis=1)

    ra = p3d - Ca
    rb = p3d - Cb
    cosp = jnp.sum(ra * rb, axis=1) / (
        jnp.linalg.norm(ra, axis=1) * jnp.linalg.norm(rb, axis=1) + 1e-12
    )
    parallax_ok = cosp < 0.9998

    za_s = jnp.where(pos, za, 1.0)
    zb_s = jnp.where(pos, zb, 1.0)
    ea = (pca[:, :2] / za_s[:, None] - xa) * cam.fx
    eb = (pcb[:, :2] / zb_s[:, None] - xb_m) * cam.fx
    oct_a = jnp.clip(state.kf_octave[kf_a], 0, n_levels - 1)
    oct_bm = jnp.take(oct_b, jnp.clip(res.idx, 0))
    chi_a = jnp.sum(ea * ea, axis=1) / jnp.take(sigma2, oct_a)
    chi_b = jnp.sum(eb * eb, axis=1) / jnp.take(sigma2, oct_bm)
    reproj_ok = (chi_a <= 5.991) & (chi_b <= 5.991)

    # scale consistency (LocalMapping.cc:383-402)
    da = jnp.linalg.norm(ra, axis=1)
    db = jnp.linalg.norm(rb, axis=1)
    ratio_dist = da / jnp.maximum(db, 1e-9)
    ratio_oct = jnp.take(sf, oct_a) / jnp.take(sf, oct_bm)
    scale_ok = (ratio_dist < ratio_oct * 1.5 * scale_factor) & (
        ratio_dist * 1.5 * scale_factor > ratio_oct
    )

    depth_scale = jnp.minimum(za, zb)
    baseline_ok = baseline > min_baseline_ratio * jnp.maximum(depth_scale, 1e-6)

    good = (
        res.mask & pos & finite & parallax_ok & reproj_ok & scale_ok & baseline_ok
    )

    # take up to max_new, best (lowest chi2 sum) first
    order_key = jnp.where(good, chi_a + chi_b, jnp.inf)
    order = jnp.argsort(order_key)
    chosen = order[:max_new]
    chosen_ok = jnp.take(good, chosen)
    n_new = jnp.sum(chosen_ok.astype(jnp.int32))

    slot = pt_base + jnp.cumsum(chosen_ok.astype(jnp.int32)) - 1
    slot = jnp.where(chosen_ok, slot, P)

    feat_a = chosen.astype(jnp.int32)
    feat_b = jnp.take(res.idx, chosen).astype(jnp.int32)
    pw = jnp.take(p3d, chosen, axis=0)
    desc = jnp.take(state.kf_desc[kf_a], chosen, axis=0)
    vec = pw - Ca
    dist = jnp.linalg.norm(vec, axis=1)
    normal = vec / jnp.maximum(dist, 1e-9)[:, None]
    octv = jnp.take(state.kf_octave[kf_a], chosen).astype(jnp.float32)
    max_dist = dist * (scale_factor ** octv)
    min_dist = max_dist / (scale_factor ** (n_levels - 1))

    s = state._replace(
        pt_pos=state.pt_pos.at[slot].set(pw, mode="drop"),
        pt_valid=state.pt_valid.at[slot].set(chosen_ok, mode="drop"),
        pt_desc=state.pt_desc.at[slot].set(desc, mode="drop"),
        pt_normal=state.pt_normal.at[slot].set(normal, mode="drop"),
        pt_min_dist=state.pt_min_dist.at[slot].set(min_dist, mode="drop"),
        pt_max_dist=state.pt_max_dist.at[slot].set(max_dist, mode="drop"),
        pt_ref_kf=state.pt_ref_kf.at[slot].set(kf_a, mode="drop"),
        pt_first_kf=state.pt_first_kf.at[slot].set(kf_a, mode="drop"),
        pt_obs_kf=state.pt_obs_kf.at[slot, 0].set(kf_a, mode="drop")
                                 .at[slot, 1].set(kf_b, mode="drop"),
        pt_obs_feat=state.pt_obs_feat.at[slot, 0].set(feat_a, mode="drop")
                                     .at[slot, 1].set(feat_b, mode="drop"),
    )
    # keyframe-side back pointers
    exist_a = jnp.take(s.kf_point_idx[kf_a], feat_a)
    kf_pt_a = s.kf_point_idx[kf_a].at[feat_a].set(
        jnp.where(chosen_ok, slot.astype(jnp.int32), exist_a)
    )
    s = s._replace(kf_point_idx=s.kf_point_idx.at[kf_a].set(kf_pt_a))
    feat_b_safe = jnp.where(chosen_ok, feat_b, 0)
    exist_b = jnp.take(s.kf_point_idx[kf_b], feat_b_safe)
    kf_pt_b = s.kf_point_idx[kf_b].at[feat_b_safe].set(
        jnp.where(chosen_ok, slot.astype(jnp.int32), exist_b)
    )
    s = s._replace(kf_point_idx=s.kf_point_idx.at[kf_b].set(kf_pt_b))
    return s, n_new


def triangulate_with_neighbors(
    state: MapState,
    kf_a: jax.Array,
    neighbors: jax.Array,     # (T,) neighbor slots (-1 pad)
    cam: Camera,
    pt_base: jax.Array,
    *,
    max_new: int,
    scale_factor: float,
    n_levels: int,
    min_baseline_ratio: float = 0.01,
) -> tuple[MapState, jax.Array]:
    """CreateNewMapPoints over all covisible neighbors in ONE program
    (LocalMapping.cc:185-423 loops neighbors; separate dispatches pay launch
    latency per neighbor).  Skips padded slots and stops allocating when the
    point bank cannot hold another ``max_new`` batch.  Returns
    (state, n_created_total).

    As in fuse_into_keyframes, the scan carries only the banks the kernel
    mutates (the pt_* banks + kf_point_idx); the keyframe feature banks it
    reads (~30 MB of descriptors/keypoints) stay loop-invariant instead of
    being copied per neighbor."""
    P = state.pt_pos.shape[0]
    _MUT = ("pt_pos", "pt_valid", "pt_desc", "pt_normal", "pt_min_dist",
            "pt_max_dist", "pt_ref_kf", "pt_first_kf", "pt_obs_kf",
            "pt_obs_feat", "kf_point_idx")

    def body(carry, nb):
        banks, base = carry

        def do(args):
            banks, base = args
            s = state._replace(**dict(zip(_MUT, banks)))
            s2, n_new = triangulate_with_neighbor(
                s, kf_a, nb, cam, base, max_new=max_new,
                scale_factor=scale_factor, n_levels=n_levels,
                min_baseline_ratio=min_baseline_ratio,
            )
            return tuple(getattr(s2, f) for f in _MUT), base + n_new

        ok = (nb >= 0) & (base + max_new <= P)
        return jax.lax.cond(ok, do, lambda a: a, (banks, base)), None

    carry0 = (tuple(getattr(state, f) for f in _MUT), pt_base)
    (banks, end), _ = jax.lax.scan(body, carry0, neighbors)
    state = state._replace(**dict(zip(_MUT, banks)))
    return state, end - pt_base


def keyframe_redundancy(
    state: MapState,
    kf_slot: jax.Array,
    *,
    min_obs: int = 3,
) -> jax.Array:
    """Fraction of keyframe ``kf_slot``'s landmarks that are redundantly
    observed (>= 3 other keyframes at the same or finer octave) —
    LocalMapping::KeyFrameCulling (LocalMapping.cc:595-655).  The caller
    culls the keyframe when the ratio exceeds 0.9.
    """
    K, N, P, O = state.capacity
    pt = state.kf_point_idx[kf_slot]                     # (N,)
    has = (pt >= 0) & state.kf_feat_valid[kf_slot]
    ptc = jnp.clip(pt, 0)
    my_oct = state.kf_octave[kf_slot]                    # (N,)

    obs_kf = state.pt_obs_kf[ptc]                        # (N, O)
    obs_ft = state.pt_obs_feat[ptc]
    obs_ok = (obs_kf >= 0) & (obs_kf != kf_slot)
    obs_ok = obs_ok & jnp.take(state.kf_valid, jnp.clip(obs_kf, 0))
    oct_other = state.kf_octave[jnp.clip(obs_kf, 0), jnp.clip(obs_ft, 0)]
    scale_ok = oct_other <= my_oct[:, None] + 1
    n_good = jnp.sum((obs_ok & scale_ok).astype(jnp.int32), axis=1)
    redundant = has & (n_good >= min_obs)
    n_pts = jnp.maximum(jnp.sum(has.astype(jnp.int32)), 1)
    return jnp.sum(redundant.astype(jnp.int32)) / n_pts.astype(jnp.float32)


def remove_keyframe(state: MapState, kf_slot: jax.Array) -> MapState:
    """Invalidate a keyframe and drop its observations from all landmarks
    (KeyFrame::SetBadFlag, KeyFrame.cc:416-505; spanning-tree re-parenting
    is host-side bookkeeping)."""
    K, N, P, O = state.capacity
    drop = state.pt_obs_kf == kf_slot
    return state._replace(
        kf_valid=state.kf_valid.at[kf_slot].set(False),
        pt_obs_kf=jnp.where(drop, -1, state.pt_obs_kf),
        pt_obs_feat=jnp.where(drop, -1, state.pt_obs_feat),
        kf_point_idx=state.kf_point_idx.at[kf_slot].set(
            jnp.full((N,), -1, jnp.int32)
        ),
    )
