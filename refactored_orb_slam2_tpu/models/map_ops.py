"""Jitted functional map mutations: keyframe insertion, point creation,
observation bookkeeping, BA problem assembly and writeback.

These replace the mutex-guarded mutations scattered through the reference:
KeyFrame::AddMapPoint / MapPoint::AddObservation (MapPoint.cc:100-136),
Tracking::CreateNewKeyFrame's close-point creation (Tracking.cc:976-1023),
and the g2o problem construction in Optimizer::LocalBundleAdjustment
(Optimizer.cc:437-533).  Every function takes a MapState and returns a new
one; slot allocation counters live on the host (the orchestrator).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..optim.bundle_adjustment import BAProblem
from .map_state import MapState


def _first_free_obs_slot(obs_kf_row: jax.Array) -> jax.Array:
    """Index of the first -1 slot in a (O,) observation row (O if full)."""
    free = obs_kf_row < 0
    return jnp.argmax(free)  # argmax of bool -> first True; 0 if none... guarded by any()


def insert_keyframe(
    state: MapState,
    kf_slot: jax.Array,
    frame_id: jax.Array,
    Tcw: jax.Array,
    frame_xy: jax.Array,
    frame_uvr: jax.Array,
    frame_octave: jax.Array,
    frame_angle: jax.Array,
    frame_desc: jax.Array,
    frame_valid: jax.Array,
    matched_pt: jax.Array,   # (N,) point slot tracked by each feature (-1)
    parent_kf: jax.Array,    # int32 spanning-tree parent (-1 for first KF)
) -> MapState:
    """Snapshot a frame into keyframe slot ``kf_slot`` and register its
    tracked matches as observations on the map points."""
    K, N, P, O = state.capacity
    s = state._replace(
        kf_pose=state.kf_pose.at[kf_slot].set(Tcw),
        kf_valid=state.kf_valid.at[kf_slot].set(True),
        kf_frame_id=state.kf_frame_id.at[kf_slot].set(frame_id),
        kf_xy=state.kf_xy.at[kf_slot].set(frame_xy),
        kf_uvr=state.kf_uvr.at[kf_slot].set(frame_uvr),
        kf_octave=state.kf_octave.at[kf_slot].set(frame_octave),
        kf_angle=state.kf_angle.at[kf_slot].set(frame_angle),
        kf_desc=state.kf_desc.at[kf_slot].set(frame_desc),
        kf_feat_valid=state.kf_feat_valid.at[kf_slot].set(frame_valid),
        kf_point_idx=state.kf_point_idx.at[kf_slot].set(
            jnp.where(frame_valid, matched_pt, -1)
        ),
        kf_parent=state.kf_parent.at[kf_slot].set(parent_kf),
    )
    return add_observations(s, kf_slot, jnp.where(frame_valid, matched_pt, -1))


def add_observations(state: MapState, kf_slot: jax.Array, matched_pt: jax.Array) -> MapState:
    """Append (kf_slot, feat) observations for every feature with a point.

    matched_pt: (N,) point slot per feature (-1 = none).  Each point gains
    at most one observation (duplicates resolved upstream).
    """
    K, N, P, O = state.capacity
    feat_ids = jnp.arange(N, dtype=jnp.int32)
    has_pt = matched_pt >= 0
    # feature observing each point (or -1); invalid features scatter out of
    # range (mode="drop") so they can't clobber slot 0
    scatter_idx = jnp.where(has_pt, matched_pt, P)
    feat_of_pt = jnp.full((P,), -1, jnp.int32).at[scatter_idx].set(
        feat_ids, mode="drop"
    )
    # don't double-add if this kf already observes the point
    already = jnp.any(state.pt_obs_kf == kf_slot, axis=1)
    new_obs = (feat_of_pt >= 0) & state.pt_valid & ~already
    free_slot = jnp.argmax(state.pt_obs_kf < 0, axis=1)
    has_free = jnp.any(state.pt_obs_kf < 0, axis=1)
    new_obs = new_obs & has_free
    # write the (row, free_slot) cells as an elementwise select: a
    # (P,)-row scatter serializes on TPU (~16 ms/call at P=65k measured
    # inside the fuse scan — it was the whole fuse cost), while the
    # column-mask compare+where is pure VPU work
    col_hit = (
        jnp.arange(O, dtype=jnp.int32)[None, :] == free_slot[:, None]
    ) & new_obs[:, None]
    obs_kf = jnp.where(col_hit, kf_slot, state.pt_obs_kf)
    obs_feat = jnp.where(col_hit, feat_of_pt[:, None], state.pt_obs_feat)
    return state._replace(pt_obs_kf=obs_kf, pt_obs_feat=obs_feat)


def create_points_from_depth(
    state: MapState,
    kf_slot: jax.Array,
    depth: jax.Array,        # (N,) per-feature depth (-1 invalid)
    matched_pt: jax.Array,   # (N,) existing point per feature (-1)
    cam,
    th_depth: float,
    pt_base: jax.Array,      # first free point slot (host counter)
    max_new: int,
) -> tuple[MapState, jax.Array]:
    """Create up to ``max_new`` close stereo/RGB-D points for unmatched
    features, nearest first (Tracking::CreateNewKeyFrame, Tracking.cc:976-1023
    and StereoInitialization Tracking.cc:454-503).

    Returns (new state, number created).  New points occupy slots
    [pt_base, pt_base + n_new).
    """
    K, N, P, O = state.capacity
    feat_valid = state.kf_feat_valid[kf_slot]
    eligible = feat_valid & (depth > 0) & (depth < th_depth) & (matched_pt < 0)
    # nearest-first ranking; ineligible slots pushed to +inf
    order_key = jnp.where(eligible, depth, jnp.inf)
    order = jnp.argsort(order_key)                       # (N,) feature ids
    take = jnp.arange(max_new)
    chosen_feat = order[take]                            # (max_new,)
    chosen_ok = jnp.take(eligible, chosen_feat)
    n_new = jnp.sum(chosen_ok.astype(jnp.int32))

    Tcw = state.kf_pose[kf_slot]
    Twc = se3.inv(Tcw)
    xy = state.kf_xy[kf_slot]
    d = jnp.take(depth, chosen_feat)
    uv = jnp.take(xy, chosen_feat, axis=0)
    x = (uv[:, 0] - cam.cx) / cam.fx * d
    y = (uv[:, 1] - cam.cy) / cam.fy * d
    pc = jnp.stack([x, y, d], axis=-1)
    pw = se3.transform(Twc, pc)

    slot = pt_base + jnp.cumsum(chosen_ok.astype(jnp.int32)) - 1  # (max_new,)
    slot = jnp.where(chosen_ok, slot, P)  # dump rejects out of range (drop mode)

    desc = jnp.take(state.kf_desc[kf_slot], chosen_feat, axis=0)
    center = se3.translation(Twc)
    vec = pw - center
    dist = jnp.linalg.norm(vec, axis=-1)
    normal = vec / jnp.maximum(dist, 1e-9)[:, None]
    octv = jnp.take(state.kf_octave[kf_slot], chosen_feat).astype(jnp.float32)
    # distance band seeded from creating observation (MapPoint ctor semantics)
    sf = 1.2  # refined by update_point_stats later; seed with defaults
    max_dist = dist * (sf ** octv)
    min_dist = max_dist / (sf ** 7)

    s = state._replace(
        pt_pos=state.pt_pos.at[slot].set(pw, mode="drop"),
        pt_valid=state.pt_valid.at[slot].set(chosen_ok, mode="drop"),
        pt_desc=state.pt_desc.at[slot].set(desc, mode="drop"),
        pt_normal=state.pt_normal.at[slot].set(normal, mode="drop"),
        pt_min_dist=state.pt_min_dist.at[slot].set(min_dist, mode="drop"),
        pt_max_dist=state.pt_max_dist.at[slot].set(max_dist, mode="drop"),
        pt_ref_kf=state.pt_ref_kf.at[slot].set(kf_slot, mode="drop"),
        pt_first_kf=state.pt_first_kf.at[slot].set(kf_slot, mode="drop"),
        pt_obs_kf=state.pt_obs_kf.at[slot, 0].set(kf_slot, mode="drop"),
        pt_obs_feat=state.pt_obs_feat.at[slot, 0].set(
            chosen_feat.astype(jnp.int32), mode="drop"
        ),
    )
    # register on the keyframe's feature bank too (rejected rows keep their
    # existing value — they may hold legitimate matches)
    existing = jnp.take(s.kf_point_idx[kf_slot], chosen_feat)
    kf_pt = s.kf_point_idx[kf_slot].at[chosen_feat].set(
        jnp.where(chosen_ok, slot.astype(jnp.int32), existing)
    )
    s = s._replace(kf_point_idx=s.kf_point_idx.at[kf_slot].set(kf_pt))
    return s, n_new


# ---------------------------------------------------------------------------
# BA problem assembly / writeback
# ---------------------------------------------------------------------------

def build_ba_problem(
    state: MapState,
    window_mask_kf: jax.Array,   # (K,) bool: optimized KFs
    fixed_mask_kf: jax.Array,    # (K,) bool: fixed KFs included in problem
    inv_sigma2_table: jax.Array, # (n_levels,) per-octave information
) -> BAProblem:
    """Assemble a BAProblem from the map for the given keyframe window.

    Points: all valid points observed by at least one window KF
    (Optimizer.cc:471-485).  Observations outside window+fixed are dropped
    from the problem (their KFs are not vertices).
    """
    K, N, P, O = state.capacity
    in_problem = window_mask_kf | fixed_mask_kf
    kfc = jnp.clip(state.pt_obs_kf, 0)
    ftc = jnp.clip(state.pt_obs_feat, 0)
    obs_ok = (
        (state.pt_obs_kf >= 0)
        & jnp.take(state.kf_valid, kfc)
        & jnp.take(in_problem, kfc)
    )
    pt_in = state.pt_valid & jnp.any(
        obs_ok & jnp.take(window_mask_kf, kfc), axis=1
    )
    obs_ok = obs_ok & pt_in[:, None]

    uvr = state.kf_uvr[kfc, ftc]                      # (P, O, 3)
    octv = state.kf_octave[kfc, ftc]
    inv_s2 = jnp.take(inv_sigma2_table, jnp.clip(octv, 0, inv_sigma2_table.shape[0] - 1))
    is_stereo = uvr[..., 2] >= 0

    return BAProblem(
        kf_poses=state.kf_pose,
        kf_fixed=fixed_mask_kf | ~window_mask_kf,
        kf_valid=state.kf_valid & in_problem,
        points=state.pt_pos,
        point_valid=pt_in,
        obs_kf=jnp.where(obs_ok, state.pt_obs_kf, -1),
        obs_uvr=uvr,
        obs_inv_sigma2=inv_s2,
        obs_is_stereo=is_stereo,
        obs_valid=obs_ok,
    )


def gather_ba_window(
    state: MapState,
    window_mask_kf: jax.Array,   # (K,) bool: optimized KFs
    fixed_mask_kf: jax.Array,    # (K,) bool: fixed-KF candidates
    inv_sigma2_table: jax.Array,
    *,
    max_kfs: int,
    max_points: int,
    max_obs: int | None = None,
):
    """Compact the local-BA window into a small static-shape BAProblem.

    The reference's LocalBundleAdjustment (Optimizer.cc:437-533) builds its
    g2o graph from exactly this set: the covisible window, every point one
    of them observes, and — fixed — every other keyframe observing those
    points.  Here that subgraph is *gathered* into (max_kfs, max_points, O)
    arrays so BA cost scales with the window, not with map capacity.

    Fixed keyframes are ranked by how many window-point observations they
    contribute, so when the boundary overflows ``max_kfs`` the most
    constraining ones are kept.

    ``max_obs`` (static, optional) compacts the observation dimension as
    well: each gathered point keeps its max_obs highest-priority
    observation slots (window-KF obs first, then fixed-boundary obs) — LM
    cost is linear in P*O edge slots, and window points rarely carry
    anywhere near ``max_obs_per_point`` live observations inside the
    subgraph.

    Returns (problem, kf_sel, pt_sel, obs_sel, n_pt_in): kf_sel/pt_sel map
    compact rows back to map slots (pad rows point one past the end),
    obs_sel (Pw, O') maps compact obs columns back to original obs slots
    (for scatter_ba_window), and n_pt_in counts window points before the
    ``max_points`` clamp (host-side overflow signal).
    """
    K, N, P, O = state.capacity
    max_kfs = min(max_kfs, K)
    max_points = min(max_points, P)
    window = window_mask_kf & state.kf_valid
    # obs slots of removed keyframes are cleared by remove_keyframe, so
    # ``pt_obs_kf >= 0`` alone is the liveness test — a full-bank
    # ``take(kf_valid, kfc)`` is a 2M-element random gather that XLA
    # lowers pathologically on TPU (same defect class as the 16.5 ms
    # fused-step gather fixed in round 4)
    obs_exists = state.pt_obs_kf >= 0

    # points seen from the window: membership via comparison against the
    # (small) window slot list instead of a (P, O) gather into the mask
    (win_slots,) = jnp.nonzero(window, size=max_kfs, fill_value=K)
    obs_in_window = jnp.any(
        state.pt_obs_kf[:, :, None] == win_slots[None, None, :], axis=-1
    )
    pt_in = state.pt_valid & jnp.any(obs_exists & obs_in_window, axis=1)
    n_pt_in = jnp.sum(pt_in.astype(jnp.int32))
    (pt_sel,) = jnp.nonzero(pt_in, size=max_points, fill_value=P)
    pt_ok = pt_sel < P
    psafe = jnp.clip(pt_sel, 0, P - 1)

    # keyframes observing selected points -> fixed-boundary candidates,
    # ranked by observation count (Optimizer.cc:517-532 lFixedCameras);
    # one-hot matmul segment-sum (serialized TPU scatter avoidance, see
    # optim.bundle_adjustment._seg_sum_oh)
    from ..optim.bundle_adjustment import _seg_sum_oh

    sel_obs_kf = state.pt_obs_kf[psafe]                      # (Pw, O)
    sel_obs_ok = obs_exists[psafe] & pt_ok[:, None]
    obs_ct = _seg_sum_oh(
        sel_obs_ok.astype(jnp.float32).reshape(-1, 1),
        jnp.clip(sel_obs_kf, 0).reshape(-1),
        K,
    )[:, 0].astype(jnp.int32)
    fixed_eff = fixed_mask_kf & state.kf_valid & ~window & (obs_ct > 0)
    rank = jnp.where(window, 0, jnp.where(fixed_eff, 1, 2)).astype(jnp.int32)
    # ascending sort: window first, then fixed by -obs_ct, slot as tiebreak
    order = jnp.lexsort((jnp.arange(K), -obs_ct, rank))
    kf_sel = order[:max_kfs]                                 # (Kw,)
    kf_in = jnp.take(rank, kf_sel) < 2
    kf_sel = jnp.where(kf_in, kf_sel, K)                     # pad -> K
    ksafe = jnp.clip(kf_sel, 0, K - 1)
    # map-slot -> compact-row lookup (K+1 absorbs pads)
    kf_map = jnp.full((K + 1,), -1, jnp.int32).at[kf_sel].set(
        jnp.arange(max_kfs, dtype=jnp.int32), mode="drop"
    )

    # compact observation rows: remap kf slots, drop obs outside the subgraph
    compact_kf = kf_map[jnp.clip(sel_obs_kf, 0, K)]          # (Pw, O)
    obs_ok = sel_obs_ok & (compact_kf >= 0)
    sel_obs_feat = jnp.clip(state.pt_obs_feat[psafe], 0)

    if max_obs is not None and max_obs < O:
        # Compact the obs dimension too: LM cost is linear in P*O edge
        # slots (profile_lm.py: the (4096, 32) edge evaluation is the
        # local-BA bottleneck at 4.3 ms/eval on v5e), while window points
        # rarely carry anywhere near O live observations.  Keep the
        # highest-priority max_obs slots per point: window-KF observations
        # first (their cameras move), then fixed-boundary ones; overflow
        # drops the least-constraining edges only.
        in_window = jnp.take(window, jnp.clip(sel_obs_kf, 0)) & obs_ok
        prio = jnp.where(in_window, 0, jnp.where(obs_ok, 1, 2))
        obs_sel = jnp.argsort(prio, axis=1, stable=True)[:, :max_obs]
        take = lambda x: jnp.take_along_axis(x, obs_sel, axis=1)
        sel_obs_kf = take(sel_obs_kf)
        sel_obs_feat = take(sel_obs_feat)
        compact_kf = take(compact_kf)
        obs_ok = take(obs_ok)
    else:
        obs_sel = jnp.broadcast_to(
            jnp.arange(O, dtype=jnp.int32)[None, :], obs_ok.shape
        )

    uvr = state.kf_uvr[jnp.clip(sel_obs_kf, 0), sel_obs_feat]
    octv = state.kf_octave[jnp.clip(sel_obs_kf, 0), sel_obs_feat]
    inv_s2 = jnp.take(
        inv_sigma2_table, jnp.clip(octv, 0, inv_sigma2_table.shape[0] - 1)
    )

    prob = BAProblem(
        kf_poses=state.kf_pose[ksafe],
        kf_fixed=kf_in & ~jnp.take(window, ksafe),
        kf_valid=kf_in,
        points=state.pt_pos[psafe],
        point_valid=pt_ok,
        obs_kf=jnp.where(obs_ok, compact_kf, -1),
        obs_uvr=uvr,
        obs_inv_sigma2=inv_s2,
        obs_is_stereo=uvr[..., 2] >= 0,
        obs_valid=obs_ok,
    )
    return prob, kf_sel, pt_sel, obs_sel, n_pt_in


def scatter_ba_window(
    state: MapState,
    prob: BAProblem,
    kf_sel: jax.Array,
    pt_sel: jax.Array,
    obs_sel: jax.Array,
    ba_poses: jax.Array,
    ba_points: jax.Array,
    ba_obs_valid: jax.Array,
) -> MapState:
    """Write compact-window BA results back into the full map
    (Optimizer.cc:696-744 semantics, windowed).  ``obs_sel`` maps the
    problem's (possibly obs-compacted) columns back to original obs
    slots."""
    K, N, P, O = state.capacity
    opt_kf = prob.kf_valid & ~prob.kf_fixed
    kf_tgt = jnp.where(opt_kf, kf_sel, K)
    kf_pose = state.kf_pose.at[kf_tgt].set(ba_poses, mode="drop")
    pt_tgt = jnp.where(prob.point_valid, pt_sel, P)
    pt_pos = state.pt_pos.at[pt_tgt].set(ba_points, mode="drop")

    # outlier observations: erase on both sides of the incidence.  Expand
    # the compact (Pw, O') dropped mask back to original (Pw, O) slots.
    dropped_c = prob.obs_valid & ~ba_obs_valid               # (Pw, O')
    Pw = dropped_c.shape[0]
    dropped = jnp.zeros((Pw, O), bool).at[
        jnp.arange(Pw)[:, None], obs_sel
    ].max(dropped_c)
    psafe = jnp.clip(pt_sel, 0, P - 1)
    row_kf = jnp.where(dropped, -1, state.pt_obs_kf[psafe])
    row_ft = jnp.where(dropped, -1, state.pt_obs_feat[psafe])
    obs_kf = state.pt_obs_kf.at[pt_tgt].set(row_kf, mode="drop")
    obs_feat = state.pt_obs_feat.at[pt_tgt].set(row_ft, mode="drop")

    kfc = jnp.clip(state.pt_obs_kf[psafe], 0)
    ftc = jnp.clip(state.pt_obs_feat[psafe], 0)
    flat_idx = jnp.where(
        dropped & (pt_sel < P)[:, None], kfc * N + ftc, K * N
    ).reshape(-1)
    clear = jnp.zeros((K * N,), jnp.int32).at[flat_idx].max(1, mode="drop")
    kf_point_idx = jnp.where(clear.reshape(K, N) > 0, -1, state.kf_point_idx)
    return state._replace(
        kf_pose=kf_pose,
        pt_pos=pt_pos,
        pt_obs_kf=obs_kf,
        pt_obs_feat=obs_feat,
        kf_point_idx=kf_point_idx,
    )


def writeback_ba(
    state: MapState,
    ba_poses: jax.Array,
    ba_points: jax.Array,
    ba_obs_valid: jax.Array,
    prob: BAProblem,
) -> MapState:
    """Apply BA results: poses for optimized KFs, positions for included
    points, and erase observations that BA classified as outliers
    (Optimizer.cc:696-744)."""
    K, N, P, O = state.capacity
    opt_kf = prob.kf_valid & ~prob.kf_fixed
    kf_pose = jnp.where(opt_kf[:, None, None], ba_poses, state.kf_pose)
    pt_pos = jnp.where(prob.point_valid[:, None], ba_points, state.pt_pos)

    # outliers: were in the problem but failed the final gate
    dropped = prob.obs_valid & ~ba_obs_valid
    obs_kf = jnp.where(dropped, -1, state.pt_obs_kf)
    obs_feat = jnp.where(dropped, -1, state.pt_obs_feat)
    # clear the keyframe-side back pointers for dropped observations
    kfc = jnp.clip(state.pt_obs_kf, 0)
    ftc = jnp.clip(state.pt_obs_feat, 0)
    flat_idx = (kfc * N + ftc).reshape(-1)
    upd = jnp.where(dropped, 1, 0).reshape(-1)
    clear = jnp.zeros((K * N,), jnp.int32).at[flat_idx].max(upd, mode="drop")
    kf_point_idx = jnp.where(
        clear.reshape(K, N) > 0, -1, state.kf_point_idx
    )
    return state._replace(
        kf_pose=kf_pose,
        pt_pos=pt_pos,
        pt_obs_kf=obs_kf,
        pt_obs_feat=obs_feat,
        kf_point_idx=kf_point_idx,
    )
