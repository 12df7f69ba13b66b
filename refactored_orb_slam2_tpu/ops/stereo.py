"""Stereo left-right feature matching with sub-pixel SAD refinement.

Replaces Frame::ComputeStereoMatches (reference Frame.cc:477-646): the
row-bucketed candidate lists become a dense row/disparity/octave mask over
the full (N_left, N_right) Hamming matrix; the 11-step sliding SAD window
with parabola fit is a batched gather against a "stacked pyramid" image
(all levels concatenated along rows so per-keypoint level indexing is a
single dynamic-slice, no per-level control flow).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .descriptors import hamming
from . import matching as M

SAD_W = 5          # half window (11x11), Frame.cc:560
SAD_L = 5          # slide range +/-5, Frame.cc:567
TH_ORB = 75        # (TH_HIGH + TH_LOW) / 2, Frame.cc:509


class StereoMatchResult(NamedTuple):
    u_right: jax.Array   # (N,) float32, -1 where unmatched
    depth: jax.Array     # (N,) float32, -1 where unmatched
    valid: jax.Array     # (N,) bool


def stack_pyramid(pyr: list) -> tuple[jax.Array, np.ndarray]:
    """Concatenate pyramid levels along rows (padded to level-0 width).

    Returns (stacked image (sum_H, W0), per-level row offsets (L,)).
    Lets per-keypoint patch gathers index their own level with plain
    arithmetic instead of lax.switch over levels.
    """
    w0 = pyr[0].shape[1]
    offsets = np.zeros(len(pyr), np.int32)
    rows = []
    acc = 0
    for lv, im in enumerate(pyr):
        offsets[lv] = acc
        acc += im.shape[0]
        rows.append(jnp.pad(im, ((0, 0), (0, w0 - im.shape[1]))))
    return jnp.concatenate(rows, axis=0), offsets


def _gather_patch(stack: jax.Array, y: jax.Array, x: jax.Array, h: int, w: int):
    """Dynamic-slice a (h, w) patch at (y, x) top-left (batched via vmap)."""
    return jax.lax.dynamic_slice(stack, (y, x), (h, w))


def stereo_match(
    left,
    right,
    stack_l: jax.Array,
    stack_r: jax.Array,
    level_offsets: np.ndarray,
    scale_factors: np.ndarray,
    fx: float,
    bf: float,
    min_z: float,
) -> StereoMatchResult:
    """Match left ORB features to right features and refine disparity.

    left/right: OrbFeatures banks (raw level-0 coords).
    Returns per-left-feature u_right and depth (= bf / disparity).
    """
    n = left.xy.shape[0]
    sf = jnp.asarray(scale_factors)
    offs = jnp.asarray(level_offsets)

    # --- 1. Hamming matching under row/disparity/octave gates -------------
    dist = hamming(left.desc, right.desc)
    vL = left.xy[:, 1:2]
    vR = right.xy[None, :, 1]
    r_row = 2.0 * jnp.take(sf, right.octave)[None, :]   # Frame.cc:495
    row_ok = jnp.abs(vR - vL) <= r_row
    lev_ok = M.octave_band_mask(left.octave, right.octave, -1, 1)
    uL = left.xy[:, 0:1]
    uR = right.xy[None, :, 0]
    max_d = fx                      # bf / minZ with minZ = baseline
    min_d = 0.0
    disp = uL - uR
    disp_ok = (disp >= min_d) & (disp <= max_d)
    res = M.nn_match(
        dist,
        row_valid=left.valid,
        col_valid=right.valid,
        extra_mask=row_ok & lev_ok & disp_ok,
        max_dist=TH_ORB,
    )

    # --- 2. SAD sub-pixel refinement (Frame.cc:557-625) -------------------
    lev = left.octave
    inv_sf = 1.0 / jnp.take(sf, lev)
    su_l = jnp.round(left.xy[:, 0] * inv_sf).astype(jnp.int32)
    sv_l = jnp.round(left.xy[:, 1] * inv_sf).astype(jnp.int32)
    uR0 = jnp.take(right.xy[:, 0], jnp.clip(res.idx, 0))
    su_r0 = jnp.round(uR0 * inv_sf).astype(jnp.int32)

    H_l, W0 = stack_l.shape
    y_l = jnp.take(offs, lev) + sv_l
    # clamp starts so slices stay in bounds; invalid results masked later
    ps = 2 * SAD_W + 1
    strip_w = ps + 2 * SAD_L
    y0 = jnp.clip(y_l - SAD_W, 0, H_l - ps)
    xl0 = jnp.clip(su_l - SAD_W, 0, W0 - ps)
    xr0 = jnp.clip(su_r0 - SAD_W - SAD_L, 0, W0 - strip_w)

    patch_l = jax.vmap(lambda y, x: _gather_patch(stack_l, y, x, ps, ps))(y0, xl0)
    strip_r = jax.vmap(lambda y, x: _gather_patch(stack_r, y, x, ps, strip_w))(y0, xr0)

    # centre-subtract (reference subtracts the central pixel value)
    cl = patch_l[:, SAD_W, SAD_W][:, None, None]
    patch_l_n = patch_l - cl
    # windows for each of the 11 shifts: (n, 11 shifts, ps, ps)
    wins = jnp.stack(
        [strip_r[:, :, i : i + ps] for i in range(2 * SAD_L + 1)], axis=1
    )
    cr = wins[:, :, SAD_W, SAD_W][:, :, None, None]
    wins_n = wins - cr
    sad = jnp.sum(jnp.abs(patch_l_n[:, None] - wins_n), axis=(2, 3))  # (n, 11)
    best_inc = jnp.argmin(sad, axis=1)
    best_sad = jnp.take_along_axis(sad, best_inc[:, None], axis=1)[:, 0]

    # parabola fit over neighbors (Frame.cc:604-612)
    i_c = jnp.clip(best_inc, 1, 2 * SAD_L - 1)
    s_m = jnp.take_along_axis(sad, (i_c - 1)[:, None], axis=1)[:, 0]
    s_c = jnp.take_along_axis(sad, i_c[:, None], axis=1)[:, 0]
    s_p = jnp.take_along_axis(sad, (i_c + 1)[:, None], axis=1)[:, 0]
    denom = s_m + s_p - 2.0 * s_c
    delta = jnp.where(jnp.abs(denom) > 1e-6, (s_m - s_p) / (2.0 * denom), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    interior = (best_inc >= 1) & (best_inc <= 2 * SAD_L - 1)
    delta = jnp.where(interior, delta, 0.0)

    scale_l = jnp.take(sf, lev)
    best_u_r = scale_l * (
        su_r0.astype(jnp.float32) + (best_inc - SAD_L).astype(jnp.float32) + delta
    )
    disparity = left.xy[:, 0] - best_u_r
    # clamp tiny/negative disparities like the reference (Frame.cc:617-621)
    tiny = (disparity <= 0) & (disparity >= -1.0)
    disparity = jnp.where(tiny, 0.01, disparity)
    best_u_r = jnp.where(tiny, left.xy[:, 0] - 0.01, best_u_r)
    ok = res.mask & (disparity > 0) & (disparity <= max_d)

    # --- 3. median SAD outlier filter (Frame.cc:634-645) ------------------
    sad_sorted = jnp.sort(jnp.where(ok, best_sad, jnp.inf))
    n_ok = jnp.sum(ok)
    median = sad_sorted[jnp.clip(n_ok // 2, 0, n - 1)]
    th = 1.5 * 1.4 * median
    ok = ok & (best_sad < th)

    depth = jnp.where(ok, bf / jnp.maximum(disparity, 1e-6), -1.0)
    # cap absurd depths from near-zero disparity
    ok = ok & (depth > min_z)
    return StereoMatchResult(
        u_right=jnp.where(ok, best_u_r, -1.0),
        depth=jnp.where(ok, depth, -1.0),
        valid=ok,
    )


def depth_to_uright(xy_un: jax.Array, depth: jax.Array, bf: float) -> jax.Array:
    """RGB-D: synthesize right-view u from depth
    (Frame::ComputeStereoFromRGBD, Frame.cc:648-666)."""
    ok = depth > 0
    return jnp.where(ok, xy_un[:, 0] - bf / jnp.maximum(depth, 1e-6), -1.0)
