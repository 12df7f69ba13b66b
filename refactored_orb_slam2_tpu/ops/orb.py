"""TPU-native ORB feature extraction.

One jitted program replaces the reference's ORBextractor::operator()
(ORBextractor.cc:978-1039): image pyramid -> whole-image FAST-9-16 with the
two-threshold cell fallback -> 3x3 NMS -> spatially-balanced top-k selection
-> intensity-centroid orientation -> Gaussian blur -> rotated rBRIEF, all
with static shapes (padded keypoint banks + validity masks).

Spatial balancing: the reference runs a greedy quad-tree
(DistributeOctTree, ORBextractor.cc:529-731) to keep one best corner per
spatial node.  The array-native equivalent here keeps the best corner of
every 30x30 cell first (a "cell winner" bonus added to the score before a
single top-k), which yields the same uniform-coverage behavior without
data-dependent control flow.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fast as fast_ops
from . import image as image_ops
from .descriptors import pack_bits
from .orb_pattern import BRIEF_PATTERN

EDGE_MARGIN = 19       # descriptor patch radius (EDGE_THRESHOLD, ORBextractor.cc:31)
PATCH = 2 * EDGE_MARGIN + 1   # 39x39 gathered patch
HALF_PATCH = 15        # IC_Angle circular patch radius (ORBextractor.cc:32)
CELL = 30              # FAST cell size (ORBextractor.cc:754)


class OrbFeatures(NamedTuple):
    """Padded keypoint bank for one frame; invalid slots are masked."""

    xy: jax.Array        # (N, 2) float32, level-0 raw pixel coords (x, y)
    response: jax.Array  # (N,) float32 FAST score
    octave: jax.Array    # (N,) int32 pyramid level
    angle: jax.Array     # (N,) float32 orientation in degrees [0, 360)
    desc: jax.Array      # (N, 8) uint32 packed rBRIEF
    valid: jax.Array     # (N,) bool

    @property
    def n_slots(self) -> int:
        return self.xy.shape[0]


def level_quotas(n_features: int, n_levels: int, scale_factor: float):
    """Per-level feature budget, geometric in 1/scale (ORBextractor.cc:429-441)."""
    factor = 1.0 / scale_factor
    n_per = n_features * (1 - factor) / (1 - factor ** n_levels)
    quotas = []
    total = 0
    for lv in range(n_levels - 1):
        q = int(round(n_per))
        quotas.append(q)
        total += q
        n_per *= factor
    quotas.append(max(n_features - total, 0))
    return quotas


@functools.lru_cache(maxsize=None)
def _circular_mask_weights():
    """(31, 31) x-weight, y-weight, and mask arrays for IC_Angle."""
    r = HALF_PATCH
    dy, dx = np.mgrid[-r : r + 1, -r : r + 1]
    mask = (dx * dx + dy * dy) <= r * r
    wx = (dx * mask).astype(np.float32)
    wy = (dy * mask).astype(np.float32)
    return wx, wy


def _extract_level(
    img: jax.Array,
    img_blur: jax.Array,
    quota: int,
    ini_th: float,
    min_th: float,
):
    """Detect, select, orient and describe up to ``quota`` corners on one level.

    Returns (xy_level float32 (q,2) in level coords, response (q,),
    angle (q,), desc (q,8) uint32, valid (q,)).
    """
    h, w = img.shape
    score_ini, corner_ini = fast_ops.fast_score_and_corners(img, ini_th)
    _, corner_min = fast_ops.fast_score_and_corners(img, min_th)
    corner = fast_ops.cell_fallback_mask(corner_ini, corner_min, CELL)
    score = jnp.where(corner, score_ini, 0.0)
    nms = fast_ops.nonmax_suppress_3x3(score)
    score = jnp.where(nms & corner, score, 0.0)

    # keep clear of borders so the 39x39 patch gather stays in-bounds
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (
        (yy >= EDGE_MARGIN) & (yy < h - EDGE_MARGIN)
        & (xx >= EDGE_MARGIN) & (xx < w - EDGE_MARGIN)
    )
    score = jnp.where(interior, score, 0.0)

    # cell-winner bonus for spatial uniformity (octree replacement)
    ph = (CELL - h % CELL) % CELL
    pw = (CELL - w % CELL) % CELL
    padded = jnp.pad(score, ((0, ph), (0, pw)))
    cells = padded.reshape((h + ph) // CELL, CELL, (w + pw) // CELL, CELL)
    cell_max = jnp.max(cells, axis=(1, 3))
    cell_max_up = jnp.repeat(jnp.repeat(cell_max, CELL, axis=0), CELL, axis=1)[:h, :w]
    is_winner = (score > 0) & (score >= cell_max_up)
    rank = score + jnp.where(is_winner, 1e4, 0.0)

    flat_rank = rank.reshape(-1)
    top_rank, top_idx = jax.lax.top_k(flat_rank, quota)
    ys = (top_idx // w).astype(jnp.int32)
    xs = (top_idx % w).astype(jnp.int32)
    valid = top_rank > 0.0
    response = jnp.take(score.reshape(-1), top_idx)

    # sub-pixel corner refinement: quadratic fit on the FAST score surface.
    # Integer corners carry +/-0.5 px quantization that is *correlated*
    # across the corners of one structure (shared sub-pixel phase), which
    # biases pose estimates; the parabola fit removes it.  (Improvement
    # over the reference, which keeps integer FAST corners.)
    def parab(sm, sc, sp):
        denom = sm + sp - 2.0 * sc
        d = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (sm - sp) / denom, 0.0)
        return jnp.clip(d, -0.5, 0.5)

    # NMS zeroes neighbours on the sparse score map; fit on the dense
    # pre-NMS corner score instead
    dense = jnp.where(corner, score_ini, 0.0)

    def sample_d(dy, dx):
        return dense[jnp.clip(ys + dy, 0, h - 1), jnp.clip(xs + dx, 0, w - 1)]

    sub_x = parab(sample_d(0, -1), sample_d(0, 0), sample_d(0, 1))
    sub_y = parab(sample_d(-1, 0), sample_d(0, 0), sample_d(1, 0))

    # --- gather 39x39 patches around each keypoint ------------------------
    def gather_patch(src, y, x):
        return jax.lax.dynamic_slice(
            src, (y - EDGE_MARGIN, x - EDGE_MARGIN), (PATCH, PATCH)
        )

    patches_raw = jax.vmap(lambda y, x: gather_patch(img, y, x))(ys, xs)
    patches_blur = jax.vmap(lambda y, x: gather_patch(img_blur, y, x))(ys, xs)

    # --- orientation: intensity centroid over circular radius-15 patch ----
    wx, wy = _circular_mask_weights()
    c0 = EDGE_MARGIN - HALF_PATCH
    inner = patches_raw[:, c0 : c0 + 31, c0 : c0 + 31]
    m10 = jnp.sum(inner * wx[None], axis=(1, 2))
    m01 = jnp.sum(inner * wy[None], axis=(1, 2))
    angle = jnp.degrees(jnp.arctan2(m01, m10))
    angle = jnp.where(angle < 0, angle + 360.0, angle)

    # --- rotated rBRIEF ----------------------------------------------------
    pat = jnp.asarray(BRIEF_PATTERN, dtype=jnp.float32)  # (256, 4)
    rad = jnp.radians(angle)
    ca, sa = jnp.cos(rad), jnp.sin(rad)  # (q,)
    # rotated integer sample offsets, per keypoint per pair (q, 256)
    x1 = jnp.round(pat[None, :, 0] * ca[:, None] - pat[None, :, 1] * sa[:, None])
    y1 = jnp.round(pat[None, :, 0] * sa[:, None] + pat[None, :, 1] * ca[:, None])
    x2 = jnp.round(pat[None, :, 2] * ca[:, None] - pat[None, :, 3] * sa[:, None])
    y2 = jnp.round(pat[None, :, 2] * sa[:, None] + pat[None, :, 3] * ca[:, None])
    flat = patches_blur.reshape(patches_blur.shape[0], PATCH * PATCH)
    idx1 = ((y1 + EDGE_MARGIN) * PATCH + (x1 + EDGE_MARGIN)).astype(jnp.int32)
    idx2 = ((y2 + EDGE_MARGIN) * PATCH + (x2 + EDGE_MARGIN)).astype(jnp.int32)
    t1 = jnp.take_along_axis(flat, idx1, axis=1)
    t2 = jnp.take_along_axis(flat, idx2, axis=1)
    bits = (t1 < t2).astype(jnp.uint8)  # (q, 256)
    desc = pack_bits(bits)

    xy = jnp.stack(
        [xs.astype(jnp.float32) + sub_x, ys.astype(jnp.float32) + sub_y], axis=-1
    )
    return xy, response, angle, desc, valid


def extract_orb(
    img: jax.Array,
    *,
    n_features: int = 1000,
    n_levels: int = 8,
    scale_factor: float = 1.2,
    ini_th: float = 20.0,
    min_th: float = 7.0,
    pad_to: int | None = None,
) -> OrbFeatures:
    """Full multi-scale ORB extraction on a grayscale (H, W) image.

    Returns a padded OrbFeatures bank with sum(level quotas) slots (or
    ``pad_to`` if given).  Coordinates are level-0 raw pixels.
    """
    img = img.astype(jnp.float32)
    quotas = level_quotas(n_features, n_levels, scale_factor)
    pyr = image_ops.build_pyramid(img, n_levels, scale_factor)
    scales = image_ops.scale_factors(n_levels, scale_factor)

    xs, rs, angs, descs, octs, vals = [], [], [], [], [], []
    for lv in range(n_levels):
        blur = image_ops.gaussian_blur(pyr[lv], 7, 2.0)
        xy, resp, ang, desc, valid = _extract_level(
            pyr[lv], blur, quotas[lv], ini_th, min_th
        )
        xs.append(xy * scales[lv])
        rs.append(resp)
        angs.append(ang)
        descs.append(desc)
        octs.append(jnp.full((quotas[lv],), lv, dtype=jnp.int32))
        vals.append(valid)

    feats = OrbFeatures(
        xy=jnp.concatenate(xs),
        response=jnp.concatenate(rs),
        octave=jnp.concatenate(octs),
        angle=jnp.concatenate(angs),
        desc=jnp.concatenate(descs),
        valid=jnp.concatenate(vals),
    )
    if pad_to is not None and pad_to > feats.n_slots:
        extra = pad_to - feats.n_slots
        feats = OrbFeatures(
            xy=jnp.pad(feats.xy, ((0, extra), (0, 0))),
            response=jnp.pad(feats.response, (0, extra)),
            octave=jnp.pad(feats.octave, (0, extra)),
            angle=jnp.pad(feats.angle, (0, extra)),
            desc=jnp.pad(feats.desc, ((0, extra), (0, 0))),
            valid=jnp.pad(feats.valid, (0, extra)),
        )
    return feats
