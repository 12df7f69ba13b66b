"""Vectorized FAST-9-16 corner detection.

Replaces the reference's per-cell ``cv::FAST`` calls
(ComputeKeyPointsOctTree, ORBextractor.cc:733-815) with a whole-image
stencil: the 16-point Bresenham ring is evaluated for every pixel at once on
the VPU, segment contiguity is resolved with log-step rotated ANDs, the
corner score is the OpenCV "max threshold that keeps it a corner"
(min-over-arc, max-over-arcs), and 3x3 non-max suppression plus the
two-threshold (20 -> 7) per-cell fallback are dense masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3, clockwise from 12 o'clock — the ring used by
# FAST-9-16 ((dy, dx) pairs).
RING_OFFSETS = np.asarray(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

ARC_LEN = 9  # FAST-9


def _ring_stack(img: jax.Array) -> jax.Array:
    """(H, W) -> (16, H, W) ring samples via static rolls.

    Border rows/cols wrap around; callers mask a 3-px border (the extractor
    masks a 16-px border anyway).
    """
    return jnp.stack(
        [jnp.roll(img, (-int(dy), -int(dx)), axis=(0, 1)) for dy, dx in RING_OFFSETS]
    )


def _run9_any(mask: jax.Array) -> jax.Array:
    """(16, H, W) bool -> (H, W) bool: any 9 contiguous true on circular axis.

    acc = AND of mask rotated by 0..8; any(acc) over the ring axis.
    Log-step composition: 9 = 4+4+1 rotations.
    """
    m = mask
    a2 = m & jnp.roll(m, -1, axis=0)        # runs >= 2
    a4 = a2 & jnp.roll(a2, -2, axis=0)      # runs >= 4
    a8 = a4 & jnp.roll(a4, -4, axis=0)      # runs >= 8
    a9 = a8 & jnp.roll(m, -8, axis=0)       # runs >= 9
    return jnp.any(a9, axis=0)


def _run9_minmax(vals: jax.Array) -> jax.Array:
    """(16, H, W) -> (H, W): max over the 16 arcs of min over each 9-arc.

    This is the FAST corner score: the largest threshold t for which some
    9-arc stays uniformly above t.
    """
    m = vals
    a2 = jnp.minimum(m, jnp.roll(m, -1, axis=0))
    a4 = jnp.minimum(a2, jnp.roll(a2, -2, axis=0))
    a8 = jnp.minimum(a4, jnp.roll(a4, -4, axis=0))
    a9 = jnp.minimum(a8, jnp.roll(m, -8, axis=0))
    return jnp.max(a9, axis=0)


def fast_score(img: jax.Array) -> jax.Array:
    """Dense FAST-9-16 max-threshold corner score over the full image.

    score(p) = max over the 16 arcs of min-over-arc contrast; a pixel is a
    FAST corner at threshold t iff score > t, so ONE ring pass serves every
    threshold (the reference's two-threshold 20->7 fallback needs two
    cv::FAST calls, ORBextractor.cc:774-780).
    """
    ring = _ring_stack(img)
    c = img[None]
    score_b = _run9_minmax(ring - c)        # supremum t for bright arcs
    score_d = _run9_minmax(c - ring)        # supremum t for dark arcs
    score = jnp.maximum(score_b, score_d)
    h, w = img.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return jnp.where(interior, score, 0.0)


def fast_score_and_corners(img: jax.Array, threshold: float):
    """FAST-9-16 over the full image.

    Returns (score, corner_mask) both (H, W); score is the max-threshold
    corner score (0 where not a corner at ``threshold``).
    """
    score = fast_score(img)
    is_corner = score > threshold
    return jnp.where(is_corner, score, 0.0), is_corner


def nonmax_suppress_3x3(score: jax.Array) -> jax.Array:
    """Keep pixels that are the strict-by-tiebreak max of their 3x3 hood."""
    neigh = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return score >= neigh


def cell_fallback_mask(
    corner_ini: jax.Array, corner_min: jax.Array, cell: int = 30
) -> jax.Array:
    """Two-threshold fallback: per 30x30 cell, use iniThFAST corners when the
    cell has any, else minThFAST corners (ORBextractor.cc:774-780).

    Returns the combined corner mask.
    """
    h, w = corner_ini.shape
    ph = (cell - h % cell) % cell
    pw = (cell - w % cell) % cell
    padded = jnp.pad(corner_ini, ((0, ph), (0, pw)))
    cells = padded.reshape((h + ph) // cell, cell, (w + pw) // cell, cell)
    cell_has_ini = jnp.any(cells, axis=(1, 3))
    up = jnp.repeat(jnp.repeat(cell_has_ini, cell, axis=0), cell, axis=1)[:h, :w]
    return jnp.where(up, corner_ini, corner_min)
