"""Batched masked nearest-neighbor matching with ORB-SLAM2's gate cascade.

Replaces the per-feature candidate loops of ORBmatcher (ORBmatcher.cc):
every search variant becomes "build a (N1, N2) masked Hamming distance
matrix, take best/second-best per row, apply threshold + ratio +
rotation-consistency gates as masks".  The geometric window (projection
radius, octave band, epipolar distance, ...) that the reference expresses as
grid-bucket iteration is expressed here as an ``extra_mask`` on the distance
matrix — the kernel shape stays static regardless of the window.

All functions are jit/vmap-safe with static shapes; invalid slots carry
``idx = -1`` and ``dist = BIG``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

BIG = 1 << 20  # sentinel distance, python int so it stays hashable/static


class MatchResult(NamedTuple):
    idx: jax.Array      # (N1,) int32 matched column per row, -1 if none
    dist: jax.Array     # (N1,) int32 best distance (BIG if none)
    mask: jax.Array     # (N1,) bool valid match


def masked_best2(dist: jax.Array, mask: jax.Array):
    """Per-row best and second-best over a masked (N1, N2) distance matrix.

    Returns (d1, i1, d2); masked-out entries treated as +BIG.
    Mirrors the bestDist/bestDist2/bestIdx bookkeeping in every
    ORBmatcher search loop (e.g. ORBmatcher.cc:82-106).
    """
    d = jnp.where(mask, dist, BIG)
    i1 = jnp.argmin(d, axis=1)
    d1 = jnp.take_along_axis(d, i1[:, None], axis=1)[:, 0]
    n2 = d.shape[1]
    d_no1 = jnp.where(
        jax.nn.one_hot(i1, n2, dtype=jnp.bool_), BIG, d
    )
    d2 = jnp.min(d_no1, axis=1)
    return d1, i1.astype(jnp.int32), d2


def nn_match(
    dist: jax.Array,
    *,
    row_valid: jax.Array,
    col_valid: jax.Array,
    extra_mask: Optional[jax.Array] = None,
    max_dist: int = 50,
    ratio: float = 1.0,
    mutual: bool = False,
) -> MatchResult:
    """Masked NN matching with threshold + Lowe ratio (+ optional mutual check).

    dist: (N1, N2) distances; row/col_valid: validity of each side's slots;
    extra_mask: (N1, N2) geometric gate (projection window, octave band,
    epipolar, ...).  ratio <= dist(best)/dist(second) test as in
    ORBmatcher (mfNNratio, ORBmatcher.cc:91-106): best < ratio * second.
    mutual=True additionally requires the row to be its column's argmin —
    the TPU-native replacement for the reference's "steal the match from a
    previously matched feature" duplicate resolution
    (e.g. SearchForInitialization, ORBmatcher.cc:448-459).
    """
    mask = row_valid[:, None] & col_valid[None, :]
    if extra_mask is not None:
        mask = mask & extra_mask
    d1, i1, d2 = masked_best2(dist, mask)
    ok = row_valid & (d1 <= max_dist)
    if ratio < 1.0:
        ok = ok & (d1.astype(jnp.float32) < ratio * d2.astype(jnp.float32))
    if mutual:
        d = jnp.where(mask, dist, BIG)
        col_best_row = jnp.argmin(d, axis=0).astype(jnp.int32)  # (N2,)
        ok = ok & (jnp.take(col_best_row, i1) == jnp.arange(i1.shape[0], dtype=jnp.int32))
    idx = jnp.where(ok, i1, -1)
    return MatchResult(idx=idx, dist=jnp.where(ok, d1, BIG), mask=ok)


def resolve_duplicates(res: MatchResult, n_cols: int) -> MatchResult:
    """Keep only the lowest-distance row per matched column.

    The reference resolves one-to-many matches by erasing the earlier match
    when a better one lands on the same target (ORBmatcher.cc:448-459, Fuse
    paths).  Array form: segment-min over columns.
    """
    idx_safe = jnp.where(res.mask, res.idx, n_cols)  # dump invalid in slot n
    best_per_col = jax.ops.segment_min(
        res.dist, idx_safe, num_segments=n_cols + 1
    )
    keep = res.mask & (res.dist <= jnp.take(best_per_col, idx_safe, fill_value=BIG))
    # Tie-break equal distances: keep lowest row index.
    row_ids = jnp.arange(res.idx.shape[0], dtype=jnp.int32)
    tie_row = jax.ops.segment_min(
        jnp.where(keep, row_ids, jnp.int32(1 << 30)), idx_safe, num_segments=n_cols + 1
    )
    keep = keep & (jnp.take(tie_row, idx_safe) == row_ids)
    return MatchResult(
        idx=jnp.where(keep, res.idx, -1),
        dist=jnp.where(keep, res.dist, BIG),
        mask=keep,
    )


def rotation_consistency_mask(
    angle_a: jax.Array,
    angle_b: jax.Array,
    res: MatchResult,
    histo_length: int = 30,
    top_k: int = 3,
) -> jax.Array:
    """Keep matches whose angle difference falls in the top-k histogram bins.

    Reproduces the rotHist + ComputeThreeMaxima filter
    (ORBmatcher.cc:107-127, 1506-1538) including its quirk: bins whose count
    is below 0.1x the max are dropped even when in the top 3.

    angle_a: (N1,) degrees of rows; angle_b: (N2,) degrees of columns.
    Returns a refined (N1,) bool mask.
    """
    b_ang = jnp.take(angle_b, jnp.clip(res.idx, 0, angle_b.shape[0] - 1))
    rot = angle_a - b_ang
    rot = jnp.where(rot < 0, rot + 360.0, rot)
    factor = histo_length / 360.0
    bin_idx = jnp.round(rot * factor).astype(jnp.int32)
    bin_idx = jnp.where(bin_idx == histo_length, 0, bin_idx)
    bin_idx = jnp.clip(bin_idx, 0, histo_length - 1)
    counts = jax.ops.segment_sum(
        res.mask.astype(jnp.int32), jnp.where(res.mask, bin_idx, histo_length),
        num_segments=histo_length + 1,
    )[:histo_length]
    top = jax.lax.top_k(counts, top_k)[0]
    max1 = top[0]
    # A bin survives if among top_k AND count > 0.1 * max1.
    kth = top[top_k - 1]
    bin_ok = (counts >= kth) & (counts.astype(jnp.float32) > 0.1 * max1.astype(jnp.float32)) & (counts > 0)
    return res.mask & jnp.take(bin_ok, bin_idx)


def window_mask(
    uv_query: jax.Array,
    uv_target: jax.Array,
    radius: jax.Array,
) -> jax.Array:
    """Geometric window gate: |u|,|v| within per-row radius.

    uv_query: (N1, 2) projected positions; uv_target: (N2, 2) keypoint
    positions; radius: scalar or (N1,).  Replaces GetFeaturesInArea grid
    queries (Frame.cc:341-397) with a dense mask.
    """
    r = jnp.broadcast_to(jnp.asarray(radius, dtype=jnp.float32), (uv_query.shape[0],))
    du = jnp.abs(uv_query[:, 0:1] - uv_target[None, :, 0])
    dv = jnp.abs(uv_query[:, 1:2] - uv_target[None, :, 1])
    return (du <= r[:, None]) & (dv <= r[:, None])


def octave_band_mask(
    level_query: jax.Array,
    level_target: jax.Array,
    min_offset: int,
    max_offset: int,
) -> jax.Array:
    """Octave gating: target level within [q+min_offset, q+max_offset].

    Covers the reference's per-variant scale gates, e.g. motion-model
    forward/backward octave checks (ORBmatcher.cc:1305-1311) and
    fuse/track windows (nPredictedLevel-1 <= l <= nPredictedLevel).
    """
    lq = level_query[:, None]
    lt = level_target[None, :]
    return (lt >= lq + min_offset) & (lt <= lq + max_offset)
