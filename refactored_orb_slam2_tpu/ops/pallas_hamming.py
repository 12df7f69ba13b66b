"""Pallas TPU kernel: fused Hamming distance + masked top-2 argmin.

The matching hot path is "compute an (N1, N2) Hamming distance matrix, then
per-row best / second-best under a geometric mask" (ops/matching.py).  The
XLA path materializes the distance matrix in HBM and re-reads it for the
reductions.  This kernel streams: each grid step owns a 128-row tile of
descriptors, loops over column tiles, computes the tile's distances as a
±1-plane matmul on the MXU, applies the mask, and folds a running
(best, second, argmin) in VMEM — the distance matrix never touches HBM.

Inputs are ±1 bf16 descriptor planes (see ops/descriptors.unpack_pm1).
Falls back to the XLA path off-TPU (ops/matching.masked_best2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = float(1 << 20)
TILE_N1 = 128
TILE_N2 = 128
DESC_BITS = 256


def _kernel(a_ref, b_ref, mask_ref, d1_ref, i1_ref, d2_ref):
    """Grid: (N1 // TILE_N1,).  a_ref: (TILE_N1, 256) row tile;
    b_ref: (N2, 256) full bank; mask_ref: (TILE_N1, N2) row-tile mask."""
    n2 = b_ref.shape[0]
    n2_tiles = n2 // TILE_N2
    a = a_ref[:]                                   # (T1, 256) bf16

    def body(j, carry):
        d1, i1, d2 = carry
        b = b_ref[pl.ds(j * TILE_N2, TILE_N2), :]  # (T2, 256)
        # precision pinned to DEFAULT: the operands are exact ±1-plane
        # bf16 values (products and 256-wide sums are integer-exact), and
        # Mosaic rejects an fp32-contract request on bf16 vectors when the
        # session sets jax_default_matmul_precision=highest for geometry
        dots = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )                                          # (T1, T2)
        dist = (DESC_BITS - dots) * 0.5
        m = mask_ref[:, pl.ds(j * TILE_N2, TILE_N2)]
        dist = jnp.where(m, dist, BIG)

        tmin = jnp.min(dist, axis=1)               # (T1,)
        targ = jnp.argmin(dist, axis=1).astype(jnp.int32) + j * TILE_N2
        # second-best inside the tile: mask out the argmin column
        col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) + j * TILE_N2
        dist2 = jnp.where(col == targ[:, None], BIG, dist)
        tmin2 = jnp.min(dist2, axis=1)

        # merge running (d1, i1, d2) with tile (tmin, targ, tmin2)
        new_d1 = jnp.minimum(d1, tmin)
        new_i1 = jnp.where(tmin < d1, targ, i1)
        new_d2 = jnp.minimum(jnp.maximum(d1, tmin), jnp.minimum(d2, tmin2))
        return new_d1, new_i1, new_d2

    init = (
        jnp.full((TILE_N1,), BIG, jnp.float32),
        jnp.zeros((TILE_N1,), jnp.int32),
        jnp.full((TILE_N1,), BIG, jnp.float32),
    )
    d1, i1, d2 = jax.lax.fori_loop(0, n2_tiles, body, init)
    # (8, T1) output blocks: sublane dim must be a multiple of 8, so the
    # row vector is broadcast and the caller reads row 0
    d1_ref[:, :] = jnp.broadcast_to(d1[None, :], (8, TILE_N1))
    i1_ref[:, :] = jnp.broadcast_to(i1[None, :], (8, TILE_N1))
    d2_ref[:, :] = jnp.broadcast_to(d2[None, :], (8, TILE_N1))


@functools.partial(jax.jit, static_argnames=())
def hamming_best2_pallas(a_pm1: jax.Array, b_pm1: jax.Array, mask: jax.Array):
    """Per-row (best_dist, best_idx, second_dist) of the masked Hamming
    distances between descriptor banks.

    a_pm1: (N1, 256) bf16 ±1; b_pm1: (N2, 256); mask: (N1, N2) bool.
    N1, N2 must be multiples of 128 (pad with invalid rows/cols).
    """
    n1 = a_pm1.shape[0]
    n2 = b_pm1.shape[0]
    assert n1 % TILE_N1 == 0 and n2 % TILE_N2 == 0, (n1, n2)
    grid = (n1 // TILE_N1,)
    d1, i1, d2 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N1, DESC_BITS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, DESC_BITS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N1, n2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, TILE_N1), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_N1), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_N1), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n1), jnp.float32),
            jax.ShapeDtypeStruct((8, n1), jnp.int32),
            jax.ShapeDtypeStruct((8, n1), jnp.float32),
        ],
    )(a_pm1.astype(jnp.bfloat16), b_pm1.astype(jnp.bfloat16), mask)
    return (
        d1[0].astype(jnp.int32),
        i1[0],
        d2[0].astype(jnp.int32),
    )


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _match_kernel(
    a_ref, b_ref, uvq_ref, uvt_ref, rad_ref, octq_ref, octt_ref,
    vq_ref, vt_ref, band_ref, d1_ref, i1_ref, d2_ref,
):
    """Fused window matcher: Hamming distances + in-kernel geometric mask +
    running top-2.  The (N1, N2) mask/distance matrices never exist."""
    n2 = b_ref.shape[0]
    n2_tiles = n2 // TILE_N2
    a = a_ref[:]                                    # (T1, 256)
    uq = uvq_ref[:]                                 # (2, T1)
    rad = rad_ref[0, :]                             # (T1,)
    oq = octq_ref[0, :]                             # (T1,)
    vq_f = vq_ref[0, :]                             # (T1,) f32 {0,1}
    lo = band_ref[0, 0]
    hi = band_ref[0, 1]

    def body(j, carry):
        d1, i1, d2 = carry
        b = b_ref[pl.ds(j * TILE_N2, TILE_N2), :]
        # precision pinned to DEFAULT: the operands are exact ±1-plane
        # bf16 values (products and 256-wide sums are integer-exact), and
        # Mosaic rejects an fp32-contract request on bf16 vectors when the
        # session sets jax_default_matmul_precision=highest for geometry
        dots = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        dist = (DESC_BITS - dots) * 0.5
        ut = uvt_ref[:, pl.ds(j * TILE_N2, TILE_N2)]        # (2, T2)
        ot = octt_ref[0, pl.ds(j * TILE_N2, TILE_N2)]       # (T2,)
        vt_f = vt_ref[0, pl.ds(j * TILE_N2, TILE_N2)]
        du = jnp.abs(uq[0][:, None] - ut[0][None, :])
        dv = jnp.abs(uq[1][:, None] - ut[1][None, :])
        doct = ot[None, :] - oq[:, None]
        # broadcast f32 operands first (Mosaic only reshapes 32-bit types),
        # then compare to form the 2D mask
        m = (
            (du <= rad[:, None]) & (dv <= rad[:, None])
            & (doct >= lo) & (doct <= hi)
            & (vq_f[:, None] > 0) & (vt_f[None, :] > 0)
        )
        dist = jnp.where(m, dist, BIG)

        tmin = jnp.min(dist, axis=1)
        targ = jnp.argmin(dist, axis=1).astype(jnp.int32) + j * TILE_N2
        col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) + j * TILE_N2
        dist2 = jnp.where(col == targ[:, None], BIG, dist)
        tmin2 = jnp.min(dist2, axis=1)

        new_d1 = jnp.minimum(d1, tmin)
        new_i1 = jnp.where(tmin < d1, targ, i1)
        new_d2 = jnp.minimum(jnp.maximum(d1, tmin), jnp.minimum(d2, tmin2))
        return new_d1, new_i1, new_d2

    init = (
        jnp.full((TILE_N1,), BIG, jnp.float32),
        jnp.zeros((TILE_N1,), jnp.int32),
        jnp.full((TILE_N1,), BIG, jnp.float32),
    )
    d1, i1, d2 = jax.lax.fori_loop(0, n2_tiles, body, init)
    d1_ref[:, :] = jnp.broadcast_to(d1[None, :], (8, TILE_N1))
    i1_ref[:, :] = jnp.broadcast_to(i1[None, :], (8, TILE_N1))
    d2_ref[:, :] = jnp.broadcast_to(d2[None, :], (8, TILE_N1))


def window_match_pallas(
    a_pm1: jax.Array,      # (N1, 256) query descriptor planes
    b_pm1: jax.Array,      # (N2, 256) target bank
    uv_q: jax.Array,       # (N1, 2) projected query positions
    uv_t: jax.Array,       # (N2, 2) target keypoint positions
    radius: jax.Array,     # (N1,) per-query window radius
    oct_q: jax.Array,      # (N1,) int octaves
    oct_t: jax.Array,      # (N2,)
    valid_q: jax.Array,    # (N1,) bool
    valid_t: jax.Array,    # (N2,) bool
    oct_band: tuple[int, int],
):
    """Fused masked NN matcher on TPU: returns (d1, i1, d2) per query row.

    Implements the window/octave-band gates of ops.matching in-kernel so no
    (N1, N2) intermediate is ever materialized.
    """
    n1 = a_pm1.shape[0]
    n2 = b_pm1.shape[0]
    assert n1 % TILE_N1 == 0 and n2 % TILE_N2 == 0, (n1, n2)
    grid = (n1 // TILE_N1,)
    band = jnp.asarray(
        [[float(oct_band[0]), float(oct_band[1])]], dtype=jnp.float32
    )
    d1, i1, d2 = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N1, DESC_BITS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, DESC_BITS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, TILE_N1), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N1), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N1), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N1), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, TILE_N1), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_N1), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_N1), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n1), jnp.float32),
            jax.ShapeDtypeStruct((8, n1), jnp.int32),
            jax.ShapeDtypeStruct((8, n1), jnp.float32),
        ],
    )(
        a_pm1.astype(jnp.bfloat16),
        b_pm1.astype(jnp.bfloat16),
        uv_q.T.astype(jnp.float32),
        uv_t.T.astype(jnp.float32),
        radius.astype(jnp.float32)[None, :],
        oct_q.astype(jnp.float32)[None, :],
        oct_t.astype(jnp.float32)[None, :],
        valid_q.astype(jnp.float32)[None, :],
        valid_t.astype(jnp.float32)[None, :],
        band,
    )
    return d1[0].astype(jnp.int32), i1[0], d2[0].astype(jnp.int32)
