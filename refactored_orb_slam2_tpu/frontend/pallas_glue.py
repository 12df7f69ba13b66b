"""Glue between the tracking matchers and the fused Pallas window matcher:
shape padding to the kernel's 128-row/column tiles and descriptor unpacking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.descriptors import unpack_pm1
from ..ops.pallas_hamming import TILE_N1, TILE_N2, window_match_pallas


def _pad_rows(x: jax.Array, n: int, fill=0):
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


def window_best2_padded(
    desc_q: jax.Array,   # (N1, 8) packed query descriptors
    desc_t: jax.Array,   # (N2, 8) packed target descriptors
    uv_q: jax.Array, uv_t: jax.Array,
    radius: jax.Array, oct_q: jax.Array, oct_t: jax.Array,
    valid_q: jax.Array, valid_t: jax.Array,
    oct_band: tuple[int, int],
):
    """Run the fused kernel with row/col counts padded to tile multiples.

    Returns (d1, i1, d2) trimmed back to the original N1; unmatched or
    padded rows carry BIG distances and index 0.
    """
    n1 = desc_q.shape[0]
    n2 = desc_t.shape[0]
    n1p = -(-n1 // TILE_N1) * TILE_N1
    n2p = -(-n2 // TILE_N2) * TILE_N2

    a_pm1 = unpack_pm1(_pad_rows(desc_q, n1p), dtype=jnp.bfloat16)
    b_pm1 = unpack_pm1(_pad_rows(desc_t, n2p), dtype=jnp.bfloat16)
    d1, i1, d2 = window_match_pallas(
        a_pm1, b_pm1,
        _pad_rows(uv_q, n1p), _pad_rows(uv_t, n2p),
        _pad_rows(radius, n1p), _pad_rows(oct_q, n1p), _pad_rows(oct_t, n2p),
        _pad_rows(valid_q, n1p, fill=False), _pad_rows(valid_t, n2p, fill=False),
        oct_band,
    )
    return d1[:n1], i1[:n1], d2[:n1]
