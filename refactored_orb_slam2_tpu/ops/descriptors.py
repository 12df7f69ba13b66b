"""Packed binary descriptors and Hamming distance on the MXU.

The reference computes Hamming distance one pair at a time with a popcount
bit-hack over 8 uint32 words (ORBmatcher::DescriptorDistance,
ORBmatcher.cc:1540-1556) inside nested candidate loops.  Here descriptors
are a dense bank and *all* pairwise distances come out of one kernel:

- ``hamming_matmul``: unpack 256 bits to ±1 bf16 planes; then
  ``H = (256 - A @ B^T) / 2``.  Products of ±1 accumulate exactly in f32,
  so this is bit-exact while running on the MXU systolic array at full
  throughput — the TPU-native way to do binary matching.
- ``hamming_popcount``: XOR + population-count reference path (used for
  validation and tiny problems).

Descriptor layout: ``(N, 8) uint32``, bit ``b`` of the 256-bit descriptor is
bit ``b % 32`` of word ``b // 32`` (LSB-first), matching a little-endian view
of the reference's 32-byte ``cv::Mat`` rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DESC_BITS = 256
DESC_WORDS = 8


def pack_bits(bits: jax.Array) -> jax.Array:
    """(..., 256) {0,1} -> (..., 8) uint32 packed descriptors."""
    b = bits.astype(jnp.uint32).reshape(bits.shape[:-1] + (DESC_WORDS, 32))
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def unpack_bits(packed: jax.Array) -> jax.Array:
    """(..., 8) uint32 -> (..., 256) {0,1} uint8."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(packed.shape[:-1] + (DESC_BITS,)).astype(jnp.uint8)


def unpack_pm1(packed: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(..., 8) uint32 -> (..., 256) ±1 planes for matmul Hamming."""
    bits = unpack_bits(packed)
    return (bits.astype(dtype) * 2 - 1).astype(dtype)


def hamming_matmul(a_pm1: jax.Array, b_pm1: jax.Array) -> jax.Array:
    """Pairwise Hamming distances from ±1 planes.

    a_pm1: (N1, 256), b_pm1: (N2, 256) -> (N1, N2) int32 in [0, 256].
    dot(a, b) = 256 - 2*hamming, exact in f32 accumulation.
    """
    # precision DEFAULT: ±1 products and 256-wide sums are integer-exact in
    # bf16, so this stays bit-exact at full MXU rate even when the session
    # pins jax_default_matmul_precision=highest for geometry
    dots = jax.lax.dot_general(
        a_pm1,
        b_pm1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return ((DESC_BITS - dots) * 0.5).astype(jnp.int32)


def hamming(a_packed: jax.Array, b_packed: jax.Array) -> jax.Array:
    """Pairwise Hamming from packed banks (unpacks then matmuls)."""
    return hamming_matmul(unpack_pm1(a_packed), unpack_pm1(b_packed))


def hamming_popcount(a_packed: jax.Array, b_packed: jax.Array) -> jax.Array:
    """Reference XOR+popcount path: (N1,8),(N2,8) -> (N1,N2) int32.

    Materializes (N1,N2,8); use only for validation / small N.
    """
    x = jnp.bitwise_xor(a_packed[:, None, :], b_packed[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_rowwise(a_packed: jax.Array, b_packed: jax.Array) -> jax.Array:
    """Elementwise row-to-row Hamming: (N,8),(N,8) -> (N,) int32."""
    x = jnp.bitwise_xor(a_packed, b_packed)
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def mean_descriptor(packed: jax.Array, valid: jax.Array) -> jax.Array:
    """Bitwise-majority mean of a set of descriptors (FORB::meanValue,
    DBoW2/FORB.cpp:24-56) — used when training/updating vocabulary cells.

    packed: (N, 8) uint32; valid: (N,) bool -> (8,) uint32.
    """
    bits = unpack_bits(packed).astype(jnp.int32)
    n = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    counts = jnp.sum(bits * valid[:, None].astype(jnp.int32), axis=0)
    maj = (2 * counts >= n).astype(jnp.uint8)
    return pack_bits(maj)
