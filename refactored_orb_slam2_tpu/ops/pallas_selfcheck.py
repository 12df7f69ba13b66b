"""On-chip Pallas-vs-XLA agreement checks, runnable as a module.

CI pins tests to the CPU platform (tests/conftest.py), where the Pallas
kernels fall back to the XLA path — so a kernel regression could ship
through a green suite.  This module is the chip-side check: it asserts the
fused streaming matcher agrees with the XLA reference on d1 (best
distance), i1 (winner where unique), d2 (second best), and the ratio gate.
Consumers:

- ``bench.py`` runs :func:`run_selfcheck` before timing anything;
- ``tests/test_pallas.py`` spawns ``python -m
  refactored_orb_slam2_tpu.ops.pallas_selfcheck`` WITHOUT the CPU pin so
  `pytest tests/test_pallas.py` exercises the real kernel on the bench
  chip (skipping only when no TPU is reachable).
"""

from __future__ import annotations

import sys

import numpy as np


def run_selfcheck() -> str:
    """Assert Pallas/XLA agreement on a randomized padded batch.

    Returns "ok" or raises AssertionError; raises RuntimeError("no-tpu")
    when no TPU platform is available.
    """
    import jax
    import jax.numpy as jnp

    from .pallas_hamming import on_tpu
    if not on_tpu():
        raise RuntimeError("no-tpu")
    from ..frontend.pallas_glue import window_best2_padded
    from .descriptors import hamming
    from . import matching as M

    rng = np.random.default_rng(1)
    nq, nt = 512, 1024
    q = rng.integers(0, 2**32, (nq, 8), dtype=np.uint32)
    t = rng.integers(0, 2**32, (nt, 8), dtype=np.uint32)
    uv_q = rng.uniform(0, 640, (nq, 2)).astype(np.float32)
    uv_t = rng.uniform(0, 640, (nt, 2)).astype(np.float32)
    radius = np.full(nq, 60.0, np.float32)
    lvl_q = rng.integers(0, 8, nq).astype(np.int32)
    lvl_t = rng.integers(0, 8, nt).astype(np.int32)
    rv = np.ones(nq, bool)
    cv = np.ones(nt, bool)

    d1, i1, d2 = window_best2_padded(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(uv_q), jnp.asarray(uv_t),
        jnp.asarray(radius), jnp.asarray(lvl_q), jnp.asarray(lvl_t),
        jnp.asarray(rv), jnp.asarray(cv), (-1, 0),
    )
    dist = hamming(jnp.asarray(q), jnp.asarray(t))
    geo = M.window_mask(jnp.asarray(uv_q), jnp.asarray(uv_t),
                        jnp.asarray(radius))
    geo = geo & M.octave_band_mask(jnp.asarray(lvl_q), jnp.asarray(lvl_t),
                                   -1, 0)
    mask = geo & rv[:, None] & cv[None, :]
    d1_ref, i1_ref, d2_ref = M.masked_best2(jnp.asarray(dist), mask)
    d1, i1, d2 = np.asarray(d1), np.asarray(i1), np.asarray(d2)
    d1_ref = np.asarray(d1_ref)
    i1_ref = np.asarray(i1_ref)
    d2_ref = np.asarray(d2_ref)
    ok = d1 <= 256
    assert np.array_equal(d1[ok], d1_ref[ok]), \
        "pallas kernel d1 disagrees with the XLA matcher"
    ok2 = ok & (d2 <= 256)
    assert np.array_equal(d2[ok2], d2_ref[ok2]), \
        "pallas kernel d2 disagrees with the XLA matcher"
    uniq = ok & (d1 < d2)   # unique winner -> argmin well-defined
    assert np.array_equal(i1[uniq], i1_ref[uniq]), \
        "pallas kernel i1 disagrees with the XLA matcher"
    # the ratio gate must pick the same rows on both paths
    for ratio in (0.7, 0.9):
        g_p = ok & (d1.astype(np.float32) < ratio * d2.astype(np.float32))
        g_x = (d1_ref <= 256) & (
            d1_ref.astype(np.float32) < ratio * d2_ref.astype(np.float32)
        )
        assert np.array_equal(g_p, g_x), f"ratio gate mismatch at {ratio}"
    return "ok"


def run_golden() -> str:
    """Golden window-match case on the raw kernel (mirrors the CPU-skipped
    tests/test_pallas.py::test_window_match_matches_xla)."""
    import jax.numpy as jnp

    from .pallas_hamming import on_tpu, window_match_pallas
    if not on_tpu():
        raise RuntimeError("no-tpu")
    from .descriptors import unpack_pm1, hamming
    from . import matching as M

    rng = np.random.default_rng(0)
    N1, N2 = 256, 384
    a = rng.integers(0, 2**32, (N1, 8), dtype=np.uint32)
    b = rng.integers(0, 2**32, (N2, 8), dtype=np.uint32)
    uvq = rng.uniform(0, 640, (N1, 2)).astype(np.float32)
    uvt = rng.uniform(0, 640, (N2, 2)).astype(np.float32)
    rad = rng.uniform(30, 120, N1).astype(np.float32)
    oq = rng.integers(0, 8, N1).astype(np.int32)
    ot = rng.integers(0, 8, N2).astype(np.int32)
    vq = rng.random(N1) < 0.9
    vt = rng.random(N2) < 0.9
    d1, i1, d2 = window_match_pallas(
        unpack_pm1(jnp.asarray(a), dtype=jnp.bfloat16),
        unpack_pm1(jnp.asarray(b), dtype=jnp.bfloat16),
        jnp.asarray(uvq), jnp.asarray(uvt), jnp.asarray(rad),
        jnp.asarray(oq), jnp.asarray(ot), jnp.asarray(vq), jnp.asarray(vt),
        (-1, 1),
    )
    D = hamming(jnp.asarray(a), jnp.asarray(b))
    geo = M.window_mask(jnp.asarray(uvq), jnp.asarray(uvt), jnp.asarray(rad))
    geo = geo & M.octave_band_mask(jnp.asarray(oq), jnp.asarray(ot), -1, 1)
    mask = geo & jnp.asarray(vq)[:, None] & jnp.asarray(vt)[None, :]
    rd1, ri1, rd2 = M.masked_best2(D, mask)
    big = 1 << 19
    assert bool(jnp.all(jnp.where(rd1 < big, d1 == rd1, d1 >= big)))
    tie = jnp.take_along_axis(D, i1[:, None], axis=1)[:, 0] == rd1
    assert bool(jnp.all(jnp.where(rd1 < big, (i1 == ri1) | tie, True)))
    assert bool(jnp.all(jnp.where(rd2 < big, d2 == rd2, d2 >= big)))
    return "ok"


def main() -> int:
    try:
        run_selfcheck()
        run_golden()
    except RuntimeError as e:
        if str(e) == "no-tpu":
            print("PALLAS_SELFCHECK: no-tpu")
            return 2
        raise
    print("PALLAS_SELFCHECK: ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())
