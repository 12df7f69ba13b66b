"""Tests for packed descriptors, Hamming kernels, and NN matching gates."""

import numpy as np
import jax.numpy as jnp

from refactored_orb_slam2_tpu.ops import descriptors as D
from refactored_orb_slam2_tpu.ops import matching as M


def rand_desc(n, rng):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


class TestDescriptors:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(0)
        packed = rand_desc(16, rng)
        bits = D.unpack_bits(jnp.asarray(packed))
        repacked = np.asarray(D.pack_bits(bits))
        np.testing.assert_array_equal(repacked, packed)

    def test_hamming_matmul_exact(self):
        rng = np.random.default_rng(1)
        a = rand_desc(100, rng)
        b = rand_desc(130, rng)
        # numpy oracle
        ax = np.unpackbits(a.view(np.uint8), axis=1)
        bx = np.unpackbits(b.view(np.uint8), axis=1)
        oracle = (ax[:, None, :] != bx[None, :, :]).sum(-1)
        ours = np.asarray(D.hamming(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(ours, oracle)

    def test_popcount_matches_matmul(self):
        rng = np.random.default_rng(2)
        a = rand_desc(64, rng)
        b = rand_desc(64, rng)
        h1 = np.asarray(D.hamming(jnp.asarray(a), jnp.asarray(b)))
        h2 = np.asarray(D.hamming_popcount(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(h1, h2)

    def test_rowwise(self):
        rng = np.random.default_rng(3)
        a = rand_desc(32, rng)
        h = np.asarray(D.hamming_rowwise(jnp.asarray(a), jnp.asarray(a)))
        np.testing.assert_array_equal(h, 0)

    def test_mean_descriptor_majority(self):
        # 3 descriptors: two all-ones, one all-zeros -> majority all-ones
        ones = np.full((1, 8), 0xFFFFFFFF, dtype=np.uint32)
        zeros = np.zeros((1, 8), dtype=np.uint32)
        packed = np.concatenate([ones, ones, zeros], axis=0)
        out = np.asarray(D.mean_descriptor(jnp.asarray(packed), jnp.ones(3, bool)))
        np.testing.assert_array_equal(out, ones[0])
        # invalid rows excluded
        out2 = np.asarray(
            D.mean_descriptor(jnp.asarray(packed), jnp.asarray([False, False, True]))
        )
        np.testing.assert_array_equal(out2, zeros[0])


class TestMatching:
    def test_nn_basic_and_ratio(self):
        # dist matrix designed: row0 best=col1 (d=5, second=40) passes ratio
        # row1 best=col0 (d=30, second=31) fails 0.9 ratio
        dist = jnp.asarray([[40, 5, 200], [30, 31, 200]], dtype=jnp.int32)
        res = M.nn_match(
            dist,
            row_valid=jnp.ones(2, bool),
            col_valid=jnp.ones(3, bool),
            max_dist=50,
            ratio=0.9,
        )
        assert res.idx.tolist() == [1, -1]

    def test_nn_threshold(self):
        dist = jnp.asarray([[60]], dtype=jnp.int32)
        res = M.nn_match(
            dist, row_valid=jnp.ones(1, bool), col_valid=jnp.ones(1, bool), max_dist=50
        )
        assert res.idx.tolist() == [-1]

    def test_nn_invalid_cols(self):
        dist = jnp.asarray([[5, 2]], dtype=jnp.int32)
        res = M.nn_match(
            dist,
            row_valid=jnp.ones(1, bool),
            col_valid=jnp.asarray([True, False]),
            max_dist=50,
        )
        assert res.idx.tolist() == [0]

    def test_mutual(self):
        # col0's best row is row1, so row0->col0 killed under mutual
        dist = jnp.asarray([[10, 200], [5, 200]], dtype=jnp.int32)
        res = M.nn_match(
            dist, row_valid=jnp.ones(2, bool), col_valid=jnp.ones(2, bool),
            max_dist=50, mutual=True,
        )
        assert res.idx.tolist() == [-1, 0]

    def test_resolve_duplicates(self):
        dist = jnp.asarray([[10, 200], [5, 200]], dtype=jnp.int32)
        res = M.nn_match(
            dist, row_valid=jnp.ones(2, bool), col_valid=jnp.ones(2, bool), max_dist=50
        )
        assert res.idx.tolist() == [0, 0]  # both rows matched col0
        res2 = M.resolve_duplicates(res, n_cols=2)
        assert res2.idx.tolist() == [-1, 0]  # row1 wins (d=5)

    def test_window_mask(self):
        q = jnp.asarray([[100.0, 100.0]])
        t = jnp.asarray([[103.0, 99.0], [100.0, 110.0]])
        m = np.asarray(M.window_mask(q, t, 5.0))
        np.testing.assert_array_equal(m, [[True, False]])

    def test_octave_band(self):
        lq = jnp.asarray([2])
        lt = jnp.asarray([1, 2, 3, 5])
        m = np.asarray(M.octave_band_mask(lq, lt, 0, 1))
        np.testing.assert_array_equal(m, [[False, True, True, False]])

    def test_rotation_consistency(self):
        n = 120
        rng = np.random.default_rng(4)
        # 100 matches at rotation ~12 deg, 20 outliers uniform
        ang_a = rng.uniform(0, 360, n).astype(np.float32)
        ang_b = ang_a - 12.0
        ang_b[:20] = rng.uniform(0, 360, 20)
        idx = np.arange(n, dtype=np.int32)
        res = M.MatchResult(
            idx=jnp.asarray(idx), dist=jnp.zeros(n, jnp.int32), mask=jnp.ones(n, bool)
        )
        keep = np.asarray(
            M.rotation_consistency_mask(jnp.asarray(ang_a), jnp.asarray(ang_b), res)
        )
        # all inliers kept
        assert keep[20:].all()
        # most scattered outliers dropped
        assert keep[:20].sum() < 10
