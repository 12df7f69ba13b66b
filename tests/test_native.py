"""Native octree distributor: build, correctness, spatial balance."""

import numpy as np
import pytest

from refactored_orb_slam2_tpu.ops import native


class TestOctree:
    def _corners(self, seed=0, n=2000):
        rng = np.random.default_rng(seed)
        xs = rng.uniform(0, 640, n).astype(np.float32)
        ys = rng.uniform(0, 480, n).astype(np.float32)
        rs = rng.uniform(0, 100, n).astype(np.float32)
        return xs, ys, rs

    def test_native_lib_builds(self):
        assert native.have_native(), "libslamnative.so missing and unbuildable"

    def test_count_near_quota(self):
        xs, ys, rs = self._corners()
        keep = native.distribute_octree(xs, ys, rs, (0, 640, 0, 480), 500)
        kept = keep.sum()
        assert 400 <= kept <= 700, kept

    def test_spatial_balance(self):
        """Kept corners must be spread: every quadrant of the image gets a
        proportional share even when candidates are 4x denser in one."""
        rng = np.random.default_rng(1)
        xs = np.concatenate([
            rng.uniform(0, 320, 4000), rng.uniform(320, 640, 1000)
        ]).astype(np.float32)
        ys = rng.uniform(0, 480, 5000).astype(np.float32)
        rs = rng.uniform(0, 100, 5000).astype(np.float32)
        keep = native.distribute_octree(xs, ys, rs, (0, 640, 0, 480), 400)
        left = keep[xs < 320].sum()
        right = keep[xs >= 320].sum()
        # without balancing left would get ~4x right; quad-tree keeps the
        # ratio near candidate-area parity
        assert right > 0.4 * left, (left, right)

    def test_keeps_best_response(self):
        # a single cluster: the highest response must be kept
        xs = np.full(10, 100.0, np.float32) + np.arange(10, dtype=np.float32)
        ys = np.full(10, 100.0, np.float32)
        rs = np.arange(10, dtype=np.float32)
        keep = native.distribute_octree(xs, ys, rs, (0, 640, 0, 480), 1)
        assert keep[9]

    def test_python_fallback_agrees_roughly(self):
        xs, ys, rs = self._corners(2, 500)
        k_native = native.distribute_octree(xs, ys, rs, (0, 640, 0, 480), 100)
        k_py = native._distribute_py(xs, ys, rs, (0, 640, 0, 480), 100)
        # same contract: ~quota kept, balanced
        assert abs(int(k_native.sum()) - int(k_py.sum())) < 60
