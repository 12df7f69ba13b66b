"""Tests for the ORB extraction kernel: FAST vs OpenCV, descriptor
repeatability under shift and rotation, orientation correctness."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from refactored_orb_slam2_tpu.ops import fast as fast_ops
from refactored_orb_slam2_tpu.ops import image as image_ops
from refactored_orb_slam2_tpu.ops.orb import extract_orb
from refactored_orb_slam2_tpu.ops.descriptors import hamming


def synthetic_corners_image(seed=0, h=240, w=320, n=120, noise=2.0):
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 30.0, np.float32)
    for _ in range(n):
        y, x = rng.integers(25, h - 25), rng.integers(25, w - 25)
        s = int(rng.integers(4, 10))
        img[y : y + s, x : x + s] = rng.uniform(100, 250)
    img += rng.normal(0, noise, img.shape).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.float32)


class TestFAST:
    def test_corners_close_to_opencv(self):
        img = synthetic_corners_image()
        score, corners = fast_ops.fast_score_and_corners(jnp.asarray(img), 20.0)
        nms = fast_ops.nonmax_suppress_3x3(jnp.where(corners, score, 0.0))
        ours = np.argwhere(np.asarray(corners & nms & (score > 0)))
        det = cv2.FastFeatureDetector_create(20, nonmaxSuppression=True)
        kps = det.detect(img.astype(np.uint8))
        ref = np.asarray([[kp.pt[1], kp.pt[0]] for kp in kps])
        assert len(ref) > 50
        # every OpenCV corner should have one of ours within 2 px
        d = np.abs(ref[:, None, :] - ours[None, :, :]).max(-1).min(1)
        frac = (d <= 2).mean()
        assert frac > 0.9, f"only {frac:.2f} of OpenCV corners reproduced"

    def test_no_corners_on_flat(self):
        img = jnp.full((64, 64), 100.0)
        _, corners = fast_ops.fast_score_and_corners(img, 20.0)
        assert not bool(jnp.any(corners))

    def test_cell_fallback(self):
        # weak corner only detectable at low threshold
        img = np.full((64, 64), 100.0, np.float32)
        img[30:40, 30:40] = 112.0  # contrast 12: > 7, < 20
        _, c_ini = fast_ops.fast_score_and_corners(jnp.asarray(img), 20.0)
        _, c_min = fast_ops.fast_score_and_corners(jnp.asarray(img), 7.0)
        assert not bool(jnp.any(c_ini))
        assert bool(jnp.any(c_min))
        combined = fast_ops.cell_fallback_mask(c_ini, c_min)
        assert bool(jnp.any(combined))


class TestPyramid:
    def test_shapes(self):
        shapes = image_ops.pyramid_shapes(480, 640, 8, 1.2)
        assert shapes[0] == (480, 640)
        assert shapes[1] == (400, 533)
        assert len(shapes) == 8

    def test_blur_matches_opencv(self):
        img = synthetic_corners_image(seed=1)
        ours = np.asarray(image_ops.gaussian_blur(jnp.asarray(img), 7, 2.0))
        ref = cv2.GaussianBlur(img, (7, 7), 2.0, borderType=cv2.BORDER_REFLECT_101)
        np.testing.assert_allclose(ours, ref, atol=0.05)


class TestORB:
    @pytest.fixture(scope="class")
    def extractor(self):
        return jax.jit(
            lambda im: extract_orb(im, n_features=300, n_levels=4)
        )

    def test_basic_extraction(self, extractor):
        img = synthetic_corners_image()
        feats = extractor(jnp.asarray(img))
        v = np.asarray(feats.valid)
        assert v.sum() > 150
        xy = np.asarray(feats.xy)[v]
        assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240
        # descriptors should be diverse
        d = np.asarray(feats.desc)[v]
        assert len(np.unique(d, axis=0)) > 0.8 * v.sum()

    def test_shift_repeatability(self, extractor):
        """Features matched across a 5-px shift must recover the shift."""
        img = synthetic_corners_image(seed=2)
        img2 = np.roll(img, (5, 5), axis=(0, 1))
        fa = extractor(jnp.asarray(img))
        fb = extractor(jnp.asarray(img2))
        dist = hamming(fa.desc, fb.desc)
        dist = jnp.where(fa.valid[:, None] & fb.valid[None, :], dist, 1 << 20)
        best = jnp.argmin(dist, axis=1)
        bestd = jnp.min(dist, axis=1)
        good = np.asarray(fa.valid) & (np.asarray(bestd) < 40)
        assert good.sum() > 50
        delta = np.asarray(fb.xy)[np.asarray(best)[good]] - np.asarray(fa.xy)[good]
        med = np.median(delta, axis=0)
        np.testing.assert_allclose(med, [5.0, 5.0], atol=1.5)

    def test_rotation_invariance(self, extractor):
        """Descriptors survive a 20-degree in-plane rotation."""
        img = synthetic_corners_image(seed=3)
        M = cv2.getRotationMatrix2D((160, 120), 20.0, 1.0)
        img2 = cv2.warpAffine(img, M, (320, 240), flags=cv2.INTER_LINEAR)
        fa = extractor(jnp.asarray(img))
        fb = extractor(jnp.asarray(img2))
        dist = hamming(fa.desc, fb.desc)
        dist = jnp.where(fa.valid[:, None] & fb.valid[None, :], dist, 1 << 20)
        best = np.asarray(jnp.argmin(dist, axis=1))
        bestd = np.asarray(jnp.min(dist, axis=1))
        good = np.asarray(fa.valid) & (bestd < 50)
        assert good.sum() > 30
        # matched locations should map under the rotation
        pa = np.asarray(fa.xy)[good]
        pb = np.asarray(fb.xy)[best[good]]
        pred = pa @ M[:, :2].T + M[:, 2]
        err = np.linalg.norm(pred - pb, axis=1)
        assert np.median(err) < 2.5

    def test_orientation_tracks_image_rotation(self, extractor):
        """The IC angle of matched keypoints must shift by the in-plane
        rotation applied to the image (reference IC_Angle semantics,
        ORBextractor.cc:76-100)."""
        img = synthetic_corners_image(seed=5)
        rot_deg = 25.0
        M = cv2.getRotationMatrix2D((160, 120), rot_deg, 1.0)
        img2 = cv2.warpAffine(img, M, (320, 240), flags=cv2.INTER_LINEAR)
        fa = extractor(jnp.asarray(img))
        fb = extractor(jnp.asarray(img2))
        dist = hamming(fa.desc, fb.desc)
        dist = jnp.where(fa.valid[:, None] & fb.valid[None, :], dist, 1 << 20)
        best = np.asarray(jnp.argmin(dist, axis=1))
        bestd = np.asarray(jnp.min(dist, axis=1))
        good = np.asarray(fa.valid) & (bestd < 45)
        assert good.sum() > 30
        da = np.asarray(fa.angle)[good] - np.asarray(fb.angle)[best[good]]
        da = (da + 180.0) % 360.0 - 180.0
        # image rotated by +25 deg (counter-clockwise in image coords ->
        # centroid angle decreases by 25 in y-down convention)
        med = np.median(da)
        assert abs(abs(med) - rot_deg) < 5.0, f"median dAngle {med}"
