"""Image-plane kernels: grayscale, Gaussian blur, pyramid.

Replaces the reference's OpenCV calls: ``cvtColor`` (Tracking.cc:225-246),
``GaussianBlur(7x7, sigma=2)`` before descriptor sampling
(ORBextractor.cc:1026), and ``cv::resize`` pyramid construction
(ComputePyramid, ORBextractor.cc:1041-1065).  Everything is static-shape and
fuses into the single jitted extraction program.

Images are ``(H, W)`` float32 in [0, 255] (matching 8-bit gray levels so
FAST thresholds keep their reference meaning).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_gray(img: jax.Array, bgr: bool = False) -> jax.Array:
    """(H, W, 3) -> (H, W) using BT.601 weights (cv::cvtColor RGB2GRAY)."""
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=jnp.float32)
    if bgr:
        w = w[::-1]
    return jnp.tensordot(img.astype(jnp.float32), w, axes=[[-1], [0]])


@functools.lru_cache(maxsize=None)
def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    # cv::getGaussianKernel formula
    half = (ksize - 1) / 2.0
    x = np.arange(ksize) - half
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jax.Array, ksize: int = 7, sigma: float = 2.0) -> jax.Array:
    """Separable Gaussian blur with reflect-101 borders (OpenCV default).

    Implemented as static shifted adds on the VPU — several times faster on
    TPU than routing a 1-channel conv through the convolution emitter.
    """
    k = _gaussian_kernel1d(ksize, sigma)
    pad = ksize // 2
    h, w = img.shape
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    out = k[0] * x[0:h, :]
    for i in range(1, ksize):
        out = out + k[i] * x[i : i + h, :]
    x = jnp.pad(out, ((0, 0), (pad, pad)), mode="reflect")
    out = k[0] * x[:, 0:w]
    for i in range(1, ksize):
        out = out + k[i] * x[:, i : i + w]
    return out


@functools.lru_cache(maxsize=None)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix with half-pixel centers
    (the cv::resize INTER_LINEAR sampling grid, edge-clamped)."""
    A = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for o in range(n_out):
        src = (o + 0.5) * scale - 0.5
        i0 = int(np.floor(src))
        f = src - i0
        i0c = min(max(i0, 0), n_in - 1)
        i1c = min(max(i0 + 1, 0), n_in - 1)
        A[o, i0c] += 1.0 - f
        A[o, i1c] += f
    return A


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with half-pixel centers (cv::resize INTER_LINEAR).

    Expressed as two small matmuls (out = A_h @ img @ A_w^T) so the MXU does
    the interpolation — several times faster on TPU than the gather-based
    jax.image.resize lowering.
    """
    h, w = img.shape
    Ah = jnp.asarray(_resize_matrix(h, out_h))
    Aw = jnp.asarray(_resize_matrix(w, out_w))
    return Ah @ img @ Aw.T


def pyramid_shapes(h: int, w: int, n_levels: int, scale_factor: float):
    """Static per-level (H, W) shapes, floor-rounded like the reference
    (ORBextractor.cc:1045: cvRound(W/scale))."""
    shapes = []
    for lv in range(n_levels):
        s = scale_factor ** lv
        shapes.append((int(round(h / s)), int(round(w / s))))
    return shapes


def build_pyramid(img: jax.Array, n_levels: int, scale_factor: float):
    """List of per-level images, each resized from the previous level
    (matches the reference's chained resize, which differs slightly from
    resizing level 0 directly)."""
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale_factor)
    out = [img]
    for lv in range(1, n_levels):
        out.append(resize_bilinear(out[-1], *shapes[lv]))
    return out


def scale_factors(n_levels: int, scale_factor: float) -> np.ndarray:
    return np.asarray([scale_factor ** lv for lv in range(n_levels)], dtype=np.float32)


def level_sigma2(n_levels: int, scale_factor: float) -> np.ndarray:
    """Per-octave variance used as information weights in the optimizers
    (mvLevelSigma2, ORBextractor ctor; consumed at Optimizer.cc:111)."""
    return scale_factors(n_levels, scale_factor) ** 2
