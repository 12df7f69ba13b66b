"""Pinhole camera with OpenCV-style radial-tangential distortion.

Replaces the reference's use of ``cv::undistortPoints`` / ``cv::projectPoints``
(reference: Frame.cc:419-475 UndistortKeyPoints/ComputeImageBounds) and the
per-frame projection math scattered through ORBmatcher/Optimizer.  All
functions are batched over leading dims and jit-safe.

Intrinsics are carried as a small pytree-friendly NamedTuple so a camera can
be passed straight into jitted functions as static-or-traced data.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Camera(NamedTuple):
    """Pinhole intrinsics + distortion + stereo baseline.

    Mirrors the YAML camera block parsed in Tracking.cc:52-147
    (Camera.fx/fy/cx/cy, Camera.k1/k2/p1/p2/k3, Camera.bf).
    ``bf`` is baseline(m) * fx; 0.0 for monocular.
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array
    k2: jax.Array
    p1: jax.Array
    p2: jax.Array
    k3: jax.Array
    bf: jax.Array
    width: int = 640
    height: int = 480

    @classmethod
    def create(cls, fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
               bf=0.0, width=640, height=480) -> "Camera":
        # HOST (numpy) scalars, deliberately: Camera is captured by closure
        # in jitted programs (system._build_fused_track, _jit_frame), and a
        # jit that closes over a *device* array permanently degrades every
        # subsequent host->device transfer in the process ~50x on the
        # tunneled-TPU runtime (measured: 0.3 ms -> 17-27 ms per 0.3 MB
        # frame upload; scripts/probe_tunnel.py).  numpy closures compile
        # to embedded literals and stay on the fast path; in jit argument
        # position they stage like any array.
        f = lambda v: np.float32(v)
        return cls(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1), f(p2),
                   f(k3), f(bf), int(width), int(height))

    @property
    def K(self) -> jax.Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx]),
            jnp.stack([z, self.fy, self.cy]),
            jnp.stack([z, z, o]),
        ])

    @property
    def has_distortion(self) -> bool:
        return True  # decided dynamically in undistort via where; kept for API

    @property
    def baseline(self) -> jax.Array:
        return self.bf / self.fx


def distort_normalized(cam: Camera, xn: jax.Array) -> jax.Array:
    """Apply radial-tangential distortion to normalized coords (..., 2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xy2 = 2.0 * x * y
    xd = x * radial + cam.p1 * xy2 + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p2 * xy2 + cam.p1 * (r2 + 2.0 * y * y)
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(cam: Camera, xd: jax.Array, iters: int = 10) -> jax.Array:
    """Invert distortion by fixed-point iteration (OpenCV's scheme).

    ``cv::undistortPoints`` uses the same compensation loop; 10 iterations
    reproduces it to float32 precision for typical k's.
    """

    def body(_, xn):
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        xy2 = 2.0 * x * y
        dx = cam.p1 * xy2 + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p2 * xy2 + cam.p1 * (r2 + 2.0 * y * y)
        xu = (xd[..., 0] - dx) / radial
        yu = (xd[..., 1] - dy) / radial
        return jnp.stack([xu, yu], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xd)


def pixel_to_normalized(cam: Camera, uv: jax.Array) -> jax.Array:
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y], axis=-1)


def normalized_to_pixel(cam: Camera, xn: jax.Array) -> jax.Array:
    u = xn[..., 0] * cam.fx + cam.cx
    v = xn[..., 1] * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def undistort_pixels(cam: Camera, uv: jax.Array) -> jax.Array:
    """Raw keypoint pixels -> undistorted pixels (Frame::UndistortKeyPoints)."""
    return normalized_to_pixel(cam, undistort_normalized(cam, pixel_to_normalized(cam, uv)))


def project(cam: Camera, pc: jax.Array) -> jax.Array:
    """Camera-frame points (..., 3) -> undistorted pixel coords (..., 2).

    Matches the projection used throughout matching/optimization on
    *undistorted* keypoints (no distortion re-applied — the reference
    compares against undistorted keypoints, e.g. ORBmatcher.cc:45-128).
    Guards z with a floor to stay finite for points behind the camera;
    callers gate on positive depth separately.
    """
    z = pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * pc[..., 0] / z_safe + cam.cx
    v = cam.fy * pc[..., 1] / z_safe + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: Camera, pc: jax.Array) -> jax.Array:
    """(..., 3) -> (u_left, v, u_right) for stereo residuals.

    u_right = u - bf / z (Frame::UnprojectStereo inverse; Optimizer stereo
    edges use the same 3-vector measurement, Optimizer.cc:116-150).
    """
    z = pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    uv = project(cam, pc)
    ur = uv[..., 0] - cam.bf / z_safe
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def unproject(cam: Camera, uv: jax.Array, depth: jax.Array) -> jax.Array:
    """Undistorted pixels + depth -> camera-frame 3D (Frame::UnprojectStereo)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def in_image(cam: Camera, uv: jax.Array, margin: float = 0.0) -> jax.Array:
    """Bounds mask against the *undistorted* image rectangle.

    The reference computes mnMinX/mnMaxX etc. from undistorted corners
    (Frame::ComputeImageBounds, Frame.cc:439-475); with zero distortion this
    collapses to [0, W) x [0, H) which we use as the canonical bound — the
    few-pixel difference for distorted cameras only widens/narrows the
    border cull.
    """
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= margin)
        & (u < cam.width - margin)
        & (v >= margin)
        & (v < cam.height - margin)
    )
