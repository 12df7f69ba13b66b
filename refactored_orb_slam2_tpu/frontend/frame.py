"""Frame construction: ORB extraction + undistortion + stereo/depth association.

Replaces the three Frame constructors (reference Frame.cc:66, 129, 189):
the whole build is one jitted program per sensor type.  The reference's
64x48 keypoint grid (AssignFeaturesToGrid) has no equivalent here — dense
masked matching replaces grid queries.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import camera as cam_mod
from ..geometry.camera import Camera
from ..ops import image as image_ops
from ..ops import stereo as stereo_ops
from ..ops.orb import OrbFeatures, extract_orb, level_quotas
from ..utils.config import ORBConfig


class FrameData(NamedTuple):
    """One frame's padded feature bank (the array form of class Frame)."""

    xy: jax.Array        # (N, 2) undistorted keypoint coords
    xy_raw: jax.Array    # (N, 2) raw coords (stereo SAD works on these)
    uvr: jax.Array       # (N, 3) (u_un, v_un, uR); uR = -1 -> mono feature
    depth: jax.Array     # (N,) stereo/RGBD depth, -1 invalid
    octave: jax.Array    # (N,) int32
    angle: jax.Array     # (N,) float32
    response: jax.Array  # (N,)
    desc: jax.Array      # (N, 8) uint32
    valid: jax.Array     # (N,) bool

    @property
    def n_slots(self) -> int:
        return self.xy.shape[0]


def _feats_to_frame(cam: Camera, feats: OrbFeatures, u_right, depth) -> FrameData:
    xy_un = cam_mod.undistort_pixels(cam, feats.xy)
    uvr = jnp.concatenate([xy_un, u_right[:, None]], axis=-1)
    return FrameData(
        xy=xy_un,
        xy_raw=feats.xy,
        uvr=uvr,
        depth=depth,
        octave=feats.octave,
        angle=feats.angle,
        response=feats.response,
        desc=feats.desc,
        valid=feats.valid,
    )


def build_frame_mono(img: jax.Array, cam: Camera, orb: ORBConfig) -> FrameData:
    feats = extract_orb(
        img,
        n_features=orb.n_features,
        n_levels=orb.n_levels,
        scale_factor=orb.scale_factor,
        ini_th=orb.ini_th_fast,
        min_th=orb.min_th_fast,
    )
    n = feats.n_slots
    return _feats_to_frame(
        cam, feats, jnp.full((n,), -1.0), jnp.full((n,), -1.0)
    )


def build_frame_rgbd(
    img: jax.Array, depth_map: jax.Array, cam: Camera, orb: ORBConfig,
    depth_factor: float = 1.0,
) -> FrameData:
    """RGB-D frame: depth looked up at raw keypoint coords, uR synthesized
    (Frame.cc:648-666).

    ``depth_map`` is expected in METERS; ``depth_factor`` is a multiplicative
    scale-to-meters for callers holding raw sensor units (pass 1/5000 for
    raw TUM uint16 PNGs — the reciprocal of the reference's DepthMapFactor,
    which it applies as convertTo(1/factor), Tracking.cc:211-218).  The
    SlamSystem facade always feeds meters (loaders apply DepthMapFactor)."""
    feats = extract_orb(
        img,
        n_features=orb.n_features,
        n_levels=orb.n_levels,
        scale_factor=orb.scale_factor,
        ini_th=orb.ini_th_fast,
        min_th=orb.min_th_fast,
    )
    ys = jnp.clip(jnp.round(feats.xy[:, 1]).astype(jnp.int32), 0, img.shape[0] - 1)
    xs = jnp.clip(jnp.round(feats.xy[:, 0]).astype(jnp.int32), 0, img.shape[1] - 1)
    d = depth_map[ys, xs] * depth_factor
    # depth-edge rejection: corners sit on occlusion boundaries where a
    # 1-px rounding error flips the lookup to the far surface, creating
    # grossly wrong landmarks.  Reject features whose 3x3 depth window is
    # inconsistent (>10% spread among positive samples).
    h, w = depth_map.shape
    d_min = jnp.full_like(d, jnp.inf)
    d_max = jnp.zeros_like(d)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            dn = depth_map[
                jnp.clip(ys + dy, 0, h - 1), jnp.clip(xs + dx, 0, w - 1)
            ] * depth_factor
            d_min = jnp.minimum(d_min, jnp.where(dn > 0, dn, jnp.inf))
            d_max = jnp.maximum(d_max, dn)
    edge = (d_max > 1.1 * d_min) | ~jnp.isfinite(d_min)
    d = jnp.where(feats.valid & (d > 0) & ~edge, d, -1.0)
    xy_un = cam_mod.undistort_pixels(cam, feats.xy)
    u_r = stereo_ops.depth_to_uright(xy_un, d, cam.bf)
    return _feats_to_frame(cam, feats, u_r, d)


def build_frame_stereo(
    img_l: jax.Array, img_r: jax.Array, cam: Camera, orb: ORBConfig,
) -> FrameData:
    """Stereo frame: extract on both images (the reference uses two CPU
    threads, Frame.cc:87-90 — here both extractions sit in one XLA program),
    then row-constrained matching + SAD refinement."""
    kw = dict(
        n_features=orb.n_features,
        n_levels=orb.n_levels,
        scale_factor=orb.scale_factor,
        ini_th=orb.ini_th_fast,
        min_th=orb.min_th_fast,
    )
    feats_l = extract_orb(img_l, **kw)
    feats_r = extract_orb(img_r, **kw)
    pyr_l = image_ops.build_pyramid(
        img_l.astype(jnp.float32), orb.n_levels, orb.scale_factor
    )
    pyr_r = image_ops.build_pyramid(
        img_r.astype(jnp.float32), orb.n_levels, orb.scale_factor
    )
    stack_l, offs = stereo_ops.stack_pyramid(pyr_l)
    stack_r, _ = stereo_ops.stack_pyramid(pyr_r)
    sf = image_ops.scale_factors(orb.n_levels, orb.scale_factor)
    sm = stereo_ops.stereo_match(
        feats_l, feats_r, stack_l, stack_r, offs, sf,
        fx=float(cam.fx), bf=float(cam.bf), min_z=float(cam.bf) / float(cam.fx),
    )
    return _feats_to_frame(cam, feats_l, sm.u_right, sm.depth)
