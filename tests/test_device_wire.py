"""Device-resident wire-path coverage (VERDICT r4 item 5).

``track_*_device`` consumes frames already in the wire encoding (uint8
grayscale, uint16 millimeter depth) and already resident in device memory —
the path the headline benchmark measures.  These tests pin:

- the encode/decode round trip at the quantization edges (0 depth, the
  65.535 m clamp, image clamping), and
- pose / keyframe-decision parity between the host path (``track_rgbd``,
  float frames encoded host-side, system.py:50-72) and the device path
  (``World3D.render_device`` -> ``track_rgbd_device``) on identical scenes.
"""

import numpy as np
import jax.numpy as jnp

from refactored_orb_slam2_tpu.system import (
    SlamSystem, _decode_depth, _decode_img, _encode_depth, _encode_img,
)
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, MapConfig, ORBConfig, SystemConfig,
)
from refactored_orb_slam2_tpu.utils import world3d as W


class TestWireEncoding:
    def test_image_round_trip_and_clamp(self):
        img = np.array([[-3.0, 0.0, 0.4, 127.6, 255.0, 300.0]], np.float32)
        enc = _encode_img(img)
        assert enc.dtype == np.uint8
        dec = np.asarray(_decode_img(jnp.asarray(enc)))
        # quantization is truncation of fractions only; clamps at 0/255
        assert dec[0, 0] == 0.0 and dec[0, -1] == 255.0
        assert abs(dec[0, 3] - 127.6) < 1.0
        # already-encoded input passes through untouched
        assert _encode_img(enc) is enc

    def test_depth_round_trip_edges(self):
        depth = np.array(
            [[0.0, 1e-4, 0.5004, 5.0, 65.535, 80.0, -1.0]], np.float32
        )
        enc = _encode_depth(depth)
        assert enc.dtype == np.uint16
        dec = np.asarray(_decode_depth(jnp.asarray(enc)))
        assert dec[0, 0] == 0.0          # zero depth stays exactly zero
        assert dec[0, 1] == 0.0          # sub-mm floors to 0 (invalid)
        assert abs(dec[0, 2] - 0.5004) < 1e-3   # 1 mm quantization
        assert abs(dec[0, 3] - 5.0) < 1e-3
        assert dec[0, 4] == 65.535       # clamp ceiling representable
        assert dec[0, 5] == 65.535       # beyond-range clamps to ceiling
        assert dec[0, 6] == 0.0          # negative (invalid) clamps to 0
        assert _encode_depth(enc) is enc

    def test_device_encoder_matches_host_encoder(self):
        rng = np.random.default_rng(3)
        img = rng.uniform(-5, 260, (48, 64)).astype(np.float32)
        depth = rng.uniform(-0.5, 70.0, (48, 64)).astype(np.float32)
        img_u8, depth_u16 = W._encode_frame_device(
            jnp.asarray(img), jnp.asarray(depth)
        )
        np.testing.assert_array_equal(np.asarray(img_u8), _encode_img(img))
        np.testing.assert_array_equal(
            np.asarray(depth_u16), _encode_depth(depth)
        )


def _make_system():
    cfg = SystemConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=160.0, fy=160.0, cx=80.0, cy=60.0, bf=20.0,
                            width=160, height=120, fps=30),
        orb=ORBConfig(n_features=400, n_levels=4),
        map=MapConfig(max_keyframes=32, max_points=4096,
                      max_obs_per_point=8),
    )
    return SlamSystem(cfg)


class TestDevicePathParity:
    def test_track_rgbd_device_matches_host_path(self):
        """The same scene through both entry points must produce identical
        poses and keyframe decisions: the wire arrays are bit-equal, so any
        divergence is a decode bug on the device path."""
        world = W.scene_room(seed=11)
        poses = W.traj_room_orbit(10, seed=5, span=0.25 * np.pi)
        rng_a = np.random.default_rng(0)
        rng_b = np.random.default_rng(0)

        sys_host = _make_system()
        sys_dev = _make_system()
        for i, T in enumerate(poses):
            img, depth = world.render(
                T, sys_host.cam, want_depth=True, noise=2.0, rng=rng_a
            )
            p_host = sys_host.track_rgbd(img, depth, i / 30.0)

            img_u8, depth_u16 = world.render_device(
                T, sys_dev.cam, want_depth=True, noise=2.0, rng=rng_b
            )
            p_dev = sys_dev.track_rgbd_device(img_u8, depth_u16, i / 30.0)

            assert (p_host is None) == (p_dev is None), f"frame {i}"
            if p_host is not None:
                np.testing.assert_allclose(
                    np.asarray(p_host), np.asarray(p_dev),
                    rtol=0, atol=1e-5, err_msg=f"frame {i}"
                )
        assert sys_dev.n_kf == sys_host.n_kf
        assert sys_dev.n_pt == sys_host.n_pt
        np.testing.assert_array_equal(
            np.asarray(sys_dev.map.kf_valid), np.asarray(sys_host.map.kf_valid)
        )
