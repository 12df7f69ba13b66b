#!/usr/bin/env python
"""Generate recorded dataset fixtures in native TUM/KITTI/EuRoC layouts.

No real datasets ship in this environment (zero egress); parity evidence is
produced on deterministic raycast-rendered sequences written to disk in each
dataset's own on-disk format, then consumed through the standard loaders and
CLI (scripts/run_dataset.py), exactly as a user would run real data.

Fixtures (calibration matches utils/presets.py so --preset works unchanged):
    tum_room    TUM RGB-D layout (rgb/, depth/ uint16 PNG x5000, rgb.txt,
                depth.txt, groundtruth.txt), 640x480 @ 30 fps, fr3 pinhole.
                Handheld desk orbit (fr1/desk-style).
    kitti_loop  KITTI odometry layout (sequences/00/image_{0,1}, times.txt,
                poses/00.txt), 1241x376 @ 10 fps, KITTI-00 calibration.
                Rectangular city-block circuit with loop closure.
    euroc_hall  EuRoC MAV layout (mav0/cam{0,1}/data/<ns>.png), 752x480
                @ 20 fps, rectified stereo (bf = 47.906).  Fixture images
                are rendered already-rectified; run with
                --preset stereo_euroc and no remap (see --no-rect below).
                Ellipse flight in a machine hall (MH01-style).

Usage:
    python scripts/make_fixture.py tum_room --frames 600 --out /tmp/fix/tum_room
    python scripts/make_fixture.py kitti_loop --frames 400 --out /tmp/fix/kitti
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor an explicit platform request even though the container's
# sitecustomize pre-registers the remote-TPU backend (env alone is too late)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from refactored_orb_slam2_tpu.utils import world3d as W
from refactored_orb_slam2_tpu.utils.presets import get_preset
from refactored_orb_slam2_tpu.utils.config import camera_from_config
from refactored_orb_slam2_tpu.geometry import se3


def _imwrite(path, img):
    import cv2

    cv2.imwrite(path, img)


def _quat_of(Twc):
    import jax.numpy as jnp

    return np.asarray(se3.to_quaternion(jnp.asarray(Twc[:3, :3], jnp.float32)))


def write_tum_gt(path, stamps, poses_cw):
    """groundtruth.txt: timestamp tx ty tz qx qy qz qw (camera->world)."""
    with open(path, "w") as f:
        f.write("# ground truth trajectory\n# timestamp tx ty tz qx qy qz qw\n")
        for t, Tcw in zip(stamps, poses_cw):
            Twc = np.linalg.inv(Tcw)
            q = _quat_of(Twc)
            p = Twc[:3, 3]
            f.write(f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                    f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n")


def gen_tum_room(out, n_frames, seed=11):
    cfg = get_preset("rgbd_tum3")
    cam = camera_from_config(cfg.camera)
    world = W.scene_room(seed=seed)
    poses = W.traj_room_orbit(n_frames, seed=seed)
    fps = 30.0
    os.makedirs(os.path.join(out, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out, "depth"), exist_ok=True)
    rng = np.random.default_rng(seed)
    stamps = 1_300_000_000.0 + np.arange(n_frames) / fps
    rgb_lines, depth_lines = [], []
    t_start = time.time()
    for i, Tcw in enumerate(poses):
        img, depth = world.render(Tcw, cam, want_depth=True, noise=2.0, rng=rng)
        ts = stamps[i]
        rgb_name = f"rgb/{ts:.6f}.png"
        depth_name = f"depth/{ts:.6f}.png"
        _imwrite(os.path.join(out, rgb_name), img.astype(np.uint8))
        d16 = np.clip(depth * 5000.0, 0, 65535).astype(np.uint16)
        _imwrite(os.path.join(out, depth_name), d16)
        rgb_lines.append(f"{ts:.6f} {rgb_name}")
        depth_lines.append(f"{ts:.6f} {depth_name}")
        if (i + 1) % 100 == 0:
            print(f"  {i + 1}/{n_frames} frames "
                  f"({(time.time() - t_start) / (i + 1) * 1e3:.0f} ms/frame)",
                  flush=True)
    for name, lines in (("rgb.txt", rgb_lines), ("depth.txt", depth_lines)):
        with open(os.path.join(out, name), "w") as f:
            f.write("# fixture\n# timestamp filename\n")
            f.write("\n".join(lines) + "\n")
    write_tum_gt(os.path.join(out, "groundtruth.txt"), stamps, poses)


def gen_kitti_loop(out, n_frames, seed=23):
    cfg = get_preset("stereo_kitti00")
    cam = camera_from_config(cfg.camera)
    block, road_w = 60.0, 14.0
    world = W.scene_street(seed=seed, block=block, road_w=road_w)
    poses = W.traj_street_loop(n_frames, block=block, road_w=road_w, seed=seed)
    seq = os.path.join(out, "sequences", "00")
    os.makedirs(os.path.join(seq, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(seq, "image_1"), exist_ok=True)
    os.makedirs(os.path.join(out, "poses"), exist_ok=True)
    rng = np.random.default_rng(seed)
    fps = 10.0
    t_start = time.time()
    with open(os.path.join(seq, "times.txt"), "w") as f:
        for i in range(n_frames):
            f.write(f"{i / fps:.6e}\n")
    pose_lines = []
    T0_inv = None
    for i, Tcw in enumerate(poses):
        L, R = world.render_stereo(Tcw, cam, noise=2.0, rng=rng)
        _imwrite(os.path.join(seq, "image_0", f"{i:06d}.png"), L.astype(np.uint8))
        _imwrite(os.path.join(seq, "image_1", f"{i:06d}.png"), R.astype(np.uint8))
        Twc = np.linalg.inv(Tcw)
        if T0_inv is None:
            T0_inv = np.linalg.inv(Twc)
        rel = T0_inv @ Twc          # KITTI gt is relative to the first frame
        pose_lines.append(" ".join(f"{v:.6e}" for v in rel[:3, :4].reshape(-1)))
        if (i + 1) % 100 == 0:
            print(f"  {i + 1}/{n_frames} frames "
                  f"({(time.time() - t_start) / (i + 1) * 1e3:.0f} ms/frame)",
                  flush=True)
    with open(os.path.join(out, "poses", "00.txt"), "w") as f:
        f.write("\n".join(pose_lines) + "\n")
    # TUM-format gt too, for the unified evaluator
    stamps = np.arange(n_frames) / fps
    write_tum_gt(os.path.join(seq, "groundtruth.txt"), stamps, poses)


def gen_euroc_hall(out, n_frames, seed=31):
    cfg = get_preset("stereo_euroc")
    cam = camera_from_config(cfg.camera)
    world = W.scene_hall(seed=seed)
    poses = W.traj_hall_ellipse(n_frames, seed=seed)
    mav = os.path.join(out, "mav0")
    os.makedirs(os.path.join(mav, "cam0", "data"), exist_ok=True)
    os.makedirs(os.path.join(mav, "cam1", "data"), exist_ok=True)
    rng = np.random.default_rng(seed)
    fps = 20.0
    stamps_ns = (1.4e18 + np.arange(n_frames) / fps * 1e9).astype(np.int64)
    t_start = time.time()
    for i, Tcw in enumerate(poses):
        L, R = world.render_stereo(Tcw, cam, noise=2.0, rng=rng)
        name = f"{stamps_ns[i]:d}.png"
        _imwrite(os.path.join(mav, "cam0", "data", name), L.astype(np.uint8))
        _imwrite(os.path.join(mav, "cam1", "data", name), R.astype(np.uint8))
        if (i + 1) % 100 == 0:
            print(f"  {i + 1}/{n_frames} frames "
                  f"({(time.time() - t_start) / (i + 1) * 1e3:.0f} ms/frame)",
                  flush=True)
    write_tum_gt(os.path.join(mav, "groundtruth.txt"),
                 stamps_ns.astype(np.float64) * 1e-9, poses)


FIXTURES = {
    "tum_room": (gen_tum_room, 600),
    "kitti_loop": (gen_kitti_loop, 400),
    "euroc_hall": (gen_euroc_hall, 500),
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("fixture", choices=sorted(FIXTURES))
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()
    gen, default_frames = FIXTURES[args.fixture]
    kwargs = {}
    if args.seed is not None:
        kwargs["seed"] = args.seed
    os.makedirs(args.out, exist_ok=True)
    gen(args.out, args.frames or default_frames, **kwargs)
    print(f"fixture {args.fixture} written to {args.out}")


if __name__ == "__main__":
    main()
