"""Dataset loaders, presets, and the unified example driver.

The reference's example binaries (mono_tum.cc etc.) are covered by
scripts/run_dataset.py; here we exercise each loader against a synthetic
on-disk mini-dataset in the exact TUM/KITTI/EuRoC directory layouts, and
check presets carry the reference settings-file constants."""

import os
import subprocess
import sys

import numpy as np
import pytest

from refactored_orb_slam2_tpu.io import datasets as D
from refactored_orb_slam2_tpu.utils import presets as P

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rand_img(rng, h=48, w=64):
    return rng.integers(0, 255, (h, w), dtype=np.uint8)


def _write_tum(root, rng, n=3):
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    rgb_lines, depth_lines = [], []
    for i in range(n):
        t = 1000.0 + i / 30.0
        cv2.imwrite(os.path.join(root, "rgb", f"{t:.6f}.png"), _rand_img(rng))
        d = (rng.uniform(0.5, 3.0, (48, 64)) * 5000).astype(np.uint16)
        cv2.imwrite(os.path.join(root, "depth", f"{t:.6f}.png"), d)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
    for name, lines in (("rgb.txt", rgb_lines), ("depth.txt", depth_lines)):
        with open(os.path.join(root, name), "w") as f:
            f.write("# header\n" + "\n".join(lines) + "\n")


def _write_kitti(root, rng, n=3):
    for sub in ("image_0", "image_1"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        for i in range(n):
            cv2.imwrite(os.path.join(root, sub, f"{i:06d}.png"), _rand_img(rng))
    with open(os.path.join(root, "times.txt"), "w") as f:
        f.write("\n".join(f"{i * 0.1:.6e}" for i in range(n)))


def _write_euroc(root, rng, n=3):
    for cam in ("cam0", "cam1"):
        os.makedirs(os.path.join(root, cam, "data"), exist_ok=True)
        for i in range(n):
            ts_ns = 1403636579763555584 + i * 50_000_000
            cv2.imwrite(
                os.path.join(root, cam, "data", f"{ts_ns}.png"), _rand_img(rng)
            )


def test_tum_loaders(tmp_path):
    rng = np.random.default_rng(0)
    _write_tum(str(tmp_path), rng)
    items = list(D.TumRgbdSequence(str(tmp_path)))
    assert len(items) == 3
    t, img, dep = items[0]
    assert img.shape == (48, 64) and dep.shape == (48, 64)
    assert 0.4 < dep.mean() < 3.1  # depth factor applied
    mono = list(D.TumMonoSequence(str(tmp_path)))
    assert len(mono) == 3 and mono[1][0] > mono[0][0]


def test_kitti_loaders(tmp_path):
    rng = np.random.default_rng(1)
    _write_kitti(str(tmp_path), rng)
    st = list(D.KittiStereoSequence(str(tmp_path)))
    assert len(st) == 3 and st[2][0] == pytest.approx(0.2)
    assert st[0][1].shape == st[0][2].shape == (48, 64)
    mono = list(D.KittiMonoSequence(str(tmp_path)))
    assert len(mono) == 3 and mono[0][1].shape == (48, 64)


def test_euroc_loaders(tmp_path):
    rng = np.random.default_rng(2)
    _write_euroc(str(tmp_path), rng)
    mono = list(D.EurocMonoSequence(str(tmp_path)))
    assert len(mono) == 3
    assert mono[1][0] - mono[0][0] == pytest.approx(0.05)
    st = list(D.EurocStereoSequence(str(tmp_path), rect=P.EUROC_RECTIFICATION))
    assert len(st) == 3 and st[0][1].shape == (48, 64)


def test_presets_match_reference_settings():
    cfg = P.get_preset("rgbd_tum1")
    assert cfg.sensor == "rgbd"
    assert cfg.camera.fx == pytest.approx(517.306408)
    assert cfg.camera.bf == 40.0
    assert cfg.tracking.depth_map_factor == 5000.0
    assert cfg.orb.n_features == 1000

    cfg = P.get_preset("stereo_kitti00")
    assert cfg.camera.bf == pytest.approx(386.1448)
    assert cfg.tracking.th_depth == 35.0
    assert cfg.orb.n_features == 2000
    assert cfg.camera.fps == 10.0

    cfg = P.get_preset("stereo_euroc")
    assert cfg.camera.fx == pytest.approx(435.2046959714599)
    assert cfg.camera.bf == pytest.approx(47.90639384423901)
    assert cfg.orb.n_features == 1200

    mono = P.get_preset("mono_euroc")
    assert mono.camera.k1 == pytest.approx(-0.28340811)

    assert P.kitti_preset_for_sequence(2).camera.bf == pytest.approx(386.1448)
    assert P.kitti_preset_for_sequence(3).tracking.th_depth == 40.0
    assert P.kitti_preset_for_sequence(7).camera.fx == pytest.approx(707.0912)

    with pytest.raises(KeyError):
        P.get_preset("nope")


@pytest.mark.slow
def test_run_dataset_driver_rgbd(tmp_path):
    """End-to-end: the example-binary CLI on a tiny on-disk TUM sequence.

    Random-noise frames won't initialize a map — the point is that the
    full driver path (preset selection, loader, per-frame track calls,
    trajectory export) runs without error, like the reference's
    compile-only CI but actually executing (SURVEY §4)."""
    rng = np.random.default_rng(3)
    _write_tum(str(tmp_path / "seq"), rng, n=2)
    out = tmp_path / "traj.txt"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_dataset.py"),
         "rgbd_tum", "--data", str(tmp_path / "seq"), "--out", str(out),
         "--max-frames", "2", "--cpu"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.exists()
