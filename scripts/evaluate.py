#!/usr/bin/env python
"""Trajectory evaluation: ATE RMSE (+ RPE) against ground truth.

The evo-equivalent for this repo's offline environment (reference evaluation
path: Evaluation/kitti_to_tum.py converts KITTI output for `evo`; here both
sides are TUM format already).  Associates estimate and ground-truth poses
by nearest timestamp, aligns with Umeyama (SE3, or Sim3 for monocular), and
reports ATE RMSE plus translational RPE.

Usage:
    python scripts/evaluate.py --est /tmp/run/traj.txt \
        --gt /tmp/fix/tum_room/groundtruth.txt [--scale] [--json]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def load_tum(path):
    """-> (stamps (n,), positions (n,3), quaternions (n,4) xyzw)"""
    ts, pos, quat = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            if len(v) < 8:
                continue
            ts.append(v[0])
            pos.append(v[1:4])
            quat.append(v[4:8])
    return np.asarray(ts), np.asarray(pos), np.asarray(quat)


def associate(ts_a, ts_b, max_dt=0.03):
    """Nearest-timestamp association -> (idx_a, idx_b)."""
    ia, ib = [], []
    j = 0
    for i, t in enumerate(ts_a):
        j = int(np.argmin(np.abs(ts_b - t)))
        if abs(ts_b[j] - t) <= max_dt:
            ia.append(i)
            ib.append(j)
    return np.asarray(ia, int), np.asarray(ib, int)


def umeyama(est, gt, with_scale=False):
    """Least-squares similarity/rigid alignment est -> gt.
    Returns (s, R, t) with gt ~= s * R @ est + t."""
    mu_e, mu_g = est.mean(0), gt.mean(0)
    E, G = est - mu_e, gt - mu_g
    C = G.T @ E / len(E)
    U, D, Vt = np.linalg.svd(C)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    s = float(np.trace(np.diag(D) @ S) / max((E ** 2).sum() / len(E), 1e-12)) \
        if with_scale else 1.0
    t = mu_g - s * R @ mu_e
    return s, R, t


def evaluate(est_path, gt_path, with_scale=False, max_dt=0.03, rpe_delta=1.0):
    ts_e, pos_e, _ = load_tum(est_path)
    ts_g, pos_g, _ = load_tum(gt_path)
    if len(ts_e) < 3:
        raise SystemExit(f"estimate too short: {len(ts_e)} poses")
    ie, ig = associate(ts_e, ts_g, max_dt)
    if len(ie) < 3:
        raise SystemExit("too few timestamp associations")
    E, G = pos_e[ie], pos_g[ig]
    s, R, t = umeyama(E, G, with_scale)
    aligned = s * E @ R.T + t
    err = np.linalg.norm(aligned - G, axis=1)
    ate_rmse = float(np.sqrt(np.mean(err ** 2)))

    # translational RPE over ~rpe_delta-second windows (drift rate)
    tse = ts_e[ie]
    rpe = []
    k = 0
    for i in range(len(tse)):
        while k < len(tse) and tse[k] < tse[i] + rpe_delta:
            k += 1
        if k >= len(tse):
            break
        d_est = np.linalg.norm(aligned[k] - aligned[i])
        d_gt = np.linalg.norm(G[k] - G[i])
        rpe.append(abs(d_est - d_gt))
    gt_len = float(np.linalg.norm(np.diff(G, axis=0), axis=1).sum())
    return {
        "poses": int(len(ie)),
        "coverage": float(len(ie) / len(ts_g)),
        "ate_rmse_m": ate_rmse,
        "ate_mean_m": float(err.mean()),
        "ate_max_m": float(err.max()),
        "rpe_rmse_m": float(np.sqrt(np.mean(np.square(rpe)))) if rpe else None,
        "scale": s,
        "gt_path_length_m": gt_len,
        "drift_pct": float(ate_rmse / max(gt_len, 1e-9) * 100.0),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--est", required=True, help="estimated trajectory (TUM)")
    ap.add_argument("--gt", required=True, help="ground truth (TUM format)")
    ap.add_argument("--scale", action="store_true",
                    help="Sim3 alignment (monocular)")
    ap.add_argument("--max-dt", type=float, default=0.03)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    r = evaluate(args.est, args.gt, with_scale=args.scale, max_dt=args.max_dt)
    if args.json:
        print(json.dumps(r))
    else:
        for k, v in r.items():
            print(f"{k:>18}: {v}")


if __name__ == "__main__":
    main()
