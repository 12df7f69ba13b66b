#!/usr/bin/env python
"""Train the shipped visual vocabulary offline.

The reference depends on a 1M-word ORB vocabulary trained offline on a
large image corpus (ORBVocabulary.cc:11-127; the ORBvoc.txt asset itself is
absent from the snapshot, SURVEY §2.2).  This environment has no image
corpus either (zero egress), so the corpus is rendered: frames from every
procedural scene family (room / street / hall / billboard clouds) across
many seeds, viewpoints, scales, and lighting noise, run through the real
ORB extraction kernel.  The resulting descriptors cover the same rBRIEF
response distribution the engine sees at runtime — which is what the
vocabulary's word boundaries must discriminate.

Usage:
    python scripts/train_vocab.py --words 4096 --target 200000 \
        --out refactored_orb_slam2_tpu/assets/vocab.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from refactored_orb_slam2_tpu.frontend.frame import build_frame_mono
from refactored_orb_slam2_tpu.geometry import se3
from refactored_orb_slam2_tpu.place.vocab import save_vocabulary, train_vocabulary
from refactored_orb_slam2_tpu.utils import world3d as W
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, ORBConfig, SystemConfig, camera_from_config,
)
from refactored_orb_slam2_tpu.utils.synthetic import SyntheticWorld


def corpus_descriptors(target: int, seed0: int = 100) -> np.ndarray:
    cam_cfg = CameraConfig(fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                           width=640, height=480)
    cam = camera_from_config(cam_cfg)
    orb = ORBConfig(n_features=1000, n_levels=8)
    extract = jax.jit(lambda im: build_frame_mono(im, cam, orb))

    out = []
    total = 0
    rng = np.random.default_rng(seed0)
    t0 = time.time()
    scene_makers = [
        lambda s: (W.scene_room(seed=s), W.traj_room_orbit(24, seed=s)),
        lambda s: (W.scene_street(seed=s), W.traj_street_loop(24, seed=s)),
        lambda s: (W.scene_hall(seed=s), W.traj_hall_ellipse(24, seed=s)),
    ]
    seed = seed0
    while total < target:
        for make in scene_makers:
            world, poses = make(seed)
            for Tcw in poses[:: max(1, len(poses) // 8)]:
                img = world.render(Tcw, cam, noise=rng.uniform(1, 4), rng=rng)
                fr = extract(jnp.asarray(img))
                d = np.asarray(fr.desc)[np.asarray(fr.valid)]
                out.append(d)
                total += len(d)
            if total >= target:
                break
        # billboard clouds add isolated-corner statistics
        bw = SyntheticWorld.create(
            seed=seed, n_points=500, x_range=(-10, 10), y_range=(-4, 4),
            z_range=(2.0, 25.0), clear_tube=0.0,
        )
        for k in range(6):
            step = np.asarray(se3.exp(jnp.asarray(
                [0.3 * k, 0.05 * k, 0.1 * k, 0, 0.05 * k, 0], jnp.float32)))
            img = bw.render(step, cam, noise=rng.uniform(1, 4), rng=rng)
            fr = extract(jnp.asarray(img))
            d = np.asarray(fr.desc)[np.asarray(fr.valid)]
            out.append(d)
            total += len(d)
        seed += 1
        print(f"  corpus: {total}/{target} descriptors "
              f"({time.time() - t0:.0f}s)", flush=True)
    return np.concatenate(out)[:target]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--words", type=int, default=4096)
    ap.add_argument("--target", type=int, default=200000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "refactored_orb_slam2_tpu", "assets", "vocab.npz"))
    args = ap.parse_args()

    descs = corpus_descriptors(args.target)
    print(f"training {args.words}-word vocabulary on {len(descs)} descriptors")
    t0 = time.time()
    vocab = train_vocabulary(descs, n_words=args.words, iters=args.iters)
    print(f"trained in {time.time() - t0:.0f}s")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_vocabulary(vocab, args.out)
    print(f"saved to {args.out}")

    # quick self-check: words must be spread (no giant cluster)
    from refactored_orb_slam2_tpu.place.vocab import assign_words
    w = np.asarray(assign_words(
        vocab, jnp.asarray(descs[:20000]), jnp.ones(20000, bool)))
    occupancy = np.bincount(w, minlength=args.words)
    print(f"word occupancy: used={int((occupancy > 0).sum())}/{args.words} "
          f"max={occupancy.max()} mean={occupancy.mean():.1f}")


if __name__ == "__main__":
    main()
