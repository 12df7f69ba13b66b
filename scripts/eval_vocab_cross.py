"""Cross-scene vocabulary generalization (VERDICT r4 item 7).

The packaged vocabulary trains on ALL renderer families, so the committed
recall@1 = 1.0 (eval_vocab_recall.py) is in-distribution.  This experiment
measures what matters for a vocabulary: recall on scene families it was
NEVER trained on.  Two disjoint-corpus vocabularies are trained (street
seeds only vs room+hall seeds only), and each is evaluated on both its own
family and the other's revisit-retrieval task.  The reference's ORBvoc
makes the same claim at much larger scale (1M words over diverse real
imagery, ORBVocabulary.cc:11-127).

    JAX_PLATFORMS=cpu python scripts/eval_vocab_cross.py

Prints one JSON line per (trained_on, tested_on) cell.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np

from refactored_orb_slam2_tpu.frontend.frame import build_frame_mono
from refactored_orb_slam2_tpu.place.keyframe_db import KeyFrameDB
from refactored_orb_slam2_tpu.place.vocab import train_vocabulary
from refactored_orb_slam2_tpu.utils.config import (
    CameraConfig, ORBConfig, camera_from_config,
)
from refactored_orb_slam2_tpu.utils import world3d as W

CAM = camera_from_config(CameraConfig(
    fx=320.0, fy=320.0, cx=160.0, cy=120.0, bf=120.0,
    width=320, height=240, fps=10))
ORB = ORBConfig(n_features=1000, n_levels=4)
_extract = jax.jit(lambda im: build_frame_mono(im, CAM, ORB))

BLOCK, ROAD_W = 22.0, 8.0
LAP = 110


def corpus(family: str, target: int, seed0: int) -> np.ndarray:
    """Descriptors from ONE scene family only (disjoint seeds from the
    evaluation scenes, which use seed 41 / 11 / 31)."""
    out, total = [], 0
    rng = np.random.default_rng(seed0)
    seed = seed0
    t0 = time.time()
    while total < target:
        if family == "street":
            worlds = [(W.scene_street(seed=seed),
                       W.traj_street_loop(24, seed=seed))]
        else:
            worlds = [(W.scene_room(seed=seed), W.traj_room_orbit(24, seed=seed)),
                      (W.scene_hall(seed=seed), W.traj_hall_ellipse(24, seed=seed))]
        for world, poses in worlds:
            for Tcw in poses[::3]:
                img = world.render(Tcw, CAM, noise=rng.uniform(1, 4), rng=rng)
                fr = _extract(jnp.asarray(img))
                d = np.asarray(fr.desc)[np.asarray(fr.valid)]
                out.append(d)
                total += len(d)
        seed += 1
    print(f"  {family} corpus: {total} descriptors ({time.time() - t0:.0f}s)",
          file=sys.stderr, flush=True)
    return np.concatenate(out)[:target]


def eval_recall(vocab, family: str):
    """Two-lap revisit retrieval on the held-out evaluation scene of the
    given family (same protocol as eval_vocab_recall.py)."""
    if family == "street":
        world = W.scene_street(seed=41, block=BLOCK, road_w=ROAD_W)
        poses = W.traj_street_loop(2 * LAP, block=BLOCK, road_w=ROAD_W,
                                   seed=41, laps=2.0)
    else:
        world = W.scene_hall(seed=31)
        p1 = W.traj_hall_ellipse(LAP, seed=9)
        poses = np.concatenate([p1, p1])      # second identical lap
    rng = np.random.default_rng(6)
    db = KeyFrameDB(vocab, max_keyframes=LAP)
    db_pos = []
    for i in range(0, LAP, 2):
        img = world.render(poses[i], CAM, noise=2.0, rng=rng)
        fr = _extract(jnp.asarray(img))
        db.add(len(db_pos), fr.desc, fr.valid)
        db_pos.append(i)
    db_pos = np.asarray(db_pos)

    hits1 = hits5 = n_q = 0
    margins = []
    for q in range(LAP, 2 * LAP, 4):
        img = world.render(poses[q], CAM, noise=2.0, rng=rng)
        fr = _extract(jnp.asarray(img))
        bow = db.signature_of(fr.desc, fr.valid)
        scores = np.asarray(db.scores(bow))[: len(db_pos)]
        order = np.argsort(-scores)
        true_pos = q - LAP
        is_true = np.abs(db_pos - true_pos) <= 4
        n_q += 1
        if is_true[order[0]]:
            hits1 += 1
        if is_true[order[:5]].any():
            hits5 += 1
        t_best = scores[is_true].max() if is_true.any() else 0.0
        f_best = scores[~is_true].max() if (~is_true).any() else 0.0
        margins.append(float(t_best - f_best))
    return {
        "queries": n_q,
        "recall_at_1": round(hits1 / n_q, 3),
        "recall_at_5": round(hits5 / n_q, 3),
        "median_margin": round(float(np.median(margins)), 3),
    }


def main():
    n_words, target = 2048, 80000
    vocabs = {
        "street": train_vocabulary(corpus("street", target, seed0=200),
                                   n_words=n_words, iters=6),
        "room+hall": train_vocabulary(corpus("room+hall", target, seed0=300),
                                      n_words=n_words, iters=6),
    }
    for trained_on, vocab in vocabs.items():
        for tested_on in ("street", "room+hall"):
            r = eval_recall(vocab, tested_on)
            r.update({"trained_on": trained_on, "tested_on": tested_on,
                      "cross_scene": trained_on != tested_on,
                      "vocab_words": n_words})
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
