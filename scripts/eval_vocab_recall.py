"""Loop-detection recall of the packaged vocabulary (VERDICT r2 item 9).

Drives two laps of the street circuit; the first lap's frames populate the
keyframe database, the second lap's frames query it.  A query at arclength
position s must retrieve a first-lap frame within +/-2 positions of s.
Reports recall@1 / recall@5 and the score margin over the best false
candidate.

    JAX_PLATFORMS=cpu python scripts/eval_vocab_recall.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import json

import jax
import jax.numpy as jnp
import numpy as np

from refactored_orb_slam2_tpu.frontend.frame import build_frame_stereo
from refactored_orb_slam2_tpu.geometry.camera import Camera
from refactored_orb_slam2_tpu.place.keyframe_db import KeyFrameDB
from refactored_orb_slam2_tpu.place.vocab import load_vocabulary
from refactored_orb_slam2_tpu.utils.config import CameraConfig, ORBConfig, camera_from_config
from refactored_orb_slam2_tpu.utils import world3d as W

BLOCK, ROAD_W = 22.0, 8.0
LAP = 110


def main():
    cam = camera_from_config(CameraConfig(
        fx=320.0, fy=320.0, cx=160.0, cy=120.0, bf=120.0,
        width=320, height=240, fps=10))
    orb = ORBConfig(n_features=1000, n_levels=4)
    world = W.scene_street(seed=41, block=BLOCK, road_w=ROAD_W)
    poses = W.traj_street_loop(2 * LAP, block=BLOCK, road_w=ROAD_W,
                               seed=41, laps=2.0)
    vocab_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "refactored_orb_slam2_tpu", "assets", "vocab.npz")
    vocab = load_vocabulary(vocab_path)
    db = KeyFrameDB(vocab, max_keyframes=LAP)

    jf = jax.jit(lambda a, b: build_frame_stereo(a, b, cam, orb))
    rng = np.random.default_rng(6)

    print("indexing lap 1...", flush=True)
    db_pos = []
    for i in range(0, LAP, 2):
        L, R = world.render_stereo(poses[i], cam, noise=2.0, rng=rng)
        fr = jf(jnp.asarray(L), jnp.asarray(R))
        db.add(len(db_pos), fr.desc, fr.valid)
        db_pos.append(i)
    db_pos = np.asarray(db_pos)

    print("querying lap 2...", flush=True)
    hits1 = hits5 = n_q = 0
    margins = []
    for q in range(LAP, 2 * LAP, 4):
        L, R = world.render_stereo(poses[q], cam, noise=2.0, rng=rng)
        fr = jf(jnp.asarray(L), jnp.asarray(R))
        bow = db.signature_of(fr.desc, fr.valid)
        scores = np.asarray(db.scores(bow))[: len(db_pos)]
        order = np.argsort(-scores)
        true_pos = q - LAP
        is_true = np.abs(db_pos - true_pos) <= 4   # +/-2 db slots (4 frames)
        n_q += 1
        if is_true[order[0]]:
            hits1 += 1
        if is_true[order[:5]].any():
            hits5 += 1
        best_true = scores[is_true].max()
        best_false = scores[~is_true].max()
        margins.append(best_true - best_false)

    out = dict(
        queries=n_q,
        recall_at_1=round(hits1 / n_q, 3),
        recall_at_5=round(hits5 / n_q, 3),
        median_margin=round(float(np.median(margins)), 4),
        vocab_words=int(vocab.n_words),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
