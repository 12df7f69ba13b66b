"""Per-frame diagnostic of the TUM fixture run (chip by default)."""

import os
import sys

sys.path.insert(0, "/root/repo")

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from refactored_orb_slam2_tpu.io import datasets as D
from refactored_orb_slam2_tpu.utils.presets import get_preset
from refactored_orb_slam2_tpu.system import SlamSystem

N = int(os.environ.get("DIAG_FRAMES", "600"))


def main():
    cfg = get_preset("rgbd_tum3")
    sys_ = SlamSystem(cfg)
    seq = D.TumRgbdSequence("/tmp/fix/tum_room",
                            depth_factor=cfg.tracking.depth_map_factor)
    orig = sys_._jit_fused_track
    last = {}

    def spy(*a):
        out = orig(*a)
        last["sc"] = {k: int(v) for k, v in out[-1].items()}
        return out

    sys_._jit_fused_track = spy
    lost = 0
    for i, (t, img, dep) in enumerate(seq):
        if i >= N:
            break
        last["sc"] = None
        st0 = sys_.state
        pose = sys_.track_rgbd(img, dep, t)
        ok = pose is not None
        if not ok:
            lost += 1
        sc = last["sc"]
        if not ok or i % 10 == 0 or (sc and sc["n_map_inliers"] < 60):
            print(f"f{i:3d} st={st0}->{sys_.state} ok={int(ok)} kf={sys_.n_kf} "
                  f"pt={sys_.n_pt} "
                  + (f"mot={sc['n_motion']} map={sc['n_map_inliers']} "
                     f"ref={sc['ref_tracked']}" if sc else ""), flush=True)
    print(f"lost={lost} stats={sys_.stats}")


if __name__ == "__main__":
    main()
