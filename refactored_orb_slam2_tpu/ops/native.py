"""ctypes bindings for the native host-side components (csrc/).

``distribute_octree`` is the exact greedy quad-tree keypoint balancer
(reference DistributeOctTree, ORBextractor.cc:529-731) compiled from
csrc/octree.cc.  The TPU extractor uses a batched cell-winner
approximation by default; this native path provides strict reference
behavior for host-side pipelines and comparisons.  Build with
``make -C csrc``; a pure-Python fallback keeps everything working when the
shared library hasn't been built.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "libslamnative.so")
    if not os.path.exists(path):
        # try building once if a toolchain is available
        import subprocess

        csrc = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "csrc"
        )
        try:
            subprocess.run(["make", "-C", csrc], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.distribute_octree.restype = ctypes.c_int
    lib.distribute_octree.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    _LIB = lib
    return _LIB


def have_native() -> bool:
    return _load() is not None


def distribute_octree(
    xs: np.ndarray, ys: np.ndarray, responses: np.ndarray,
    bounds: tuple[float, float, float, float], n_desired: int,
) -> np.ndarray:
    """Greedy quad-tree selection: returns a bool keep-mask of ~n_desired
    spatially balanced corners (best response per final node)."""
    xs = np.ascontiguousarray(xs, np.float32)
    ys = np.ascontiguousarray(ys, np.float32)
    rs = np.ascontiguousarray(responses, np.float32)
    n = len(xs)
    keep = np.zeros(n, np.uint8)
    lib = _load()
    if lib is not None:
        lib.distribute_octree(
            xs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, bounds[0], bounds[1], bounds[2], bounds[3], n_desired,
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return keep.astype(bool)
    return _distribute_py(xs, ys, rs, bounds, n_desired)


def _distribute_py(xs, ys, rs, bounds, n_desired) -> np.ndarray:
    """Pure-Python fallback with the same greedy quad-tree semantics."""
    min_x, max_x, min_y, max_y = bounds
    nodes = [(min_x, max_x, min_y, max_y, np.arange(len(xs)))]
    while True:
        if len(nodes) >= n_desired:
            break
        # split most-populated splittable node
        sizes = [len(nd[4]) for nd in nodes]
        order = np.argsort(sizes)[::-1]
        split_any = False
        for oi in order:
            x0, x1, y0, y1, idx = nodes[oi]
            if len(idx) <= 1:
                continue
            mx, my = 0.5 * (x0 + x1), 0.5 * (y0 + y1)
            quads = []
            for qx0, qx1, qy0, qy1 in [
                (x0, mx, y0, my), (mx, x1, y0, my),
                (x0, mx, my, y1), (mx, x1, my, y1),
            ]:
                m = (xs[idx] >= qx0) & (xs[idx] < qx1) & (ys[idx] >= qy0) & (ys[idx] < qy1)
                if m.any():
                    quads.append((qx0, qx1, qy0, qy1, idx[m]))
            nodes.pop(oi)
            nodes.extend(quads)
            split_any = True
            break
        if not split_any:
            break
    keep = np.zeros(len(xs), bool)
    for _, _, _, _, idx in nodes:
        if len(idx):
            keep[idx[np.argmax(rs[idx])]] = True
    return keep
