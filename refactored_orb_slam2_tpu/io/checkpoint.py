"""Map checkpoint / restore.

The reference never implemented SaveMap/LoadMap (an explicit TODO,
System.h:113-115) because serializing a pointer graph is painful.  With the
map as flat arrays it is one compressed npz: the full MapState, slot
counters, spanning-tree chain, vocabulary, and keyframe BoW bank.  A
restored system relocalizes against the loaded map immediately
(localization-only mode) or continues mapping.
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

from ..models.map_state import MapState


def save_map(path: str, system) -> None:
    """Serialize a SlamSystem's map + place-recognition state."""
    arrays = {f"map_{k}": np.asarray(v) for k, v in system.map._asdict().items()}
    meta = {
        "n_kf": system.n_kf,
        "n_pt": system.n_pt,
        "ref_kf": system.ref_kf,
        "sensor": system.sensor,
        "culled_chain": {
            str(k): [v[0].tolist(), v[1]] for k, v in system.culled_chain.items()
        },
    }
    extra = {}
    if system.vocab is not None:
        extra["vocab_words"] = np.asarray(system.vocab.words)
        extra["vocab_idf"] = np.asarray(system.vocab.idf)
        extra["db_bow"] = np.asarray(system.db.bow)
        extra["db_valid"] = np.asarray(system.db.valid)
    np.savez_compressed(path, meta=json.dumps(meta), **arrays, **extra)


def load_map(path: str, system) -> None:
    """Restore a map saved by :func:`save_map` into a SlamSystem built with
    the same configuration (capacities must match)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    fields = {}
    for k in MapState._fields:
        arr = z[f"map_{k}"]
        cur = getattr(system.map, k)
        if arr.shape != tuple(cur.shape):
            raise ValueError(
                f"capacity mismatch for {k}: checkpoint {arr.shape} vs "
                f"system {tuple(cur.shape)}"
            )
        fields[k] = jnp.asarray(arr)
    system.map = MapState(**fields)
    system.n_kf = int(meta["n_kf"])
    system.n_pt = int(meta["n_pt"])
    system.ref_kf = int(meta["ref_kf"])
    system.culled_chain = {
        int(k): (np.asarray(v[0], dtype=np.float32), int(v[1]))
        for k, v in meta["culled_chain"].items()
    }
    if "vocab_words" in z:
        from ..place.vocab import Vocabulary
        from ..place.keyframe_db import KeyFrameDB
        from ..ops.descriptors import unpack_pm1

        words = jnp.asarray(z["vocab_words"])
        system.vocab = Vocabulary(
            words=words,
            words_pm1=unpack_pm1(words, dtype=jnp.bfloat16),
            idf=jnp.asarray(z["vocab_idf"]),
        )
        system.db = KeyFrameDB(system.vocab, system.cfg.map.max_keyframes)
        system.db.bow = jnp.asarray(z["db_bow"])
        system.db.valid = jnp.asarray(z["db_valid"])
