"""Place recognition: vocabulary training, BoW scoring, candidate retrieval."""

import numpy as np
import jax.numpy as jnp

from refactored_orb_slam2_tpu.place.vocab import (
    Vocabulary, assign_words, bow_score, bow_vector, load_vocabulary,
    save_vocabulary, train_vocabulary,
)
from refactored_orb_slam2_tpu.place.keyframe_db import (
    KeyFrameDB, detect_loop_candidates, detect_reloc_candidates,
)


def make_descriptor_families(rng, n_families=32, per_family=20, flip_bits=12):
    """Clustered binary descriptors: families of near-duplicates."""
    protos = rng.integers(0, 2**32, (n_families, 8), dtype=np.uint32)
    out = []
    fam = []
    for f in range(n_families):
        for _ in range(per_family):
            d = protos[f].copy()
            for _ in range(flip_bits):
                w = rng.integers(0, 8)
                b = rng.integers(0, 32)
                d[w] ^= np.uint32(1 << b)
            out.append(d)
            fam.append(f)
    return np.stack(out), np.asarray(fam), protos


class TestVocabulary:
    def test_train_clusters_families(self):
        rng = np.random.default_rng(0)
        descs, fam, protos = make_descriptor_families(rng)
        vocab = train_vocabulary(descs, n_words=32, iters=6)
        words = np.asarray(
            assign_words(vocab, jnp.asarray(descs), jnp.ones(len(descs), bool))
        )
        # members of the same family should mostly share a word
        agree = 0
        for f in range(32):
            w = words[fam == f]
            agree += (w == np.bincount(w).argmax()).mean()
        assert agree / 32 > 0.8

    def test_bow_roundtrip_and_similarity(self):
        rng = np.random.default_rng(1)
        descs, fam, _ = make_descriptor_families(rng)
        vocab = train_vocabulary(descs, n_words=32, iters=4)
        # two "frames" sampling the same families -> high score;
        # disjoint families -> low score
        d1 = jnp.asarray(descs[fam < 8])
        d2 = jnp.asarray(descs[fam < 8][::-1])
        d3 = jnp.asarray(descs[fam >= 24])
        v1 = bow_vector(vocab, assign_words(vocab, d1, jnp.ones(len(d1), bool)))
        v2 = bow_vector(vocab, assign_words(vocab, d2, jnp.ones(len(d2), bool)))
        v3 = bow_vector(vocab, assign_words(vocab, d3, jnp.ones(len(d3), bool)))
        s_same = float(bow_score(v1, v2))
        s_diff = float(bow_score(v1, v3))
        assert s_same > 0.9
        assert s_diff < 0.3
        assert abs(float(jnp.sum(v1)) - 1.0) < 1e-5

    def test_save_load(self, tmp_path):
        rng = np.random.default_rng(2)
        descs, _, _ = make_descriptor_families(rng, n_families=8)
        vocab = train_vocabulary(descs, n_words=16, iters=2)
        p = str(tmp_path / "vocab.npz")
        save_vocabulary(vocab, p)
        v2 = load_vocabulary(p)
        np.testing.assert_array_equal(np.asarray(v2.words), np.asarray(vocab.words))
        w1 = assign_words(vocab, jnp.asarray(descs[:10]), jnp.ones(10, bool))
        w2 = assign_words(v2, jnp.asarray(descs[:10]), jnp.ones(10, bool))
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


class TestKeyFrameDB:
    def _build(self, rng, n_kf=12):
        descs, fam, _ = make_descriptor_families(rng, n_families=48, per_family=10)
        vocab = train_vocabulary(descs, n_words=48, iters=4)
        db = KeyFrameDB(vocab, max_keyframes=16)
        # each KF samples 4 consecutive families; KF k and KF k+8 share none,
        # except KF 10 which re-observes KF 1's families (the "loop")
        frames = []
        for k in range(n_kf):
            base = (k * 4) % 40
            if k == 10:
                base = 4  # same families as KF 1
            sel = (fam >= base) & (fam < base + 4)
            d = descs[sel]
            pad = np.zeros((64 - len(d), 8), np.uint32)
            dd = jnp.asarray(np.concatenate([d, pad]))
            vv = jnp.asarray([True] * len(d) + [False] * (64 - len(d)))
            db.add(k, dd, vv)
            frames.append((dd, vv))
        return db, frames

    def test_loop_candidate_found(self):
        rng = np.random.default_rng(3)
        db, frames = self._build(rng)
        covis = (  # recent neighbors of the query keyframe 10
            jnp.zeros((16, 16), jnp.int32)
            .at[10, 9].set(50).at[9, 10].set(50)
            .at[10, 8].set(30).at[8, 10].set(30)
        )
        cands, scores = detect_loop_candidates(db, db.bow[10], 10, covis)
        cands = [int(c) for c in np.asarray(cands) if c >= 0]
        assert 1 in cands, cands

    def test_group_accumulation_beats_lone_decoy(self):
        """Covisibility-group score accumulation (KeyFrameDatabase.cc:120-160):
        a covisible group of moderately-similar keyframes must outrank an
        isolated keyframe whose single score is slightly higher."""
        rng = np.random.default_rng(6)
        descs, fam, _ = make_descriptor_families(rng, n_families=8)
        vocab = train_vocabulary(descs, n_words=8, iters=2)
        db = KeyFrameDB(vocab, max_keyframes=16)
        K, W = 16, vocab.n_words
        query = np.zeros(W, np.float32)
        query[:4] = 0.25
        bows = np.zeros((K, W), np.float32)
        # group A: keyframes 1,2,3 moderately similar to the query
        for k in (1, 2, 3):
            bows[k, :4] = 0.15
            bows[k, 4 + (k % 4)] = 0.40
        # lone decoy 7: higher single score, no covisible support
        bows[7, :4] = 0.20
        bows[7, 5] = 0.20
        # keyframe 0: the query's own covisible neighbor, dissimilar (sets
        # minScore low, as a recent neighbor does in a real map)
        bows[0, 6] = 1.0
        db.bow = jnp.asarray(bows)
        db.valid = jnp.asarray([k in (0, 1, 2, 3, 7) for k in range(K)])
        covis = np.zeros((K, K), np.int32)
        for a in (1, 2, 3):
            for b in (1, 2, 3):
                if a != b:
                    covis[a, b] = 40
        covis[12, 0] = covis[0, 12] = 30
        cands, _ = detect_loop_candidates(
            db, jnp.asarray(query), 12, jnp.asarray(covis)
        )
        cands = [int(c) for c in np.asarray(cands) if c >= 0]
        assert cands and cands[0] in (1, 2, 3), cands
        assert 7 not in cands, "lone decoy survived the 0.75*bestAcc gate"

    def test_reloc_candidates(self):
        rng = np.random.default_rng(4)
        db, frames = self._build(rng)
        dd, vv = frames[5]
        bow = db.signature_of(dd, vv)
        cands, _ = detect_reloc_candidates(db, bow)
        assert int(np.asarray(cands)[0]) == 5

    def test_erase(self):
        rng = np.random.default_rng(5)
        db, frames = self._build(rng)
        db.erase(5)
        dd, vv = frames[5]
        bow = db.signature_of(dd, vv)
        cands, _ = detect_reloc_candidates(db, bow)
        assert int(np.asarray(cands)[0]) != 5
