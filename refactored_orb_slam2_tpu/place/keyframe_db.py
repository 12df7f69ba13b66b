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

import functools

import jax
import jax.numpy as jnp

from .vocab import Vocabulary, assign_words, bow_score, bow_vector


@jax.jit
def _db_add_impl(vocab: Vocabulary, desc, feat_valid, bow, valid, kf_slot):
    """One fused program for KeyFrameDB.add: word assignment + tf-idf
    signature + bank update.  Eager per-op dispatch here costs several
    tunnel round trips per keyframe on the tracking thread."""
    words = assign_words(vocab, desc, feat_valid)
    v = bow_vector(vocab, words)
    return bow.at[kf_slot].set(v), valid.at[kf_slot].set(True), v


@jax.jit
def _db_signature_impl(vocab: Vocabulary, desc, feat_valid):
    return bow_vector(vocab, assign_words(vocab, desc, feat_valid))


class KeyFrameDB:
    """Host-managed dense signature bank (device arrays, functional ops)."""

    def __init__(self, vocab: Vocabulary, max_keyframes: int):
        self.vocab = vocab
        self.bow = jnp.zeros((max_keyframes, vocab.n_words), jnp.float32)
        self.valid = jnp.zeros((max_keyframes,), bool)

    def add(self, kf_slot: int, desc: jax.Array, feat_valid: jax.Array):
        self.bow, self.valid, v = _db_add_impl(
            self.vocab, desc, feat_valid, self.bow, self.valid,
            jnp.int32(kf_slot),
        )
        return v

    def erase(self, kf_slot: int):
        self.valid = self.valid.at[kf_slot].set(False)

    def signature_of(self, desc: jax.Array, feat_valid: jax.Array) -> jax.Array:
        return _db_signature_impl(self.vocab, desc, feat_valid)

    def scores(self, query_bow: jax.Array) -> jax.Array:
        """(K,) L1 similarity of the query against every stored keyframe."""
        s = bow_score(query_bow, self.bow)
        return jnp.where(self.valid, s, -1.0)


def _group_accumulate(
    scores: jax.Array,     # (K,) per-keyframe query similarity
    eligible: jax.Array,   # (K,) candidates allowed to contribute
    covis: jax.Array,      # (K, K) covisibility weights
    top_n: int = 10,
    min_weight: int = 15,
):
    """Covisibility-group score accumulation (KeyFrameDatabase.cc:120-193).

    For each eligible keyframe, accumulate the scores of its top-``top_n``
    covisible neighbors that are themselves eligible (the reference's
    GetBestCovisibilityKeyFrames(10) group), and record the group's
    best-scoring member — the keyframe the reference actually returns.

    Returns (acc (K,), best_member (K,), best_member_score (K,)).
    """
    K = scores.shape[0]
    w, nb = jax.lax.top_k(covis, min(top_n, K))                   # (K, n)
    s_e = jnp.where(eligible, scores, 0.0)
    nb_scores = jnp.where(w >= min_weight, jnp.take(s_e, nb), 0.0)
    acc = s_e + jnp.sum(nb_scores, axis=1)
    member_scores = jnp.concatenate([s_e[:, None], nb_scores], axis=1)
    member_idx = jnp.concatenate(
        [jnp.arange(K, dtype=nb.dtype)[:, None], nb], axis=1
    )
    best = jnp.argmax(member_scores, axis=1)
    best_member = jnp.take_along_axis(member_idx, best[:, None], axis=1)[:, 0]
    best_member_score = jnp.take_along_axis(
        member_scores, best[:, None], axis=1
    )[:, 0]
    return acc, best_member.astype(jnp.int32), best_member_score


def _best_of_groups(acc, eligible, best_member, best_member_score, K,
                    max_candidates):
    """Keep groups with accumulated score >= 0.75 * best, return each kept
    group's best member, deduplicated (KeyFrameDatabase.cc:160-193)."""
    acc_e = jnp.where(eligible, acc, -1.0)
    best_acc = jnp.max(acc_e)
    keep_group = eligible & (acc_e >= 0.75 * best_acc) & (acc_e > 0)
    # scatter-dedupe: per returned keyframe, its best member-score
    per_kf = jnp.full((K + 1,), -1.0).at[
        jnp.where(keep_group, best_member, K)
    ].max(jnp.where(keep_group, best_member_score, -1.0), mode="drop")[:K]
    top_s, top_i = jax.lax.top_k(per_kf, max_candidates)
    return jnp.where(top_s > 0, top_i, -1).astype(jnp.int32), top_s


def detect_loop_candidates(
    db: KeyFrameDB,
    query_bow: jax.Array,
    query_kf: int,
    covis: jax.Array,            # (K, K) covisibility weight matrix
    *,
    max_candidates: int = 8,
):
    """Loop candidates for ``query_kf`` (KeyFrameDatabase.cc:72-193).

    minScore = min similarity between the query and its covisible neighbors
    (LoopClosing.cc:112-129); neighbors themselves and the query are
    excluded; candidate scores are accumulated over covisibility groups and
    each group above 0.75 * bestAccScore returns its best member.
    Returns (candidate_slots (C,), scores (C,)) with -1 padding.
    """
    return _loop_candidates_impl(
        db.bow, db.valid, query_bow, jnp.int32(query_kf), covis,
        max_candidates=max_candidates,
    )


@functools.partial(jax.jit, static_argnames=("max_candidates",))
def _loop_candidates_impl(bow_bank, valid, query_bow, query_kf, covis,
                          *, max_candidates: int):
    """Single fused program for loop-candidate retrieval (the eager form
    dispatched ~15 ops per keyframe through the tunnel)."""
    K = bow_bank.shape[0]
    scores = jnp.where(valid, bow_score(query_bow, bow_bank), -1.0)
    row = covis[query_kf]
    neighbor = row > 0
    # minScore pool = the *connected* neighbors (weight >= 15, the
    # reference's GetVectorCovisibleKeyFrames, KeyFrame.cc:310 +
    # LoopClosing.cc:112-129); barely-overlapping keyframes would drag the
    # floor down to the noise level and flood the candidate set
    connected = row >= 15
    min_score_pool = jnp.where(connected, scores, jnp.inf)
    min_score = jnp.minimum(jnp.min(min_score_pool), 1.0)
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 0.0)

    eligible = (
        valid
        & ~neighbor
        & (jnp.arange(K) != query_kf)
        & (scores >= jnp.maximum(min_score, 0.0))
        & (scores > 0)
    )
    acc, best_member, bm_score = _group_accumulate(scores, eligible, covis)
    return _best_of_groups(
        acc, eligible, best_member, bm_score, K, max_candidates
    )


def detect_reloc_candidates(
    db: KeyFrameDB,
    query_bow: jax.Array,
    covis: jax.Array | None = None,
    *,
    max_candidates: int = 5,
):
    """Relocalization candidates for a lost frame — same group-accumulated
    shape without the minScore gate (KeyFrameDatabase.cc:195-304)."""
    if covis is None:
        return _reloc_candidates_flat_impl(
            db.bow, db.valid, query_bow, max_candidates=max_candidates
        )
    return _reloc_candidates_impl(
        db.bow, db.valid, query_bow, covis, max_candidates=max_candidates
    )


@functools.partial(jax.jit, static_argnames=("max_candidates",))
def _reloc_candidates_flat_impl(bow_bank, valid, query_bow,
                                *, max_candidates: int):
    scores = jnp.where(valid, bow_score(query_bow, bow_bank), -1.0)
    eligible = valid & (scores > 0)
    s = jnp.where(eligible, scores, -1.0)
    best = jnp.max(s)
    keep = eligible & (s >= 0.75 * best)
    top_s, top_i = jax.lax.top_k(jnp.where(keep, s, -1.0), max_candidates)
    return jnp.where(top_s > 0, top_i, -1).astype(jnp.int32), top_s


@functools.partial(jax.jit, static_argnames=("max_candidates",))
def _reloc_candidates_impl(bow_bank, valid, query_bow, covis,
                           *, max_candidates: int):
    K = bow_bank.shape[0]
    scores = jnp.where(valid, bow_score(query_bow, bow_bank), -1.0)
    eligible = valid & (scores > 0)
    acc, best_member, bm_score = _group_accumulate(scores, eligible, covis)
    return _best_of_groups(
        acc, eligible, best_member, bm_score, K, max_candidates
    )
