"""Visual vocabulary for place recognition, TPU-native.

Replaces DBoW2's hierarchical k=10/L=6 tree (TemplatedVocabulary.h) and the
reference's 1M-word ORBvoc asset (absent from the snapshot — the framework
must ship its own, SURVEY §2.2).  Design per the BASELINE "dense
vocabulary-cell scoring" plan: a FLAT vocabulary of W binary cell centers;
descriptor->word assignment is a single packed-Hamming argmin expressed as a
±1 matmul on the MXU (the tree's log-time descent buys nothing when the
whole distance matrix is one matmul); keyframe signatures are L1-normalized
tf-idf histograms (same scoring as DBoW2's ScoringObject L1 norm), and
database queries are one matvec against the keyframe bank.

Training: k-medians in Hamming space with bitwise-majority means
(FORB::meanValue semantics, DBoW2/FORB.cpp:24-56), initialized by random
sampling — equivalent quality to DBoW2's k-means++ per-level clustering at
the scales used here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.descriptors import hamming_matmul, mean_descriptor, pack_bits, unpack_pm1


class Vocabulary(NamedTuple):
    words: jax.Array      # (W, 8) uint32 cell centers
    words_pm1: jax.Array  # (W, 256) ±1 planes (cached for matmul assignment)
    idf: jax.Array        # (W,) inverse-document-frequency weights

    @property
    def n_words(self) -> int:
        return self.words.shape[0]


def train_vocabulary(
    descriptors: np.ndarray, n_words: int = 1024, iters: int = 8, seed: int = 0
) -> Vocabulary:
    """k-medians clustering of packed descriptors (N, 8) -> W cells."""
    rng = np.random.default_rng(seed)
    n = descriptors.shape[0]
    centers = descriptors[rng.choice(n, n_words, replace=n < n_words)]
    desc_j = jnp.asarray(descriptors)
    desc_pm1 = unpack_pm1(desc_j, dtype=jnp.bfloat16)

    for _ in range(iters):
        c_pm1 = unpack_pm1(jnp.asarray(centers), dtype=jnp.bfloat16)
        d = hamming_matmul(desc_pm1, c_pm1)          # (N, W)
        assign = jnp.argmin(d, axis=1)
        # majority-bit mean per cluster
        from ..ops.descriptors import unpack_bits

        bits = unpack_bits(desc_j).astype(jnp.int32)          # (N, 256)
        counts = jax.ops.segment_sum(bits, assign, num_segments=n_words)
        sizes = jax.ops.segment_sum(
            jnp.ones((n,), jnp.int32), assign, num_segments=n_words
        )
        maj = (2 * counts >= jnp.maximum(sizes, 1)[:, None]).astype(jnp.uint8)
        new_centers = np.array(pack_bits(maj))  # writable copy
        # keep old center for empty clusters
        empty = np.asarray(sizes) == 0
        new_centers[empty] = centers[empty]
        centers = new_centers

    # idf from the training corpus (TemplatedVocabulary::setWeights analog)
    c_pm1 = unpack_pm1(jnp.asarray(centers), dtype=jnp.bfloat16)
    d = hamming_matmul(desc_pm1, c_pm1)
    assign = np.asarray(jnp.argmin(d, axis=1))
    df = np.bincount(assign, minlength=n_words).astype(np.float32)
    idf = np.log(n / np.maximum(df, 1.0)).astype(np.float32)
    return Vocabulary(
        words=jnp.asarray(centers),
        words_pm1=jnp.asarray(np.asarray(c_pm1)),
        idf=jnp.asarray(idf),
    )


def save_vocabulary(vocab: Vocabulary, path: str):
    np.savez_compressed(
        path, words=np.asarray(vocab.words), idf=np.asarray(vocab.idf)
    )


def load_vocabulary(path: str) -> Vocabulary:
    z = np.load(path)
    words = jnp.asarray(z["words"])
    return Vocabulary(
        words=words,
        words_pm1=unpack_pm1(words, dtype=jnp.bfloat16),
        idf=jnp.asarray(z["idf"]),
    )


def assign_words(vocab: Vocabulary, desc: jax.Array, valid: jax.Array) -> jax.Array:
    """(N, 8) descriptors -> (N,) word ids (-1 for invalid slots)."""
    d = hamming_matmul(unpack_pm1(desc, dtype=jnp.bfloat16), vocab.words_pm1)
    w = jnp.argmin(d, axis=1).astype(jnp.int32)
    return jnp.where(valid, w, -1)


def bow_vector(vocab: Vocabulary, word_ids: jax.Array) -> jax.Array:
    """Word ids (N,) -> L1-normalized tf-idf signature (W,).

    Matches DBoW2 TF_IDF weighting + L1 normalization
    (TemplatedVocabulary.h transform + BowVector::normalize).
    """
    W = vocab.n_words
    ok = word_ids >= 0
    idx = jnp.where(ok, word_ids, W)
    # one-hot reduction instead of segment_sum: XLA serializes scattered
    # segment sums on TPU; the (N, W+1) one-hot sum is a vector reduce
    tf = jnp.sum(jax.nn.one_hot(idx, W + 1, dtype=jnp.float32), axis=0)[:W]
    v = tf * vocab.idf
    s = jnp.sum(v)
    return v / jnp.where(s > 0, s, 1.0)


def bow_score(a: jax.Array, b: jax.Array) -> jax.Array:
    """L1 similarity score in [0, 1] between L1-normalized BoW vectors.

    s = 1 - 0.5 * |a - b|_1  (DBoW2 L1Scoring, ScoringObject.cpp:23-40);
    batched: a (W,) vs b (..., W).
    """
    return 1.0 - 0.5 * jnp.sum(jnp.abs(a - b), axis=-1)
