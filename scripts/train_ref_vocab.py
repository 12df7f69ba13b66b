#!/usr/bin/env python
"""Train a hierarchical ORB vocabulary and write it in DBoW2 text format
for the REFERENCE binaries (ORBVocabulary::loadFromTextFile,
/root/reference/.../ORBVocabulary.cc:11-127).

The reference snapshot ships no ORBvoc.txt blob (only the install rule), so
to run the reference for BASELINE.md we must supply one.  Descriptors come
from OpenCV's own ORB on rendered fixture images — the same detector family
the reference uses — so both systems get a domain-matched vocabulary.

Format (ORBVocabulary.cc:22-127):
    line 0:  k L scoring weighting        (e.g. "10 4 0 0" = L1, TF-IDF)
    line n:  parent_id is_leaf d0 .. d31 weight
Nodes appear parent-before-child; ids are implicit (1-based in file order,
root = 0).  Tree: k-branching, depth L, node descriptor = bitwise-majority
(FORB::meanValue), leaf weight = idf over the training corpus
(TemplatedVocabulary::setNodeWeights semantics).

Usage:
    python scripts/train_ref_vocab.py --images /tmp/fix/tum_room/rgb \
        [--images dir2 ...] --k 10 --L 4 --out /tmp/refvoc/ORBvoc.txt
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def collect_descriptors(dirs, per_image=800, max_images=400, seed=0):
    import cv2

    orb = cv2.ORB_create(nfeatures=per_image)
    rng = np.random.default_rng(seed)
    descs = []
    files = []
    for d in dirs:
        for root, _, names in os.walk(d):
            for n in sorted(names):
                if n.lower().endswith((".png", ".jpg", ".jpeg")):
                    files.append(os.path.join(root, n))
    if len(files) > max_images:
        files = [files[i] for i in
                 rng.choice(len(files), max_images, replace=False)]
    for path in files:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        _, des = orb.detectAndCompute(img, None)
        if des is not None and len(des):
            descs.append(des)
    if not descs:
        raise SystemExit("no descriptors found")
    out = np.concatenate(descs, axis=0).astype(np.uint8)
    print(f"collected {len(out)} descriptors from {len(files)} images")
    return out


def majority_descriptor(descs):
    """FORB::meanValue: bitwise majority vote (FORB.cpp:40-80)."""
    bits = np.unpackbits(descs, axis=1)               # (n, 256)
    return np.packbits(bits.sum(0) * 2 >= len(descs), axis=0)


def hamming(a, b):
    """(n, m) popcount Hamming between uint8 descriptor matrices."""
    x = np.bitwise_xor(a[:, None, :], b[None, :, :])
    return np.unpackbits(x, axis=2).sum(2)


def kmedians(descs, k, rng, iters=8):
    """Binary k-medians (k-majority) clustering; returns centers + labels."""
    n = len(descs)
    if n <= k:
        return descs.copy(), np.arange(n)
    centers = descs[rng.choice(n, k, replace=False)]
    labels = None
    for _ in range(iters):
        d = hamming(descs, centers)
        new_labels = d.argmin(1)
        if labels is not None and (new_labels == labels).all():
            break
        labels = new_labels
        for j in range(k):
            m = labels == j
            if m.any():
                centers[j] = majority_descriptor(descs[m])
            else:  # dead center: reseed at the farthest descriptor
                centers[j] = descs[d.min(1).argmax()]
    return centers, labels


def build_tree(descs, k, L, seed=1):
    """Recursive hierarchical clustering.  Returns a list of nodes:
    (parent_id, is_leaf, descriptor, member_index_array)."""
    rng = np.random.default_rng(seed)
    nodes = []          # file order; ids are 1-based = index+1

    def recurse(idx, parent_id, depth):
        sub = descs[idx]
        centers, labels = kmedians(sub, k, rng)
        for j in range(len(centers)):
            members = idx[labels == j] if len(sub) > k else idx[j:j + 1]
            if len(members) == 0:
                continue
            is_leaf = depth == L or len(members) <= 1
            nodes.append([parent_id, is_leaf, centers[j], members])
            nid = len(nodes)  # 1-based id of the node just added
            if not is_leaf:
                recurse(members, nid, depth + 1)

    recurse(np.arange(len(descs)), 0, 1)
    return nodes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", action="append", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--per-image", type=int, default=800)
    ap.add_argument("--max-images", type=int, default=400)
    ap.add_argument("--out", required=True)
    ap.add_argument("--binary-out", default=None,
                    help="also write the reference's binary cache format")
    args = ap.parse_args()

    descs = collect_descriptors(args.images, args.per_image, args.max_images)
    nodes = build_tree(descs, args.k, args.L)
    n_leaves = sum(1 for nd in nodes if nd[1])
    print(f"tree: {len(nodes)} nodes, {n_leaves} leaves")

    # idf weights: for each leaf, weight = log(N_docs / n_docs_with_word).
    # Approximate documents by chunking the corpus into pseudo-images of the
    # training batch size (TemplatedVocabulary::setNodeWeights uses the real
    # image partition; the chunking only perturbs idf slightly).
    chunk = max(1, args.per_image // 2)
    n_docs = max(1, len(descs) // chunk)
    doc_of = np.arange(len(descs)) // chunk
    weights = []
    for nd in nodes:
        if nd[1]:
            docs = np.unique(doc_of[nd[3]])
            ni = max(1, len(docs))
            weights.append(np.log(max(n_docs, 2) / ni))
        else:
            weights.append(0.0)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(f"{args.k} {args.L} 0 0\n")    # L1_NORM, TF_IDF
        for nd, w in zip(nodes, weights):
            dstr = " ".join(str(int(b)) for b in nd[2])
            f.write(f"{nd[0]} {1 if nd[1] else 0} {dstr} {w:.6f}\n")
    print(f"wrote {args.out}")
    if args.binary_out:
        text_to_binary(args.out, args.binary_out)
        print(f"wrote {args.binary_out}")


def text_to_binary(txt_path: str, bin_path: str):
    """Convert the DBoW2 text vocabulary into the reference's binary cache
    format (ORBVocabulary::saveToBinaryFile, ORBVocabulary.cc:218-243):
    header (uint32 nb_nodes incl. root, uint32 size_node=41, int32 k, L,
    scoring, weighting) then per node: int32 parent, 32 desc bytes,
    float32 weight, uint8 is_leaf.

    The reference example binaries load the vocabulary from a compile-time
    DEFAULT_BINARY_ORB_VOCABULARY path (Source/CMakeLists.txt:26-31), so
    baseline runs install this file at <Install>/var/lib/orbslam2/ORBvoc.bin.
    """
    import struct

    with open(txt_path) as f:
        k, L, scoring, weighting = (int(x) for x in f.readline().split())
        nodes = []
        for line in f:
            v = line.split()
            if not v:
                continue
            nodes.append((int(v[0]), bytes(int(x) for x in v[2:34]),
                          float(v[34]), int(v[1])))
    os.makedirs(os.path.dirname(os.path.abspath(bin_path)), exist_ok=True)
    with open(bin_path, "wb") as f:
        f.write(struct.pack("<IIiiii", len(nodes) + 1, 41, k, L,
                            scoring, weighting))
        for parent, desc, weight, is_leaf in nodes:
            f.write(struct.pack("<i", parent))
            f.write(desc)
            f.write(struct.pack("<f", weight))
            f.write(struct.pack("<B", 1 if is_leaf else 0))


if __name__ == "__main__":
    main()
