"""Keyframe features + bag-of-words vocabulary.

Role of the reference's DBowInterfaceSurf + DBoW2 vocabulary
(src/backend/DBowInterfaceSurf.{h,cpp}): detect features per PR
keyframe, quantise descriptors into visual words, score frames for
loop-closure candidates with an inverted index + normalised similarity
(use_nss, alpha=0.3 — DBowInterfaceSurf.cpp:36-40).

Redesign: ORB (binary, patent-free) replaces SURF64; the vocabulary is
a flat k-means over binary descriptors (bit-majority centroids) built
in-repo — trainable from any sequence (reference vocab-creation mode,
:103-113) — and scoring is tf-idf L1 on sparse BoW vectors. Feature
extraction stays on host CPU exactly like the reference's backend
(its SURF is the PR thread's dominant cost, PlaceRecognition.cpp:71-79).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def detect_orb(gray: np.ndarray, n_features: int = 500):
    """-> (keypoints (N,2) float32 [u,v], descriptors (N,32) uint8)."""
    orb = cv2.ORB_create(nfeatures=n_features, fastThreshold=12)
    kps, desc = orb.detectAndCompute(gray, None)
    if desc is None or len(kps) == 0:
        return np.zeros((0, 2), np.float32), np.zeros((0, 32), np.uint8)
    pts = np.array([k.pt for k in kps], np.float32)
    return pts, desc


def hamming_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,32)x(M,32) uint8 -> (N,M) popcount distances."""
    x = np.bitwise_xor(a[:, None, :], b[None, :, :])
    return np.unpackbits(x, axis=2).sum(axis=2)


def match_ratio(
    desc_a: np.ndarray, desc_b: np.ndarray, ratio: float = 0.7
) -> np.ndarray:
    """2-NN ratio-test matching (reference FLANN 0.49*d2 squared-distance
    test, Surf3DTools.h:218-272; 0.7 linear ~= 0.49 squared).
    Returns (K,2) index pairs into (a,b)."""
    if len(desc_a) == 0 or len(desc_b) == 0:
        return np.zeros((0, 2), np.int64)
    d = hamming_dist(desc_a, desc_b).astype(np.float32)
    order = np.argsort(d, axis=1)
    best = order[:, 0]
    d1 = d[np.arange(len(d)), best]
    if d.shape[1] > 1:
        d2 = d[np.arange(len(d)), order[:, 1]]
    else:
        d2 = np.full_like(d1, np.inf)
    ok = d1 < ratio * np.maximum(d2, 1e-6)
    return np.stack([np.nonzero(ok)[0], best[ok]], axis=1)


class Vocabulary:
    """Flat k-means vocabulary over binary descriptors."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = centroids  # (K,32) uint8
        self.k = len(centroids)

    @staticmethod
    def train(descriptors: np.ndarray, k: int = 512, iters: int = 8,
              seed: int = 0) -> "Vocabulary":
        rng = np.random.default_rng(seed)
        n = len(descriptors)
        if n == 0:
            return Vocabulary(np.zeros((1, 32), np.uint8))
        k = min(k, max(1, n))
        cent = descriptors[rng.choice(n, k, replace=False)].copy()
        bits = np.unpackbits(descriptors, axis=1).astype(np.float32)  # (n,256)
        for _ in range(iters):
            d = hamming_dist(descriptors, cent)
            assign = d.argmin(axis=1)
            for c in range(k):
                sel = assign == c
                if sel.sum() == 0:
                    cent[c] = descriptors[rng.integers(n)]
                    continue
                maj = (bits[sel].mean(axis=0) > 0.5).astype(np.uint8)
                cent[c] = np.packbits(maj)
        return Vocabulary(cent)

    def save(self, path: str) -> None:
        """Persist centroids (.npy) — the role of the reference's
        DBoW2 vocabulary files (-v, DBowInterfaceSurf.cpp:103-113)."""
        np.save(path, self.centroids)

    @staticmethod
    def load(path: str) -> "Vocabulary":
        return Vocabulary(np.load(path).astype(np.uint8))

    def quantise(self, descriptors: np.ndarray) -> np.ndarray:
        if len(descriptors) == 0:
            return np.zeros(0, np.int32)
        return hamming_dist(descriptors, self.centroids).argmin(axis=1).astype(np.int32)


def train_vocab_from_klg(klg_path: str, out_path: str, k: int = 512,
                         frame_stride: int = 10, n_features: int = 500,
                         max_frames: int = -1, width: int = 640,
                         height: int = 480, seed: int = 0) -> Vocabulary:
    """Train and save a BoW vocabulary from a `.klg` sequence — the
    reference's vocabulary-creation mode (DBowInterfaceSurf.cpp:103-113)
    as one call. Samples every `frame_stride`-th frame's ORB
    descriptors, k-means-trains, saves `.npy` to `out_path`."""
    if cv2 is None:
        raise RuntimeError("train_vocab_from_klg requires cv2")
    from kintinuous_tpu.io.klg import KlgLogReader

    descs = []
    with KlgLogReader(klg_path, width=width, height=height,
                      max_frames=max_frames) as r:
        for f in r:
            if f.index % frame_stride or f.rgb is None:
                continue
            gray = cv2.cvtColor(f.rgb, cv2.COLOR_RGB2GRAY)
            _, d = detect_orb(gray, n_features)
            if len(d):
                descs.append(d)
    all_desc = np.concatenate(descs, axis=0) if descs else np.zeros((0, 32), np.uint8)
    vocab = Vocabulary.train(all_desc, k=k, seed=seed)
    vocab.save(out_path)
    return vocab


class BowDatabase:
    """tf-idf BoW scoring with an inverted index (DBoW2-style)."""

    def __init__(self, vocab: Vocabulary):
        self.vocab = vocab
        self.vectors: List[Dict[int, float]] = []
        self.inverted: Dict[int, List[int]] = {}
        self.doc_freq = np.zeros(vocab.k, np.float64)

    def _bow(self, words: np.ndarray) -> Dict[int, float]:
        if len(words) == 0:
            return {}
        uniq, cnt = np.unique(words, return_counts=True)
        n_docs = max(1, len(self.vectors))
        idf = np.log(n_docs / np.maximum(self.doc_freq[uniq], 1.0) + 1.0)
        v = cnt * idf
        norm = np.abs(v).sum()
        return {int(w): float(x / max(norm, 1e-12)) for w, x in zip(uniq, v)}

    def score(self, a: Dict[int, float], b: Dict[int, float]) -> float:
        """L1 similarity in [0,1]: 1 - 0.5*|va - vb|_1 over shared support."""
        s = 0.0
        for w, x in a.items():
            y = b.get(w)
            if y is not None:
                s += abs(x) + abs(y) - abs(x - y)
        return 0.5 * s

    def add(self, words: np.ndarray) -> int:
        v = self._bow(words)
        idx = len(self.vectors)
        self.vectors.append(v)
        for w in v:
            self.inverted.setdefault(w, []).append(idx)
            self.doc_freq[w] += 1
        return idx

    def query(self, words: np.ndarray, exclude_after: int) -> Tuple[int, float]:
        """Best match among entries with id < exclude_after.
        Returns (id, score) or (-1, 0)."""
        v = self._bow(words)
        cand: Dict[int, float] = {}
        for w in v:
            for idx in self.inverted.get(w, []):
                if idx < exclude_after:
                    cand[idx] = 0.0
        best_id, best_s = -1, 0.0
        for idx in cand:
            s = self.score(v, self.vectors[idx])
            if s > best_s:
                best_id, best_s = idx, s
        return best_id, best_s
