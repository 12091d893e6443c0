"""Loop-closure detection pipeline.

Rebuild of src/backend/PlaceRecognition.{h,cpp} + Surf3DTools.h +
PNPSolver.{h,cpp} + DepthCamera.{h,cpp}:

  keyframe gating     <- motion threshold 0.15 (KintinuousTracker.cpp:76,
                         :605-624), handled by the caller
  detection           <- DBoW query + nss-style relative score
  loop throttle 30 s  <- PlaceRecognition.cpp:118-123
  descriptor matching <- FLANN 2-NN ratio test (Surf3DTools.h:218-272)
  >= 40 matches gate  <- PlaceRecognition.cpp:152
  relative pose       <- solvePnPRansac (PNPSolver.cpp:56-65) REPLACED by
                         3D-3D Umeyama RANSAC: depth exists on both
                         sides, so the minimal solver is a 3-point rigid
                         fit — simpler and fully vectorisable
  inlier ratio 0.35   <- PlaceRecognition.cpp:179
  verification ICP    <- icpDepthFrames (PCL ICP-NL, score < 0.01,
                         :191-196,238-276), re-implemented as
                         point-to-point Umeyama ICP on voxel-downsampled
                         clouds with a scipy KD-tree

Emits LoopConstraint records consumed by the deformation runner
(reference LoopClosureConstraint.h).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np
from scipy.spatial import cKDTree

from kintinuous_tpu.config import CameraIntrinsics, KintinuousConfig
from kintinuous_tpu.backend.features import (
    BowDatabase,
    Vocabulary,
    detect_orb,
    match_ratio,
)
from kintinuous_tpu.backend.slice_proc import voxel_downsample
from kintinuous_tpu.eval.ate import align_umeyama


PR_RING = 3000  # keyframe ring capacity (KintinuousTracker.h:142-143)


@dataclass
class Keyframe:
    """PR keyframe. Depth is stored zlib-compressed uint16 mm exactly as
    the reference compresses keyframes to bound the 3000-slot ring's
    memory (PlaceRecognitionInput.h:72-140): ~60 KB/keyframe instead of
    a 1.2 MB float map; decompressed only for verification ICP."""

    kf_id: int
    timestamp_us: int
    pose: np.ndarray  # (4,4) global camera pose at capture
    keypoints: np.ndarray  # (N,2)
    descriptors: np.ndarray  # (N,32)
    points3d: np.ndarray  # (N,3) camera-frame backprojections (NaN invalid)
    depth_z: bytes  # zlib(uint16 depth mm)
    depth_shape: tuple
    # jpeg-compressed rgb, like the reference keyframe ring
    # (PlaceRecognitionInput.h:72-140) — kept for loop-failure debugging
    # and future appearance-based verification; empty when unavailable
    rgb_jpg: bytes = b""

    @property
    def depth_m(self) -> np.ndarray:
        import zlib

        return (
            np.frombuffer(zlib.decompress(self.depth_z), np.uint16)
            .reshape(self.depth_shape)
            .astype(np.float32)
            / 1000.0
        )

    @property
    def rgb(self) -> Optional[np.ndarray]:
        """(H,W,3) uint8 RGB, or None when not retained."""
        if not self.rgb_jpg:
            return None
        import cv2

        bgr = cv2.imdecode(
            np.frombuffer(self.rgb_jpg, np.uint8), cv2.IMREAD_COLOR
        )
        return bgr[:, :, ::-1].copy() if bgr is not None else None


@dataclass
class LoopConstraint:
    """reference LoopClosureConstraint.h:28-48."""

    time1: int
    time2: int
    T_1_2: np.ndarray  # (4,4): frame-2 camera expressed in frame-1's frame
    inliers1: np.ndarray  # (K,3) matched points, frame-1 camera coords
    inliers2: np.ndarray  # (K,3) matched points, frame-2 camera coords
    icp_score: float
    kf_id1: int = -1
    kf_id2: int = -1


def backproject(cam: CameraIntrinsics, depth_m: np.ndarray, uv: np.ndarray):
    """Per-keypoint 3D camera-frame points (reference
    Surf3DTools::calculate3dPointsSURF, Surf3DTools.h:66-103)."""
    u = np.clip(np.round(uv[:, 0]).astype(int), 0, cam.width - 1)
    v = np.clip(np.round(uv[:, 1]).astype(int), 0, cam.height - 1)
    z = depth_m[v, u]
    valid = z > 0
    x = (uv[:, 0] - cam.cx) / cam.fx * z
    y = (uv[:, 1] - cam.cy) / cam.fy * z
    pts = np.stack([x, y, z], axis=1)
    pts[~valid] = np.nan
    return pts


def umeyama_ransac(
    src: np.ndarray,
    dst: np.ndarray,
    iters: int = 500,
    thresh: float = 0.05,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """RANSAC rigid fit dst ~= R src + t with 3-point Umeyama minimal
    solver (replaces solvePnPRansac, PNPSolver.cpp:56-65; 500 iters
    matches the reference's budget). Returns (T (4,4), inlier mask)."""
    n = len(src)
    rng = np.random.default_rng(seed)
    best_mask = np.zeros(n, bool)
    if n < 3:
        return np.eye(4), best_mask
    idx = rng.integers(0, n, size=(iters, 3))
    # vectorised 3-point Kabsch
    s = src[idx]  # (I,3,3)
    d = dst[idx]
    mu_s = s.mean(axis=1, keepdims=True)
    mu_d = d.mean(axis=1, keepdims=True)
    cov = np.einsum("iab,iac->ibc", d - mu_d, s - mu_s)
    U, _, Vt = np.linalg.svd(cov)
    det = np.linalg.det(np.einsum("iab,ibc->iac", U, Vt))
    S = np.tile(np.eye(3), (iters, 1, 1))
    S[:, 2, 2] = np.sign(det)
    R = np.einsum("iab,ibc,icd->iad", U, S, Vt)
    t = mu_d.squeeze(1) - np.einsum("iab,ib->ia", R, mu_s.squeeze(1))
    # score all hypotheses
    pred = np.einsum("iab,nb->ina", R, src) + t[:, None, :]
    err = np.linalg.norm(pred - dst[None], axis=2)
    inl = err < thresh
    counts = inl.sum(axis=1)
    best = int(np.argmax(counts))
    best_mask = inl[best]
    if best_mask.sum() >= 3:
        _, Rf, tf = align_umeyama(src[best_mask], dst[best_mask])
        T = np.eye(4)
        T[:3, :3] = Rf
        T[:3, 3] = tf
    else:
        T = np.eye(4)
    return T, best_mask


def verification_icp(
    cam: CameraIntrinsics,
    depth1: np.ndarray,
    depth2: np.ndarray,
    T_init: np.ndarray,
    leaf: float = 0.05,
    iters: int = 10,
) -> Tuple[np.ndarray, float]:
    """Point-to-point ICP of cloud2 onto cloud1 starting at T_init
    (reference icpDepthFrames, PlaceRecognition.cpp:238-276).
    Returns (refined T, mean squared distance score)."""

    def cloud(depth):
        H, W = depth.shape
        u, v = np.meshgrid(np.arange(W), np.arange(H))
        z = depth
        ok = z > 0
        pts = np.stack(
            [(u - cam.cx) / cam.fx * z, (v - cam.cy) / cam.fy * z, z], axis=-1
        )[ok]
        p, _, _ = voxel_downsample(pts, None, None, leaf)
        return p

    c1 = cloud(depth1)
    c2 = cloud(depth2)
    if len(c1) < 20 or len(c2) < 20:
        return T_init, np.inf
    tree = cKDTree(c1)
    T = T_init.copy()
    score = np.inf
    for _ in range(iters):
        moved = c2 @ T[:3, :3].T + T[:3, 3]
        dist, nn = tree.query(moved, workers=-1)
        keep = dist < 3 * leaf
        if keep.sum() < 10:
            break
        _, R, t = align_umeyama(moved[keep], c1[nn[keep]])
        dT = np.eye(4)
        dT[:3, :3] = R
        dT[:3, 3] = t
        T = dT @ T
        score = float(np.mean(dist[keep] ** 2))
    return T, score


class PlaceRecognition:
    """Keyframe database + loop detection (the reference's PR thread)."""

    def __init__(self, cfg: KintinuousConfig, vocab: Optional[Vocabulary] = None):
        self.cfg = cfg
        self.cam = cfg.camera
        if vocab is None and cfg.vocab_file:
            # pre-trained vocabulary (-v flag; the reference loads a
            # DBoW2 vocab file, DBowInterfaceSurf.cpp:33-42)
            import os

            if os.path.exists(cfg.vocab_file):
                vocab = Vocabulary.load(cfg.vocab_file)
        self.vocab = vocab
        self.db: Optional[BowDatabase] = None
        # global kf id of db index 0: the db is built incrementally from
        # process start (base 0), but a db REBUILT from the keyframe
        # ring (checkpoint restore, _ensure_db) starts at the ring's
        # base — without this offset every candidate id after a resume
        # past PR_RING keyframes was misindexed (ADVICE r3)
        self._db_base = 0
        self.keyframes: List[Keyframe] = []
        self._next_kf_id = 0
        self.constraints: List[LoopConstraint] = []
        self._pending_desc: List[np.ndarray] = []
        self._last_loop_time_us = -int(1e18)
        self._recent_window = cfg.pr_recent_window
        # per-gate rejection counters (debugging loop recall at scale)
        self.gate_stats = {
            "keyframes": 0, "no_candidate": 0, "nss": 0, "throttle": 0,
            "ring": 0, "matches": 0, "inliers": 0, "icp": 0, "accepted": 0,
        }

    def _ensure_db(self):
        if self.db is None:
            if self.vocab is None:
                # bootstrap the vocabulary from early keyframes
                if len(self._pending_desc) < 5:
                    return False
                alld = np.concatenate(
                    [d for d in self._pending_desc if len(d)]
                    or [np.zeros((0, 32), np.uint8)]
                )
                if len(alld) < 64:
                    return False
                self.vocab = Vocabulary.train(alld, k=min(512, max(64, len(alld) // 4)))
            self.db = BowDatabase(self.vocab)
            for kf in self.keyframes:
                self.db.add(self.vocab.quantise(kf.descriptors))
            self._db_base = self._next_kf_id - len(self.keyframes)
        return True

    def add_keyframe(
        self,
        rgb: np.ndarray,  # (H,W,3) uint8
        depth_m: np.ndarray,
        pose: np.ndarray,
        timestamp_us: int,
    ) -> Optional[LoopConstraint]:
        """Add a PR keyframe; returns a verified LoopConstraint when a
        loop closure is detected and survives all gates."""
        import cv2

        gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
        kps, desc = detect_orb(gray)
        pts3d = backproject(self.cam, depth_m, kps) if len(kps) else np.zeros((0, 3))
        import zlib

        depth_mm = np.clip(depth_m * 1000.0, 0, 65535).astype(np.uint16)
        ok_jpg, jpg = cv2.imencode(
            ".jpg", rgb[:, :, ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), 85]
        )
        kf = Keyframe(
            kf_id=self._next_kf_id,
            timestamp_us=timestamp_us,
            pose=pose.copy(),
            keypoints=kps,
            descriptors=desc,
            points3d=pts3d,
            depth_z=zlib.compress(depth_mm.tobytes(), 1),
            depth_shape=depth_mm.shape,
            rgb_jpg=jpg.tobytes() if ok_jpg else b"",
        )
        self._next_kf_id += 1
        self.keyframes.append(kf)
        if len(self.keyframes) > PR_RING:  # ring semantics (:142-143)
            self.keyframes = self.keyframes[-PR_RING:]
        self._pending_desc.append(desc)

        self.gate_stats["keyframes"] += 1
        if not self._ensure_db():
            return None
        words = self.vocab.quantise(desc)
        # exclusion + candidate ids are GLOBAL kf ids shifted into the
        # db's index space by _db_base
        cand_id, score = self.db.query(
            words,
            exclude_after=self._next_kf_id - 1 - self._recent_window
            - self._db_base,
        )
        self.db.add(words)

        if cand_id < 0:
            self.gate_stats["no_candidate"] += 1
            return None
        cand_id += self._db_base
        # nss-style normalisation against the previous keyframe's score
        prev = self.keyframes[-2] if len(self.keyframes) >= 2 else None
        if prev is not None:
            s_prev = self.db.score(
                self.db.vectors[-1], self.db.vectors[-2]
            )
            nss = score / max(s_prev, 1e-6)
        else:
            nss = 0.0
        if nss < self.cfg.pr_nss_alpha:
            self.gate_stats["nss"] += 1
            return None
        # loop throttle (PlaceRecognition.cpp:118-123)
        if timestamp_us - self._last_loop_time_us < self.cfg.loop_throttle_s * 1e6:
            self.gate_stats["throttle"] += 1
            return None
        base = self._next_kf_id - len(self.keyframes)
        if cand_id < base:  # candidate fell off the ring
            self.gate_stats["ring"] += 1
            return None
        constraint = self._verify(self.keyframes[cand_id - base], kf)
        if constraint is not None:
            self.gate_stats["accepted"] += 1
            self._last_loop_time_us = timestamp_us
            self.constraints.append(constraint)
        return constraint

    def _verify(self, kf1: Keyframe, kf2: Keyframe) -> Optional[LoopConstraint]:
        cfg = self.cfg
        pairs = match_ratio(kf1.descriptors, kf2.descriptors)
        if len(pairs) == 0:
            return None
        p1 = kf1.points3d[pairs[:, 0]]
        p2 = kf2.points3d[pairs[:, 1]]
        ok = np.isfinite(p1).all(axis=1) & np.isfinite(p2).all(axis=1)
        p1, p2 = p1[ok], p2[ok]
        if len(p1) < cfg.loop_min_matches:  # >= 40 gate (:152)
            self.gate_stats["matches"] += 1
            return None
        # T maps frame-2 camera points into frame-1 camera frame
        T, inl = umeyama_ransac(p2, p1)
        if inl.sum() < 3 or inl.sum() / len(p1) < cfg.inlier_ratio:  # (:179)
            self.gate_stats["inliers"] += 1
            return None
        T_ref, score = verification_icp(self.cam, kf1.depth_m, kf2.depth_m, T)
        if score > cfg.loop_icp_score:  # < 0.01 gate (:191-196)
            self.gate_stats["icp"] += 1
            return None
        return LoopConstraint(
            time1=kf1.timestamp_us,
            time2=kf2.timestamp_us,
            T_1_2=T_ref,
            inliers1=p1[inl],
            inliers2=p2[inl],
            icp_score=score,
            kf_id1=kf1.kf_id,
            kf_id2=kf2.kf_id,
        )
