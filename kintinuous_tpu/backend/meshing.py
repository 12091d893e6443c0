"""Mesh generation + stitching.

Role of src/backend/MeshGenerator.{h,cpp}: the reference triangulates
each cloud slice with PCL greedy projection (:193-227) and merges
per-slice meshes with index offsetting at save (:37-191). Here meshes
come from the volumetric surface-nets extractor (ops/surface_nets.py);
MeshCollector stitches per-slice patches and the live volume into one
indexed .ply.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kintinuous_tpu.config import KintinuousConfig
from kintinuous_tpu.io.ply import save_ply
from kintinuous_tpu.ops.surface_nets import extract_mesh


@dataclass
class MeshPatch:
    vertices: np.ndarray  # (N,3)
    colors: np.ndarray  # (N,3) uint8
    faces: np.ndarray  # (M,3)
    timestamp_us: int = 0
    # (N,3) i32 global integer cell coords (surface-nets vertex <-> cell
    # bijection, ops/surface_nets.py) enabling seam welding; None for
    # meshes without cell identity (legacy offset-merge fallback)
    cells: Optional[np.ndarray] = None


def _cell_keys(cells: np.ndarray) -> np.ndarray:
    """(N,3) i32 global cell coords -> (N,) i64 unique keys."""
    O = np.int64(1) << 20  # coords are |x| << 2^20 cells
    c = cells.astype(np.int64) + O
    M = np.int64(1) << 21
    return (c[:, 2] * M + c[:, 1]) * M + c[:, 0]


def weld_patches(patches: List[MeshPatch]):
    """Stitch band patches into one seamless indexed mesh by GLOBAL CELL
    identity: overlapping shift bands re-extract the same cells, so the
    union welds to one vertex per cell (newest patch wins — it fused
    more frames) and duplicate seam quads collapse. This replaces
    UGP3's FRINGE/BOUNDARY advancing-front stitching (UGP3.cpp:1642-1665)
    with a pure array pass. Returns (vertices f32, colors u8, faces i32).
    """
    verts = np.concatenate([p.vertices for p in patches]).astype(np.float32)
    cols = np.concatenate([p.colors for p in patches]).astype(np.uint8)
    keys = np.concatenate([_cell_keys(p.cells) for p in patches])
    face_keys = np.concatenate(
        [_cell_keys(p.cells)[p.faces] for p in patches]
    )  # (F,3) i64

    # newest occurrence of each cell wins
    uk, ridx = np.unique(keys[::-1], return_index=True)
    sel = len(keys) - 1 - ridx  # row of the LAST occurrence per unique key
    new_verts = verts[sel]
    new_cols = cols[sel]
    fidx = np.searchsorted(uk, face_keys).astype(np.int32)  # (F,3)
    # drop exact-duplicate seam quads (same cells re-emitted by the
    # overlapping band of a later shift)
    faces = np.unique(fidx, axis=0) if len(fidx) else fidx
    return new_verts, new_cols, faces


class MeshCollector:
    """Accumulates mesh patches; cell-welded merge save (the seamless
    version of MeshGenerator::save's offset concat, :37-191)."""

    def __init__(self):
        self.patches: List[MeshPatch] = []

    def add(self, patch: MeshPatch):
        self.patches.append(patch)

    @property
    def n_triangles(self) -> int:
        return sum(len(p.faces) for p in self.patches)

    def save(self, path: str) -> int:
        patches = [p for p in self.patches if len(p.vertices)]
        if not patches:
            save_ply(path, np.zeros((0, 3), np.float32))
            return 0
        if all(p.cells is not None for p in patches):
            verts, cols, faces = weld_patches(patches)
            save_ply(path, verts, cols, None, faces.astype(np.int32))
            return len(verts)
        verts, cols, faces = [], [], []
        off = 0
        for p in patches:
            verts.append(p.vertices)
            cols.append(p.colors)
            faces.append(p.faces + off)
            off += len(p.vertices)
        save_ply(
            path,
            np.concatenate(verts).astype(np.float32),
            np.concatenate(cols).astype(np.uint8),
            None,
            np.concatenate(faces).astype(np.int32),
        )
        return off


def mesh_current_volume(tracker, cfg: KintinuousConfig,
                        vertex_capacity: int = 2_000_000,
                        face_capacity: int = 4_000_000) -> MeshPatch:
    """Surface-nets mesh of the live volume (global coords)."""
    R = cfg.volume_resolution
    vol = tracker.state.vol
    if cfg.devices > 1:
        # gather the z-slab-sharded volume to one addressable array
        from kintinuous_tpu.ops.tsdf import VolumeState as _VS

        vol = _VS(
            tsdf=jnp.asarray(np.asarray(vol.tsdf)),
            cw=jnp.asarray(np.asarray(vol.cw)),
            wrap=jnp.asarray(np.asarray(vol.wrap)),
            origin=jnp.asarray(np.asarray(vol.origin)),
        )
    if cfg.fast_mode:
        from kintinuous_tpu.ops.blocked import blocked_to_dense
        from kintinuous_tpu.ops.tsdf import VolumeState as _VS

        vol = _VS(
            tsdf=blocked_to_dense(vol.tsdf), cw=blocked_to_dense(vol.cw),
            wrap=vol.wrap, origin=vol.origin,
        )
    res = jax.jit(
        lambda v: extract_mesh(
            v, jnp.zeros(3, jnp.int32), (R, R, R), cfg.voxel_size,
            vertex_capacity, face_capacity,
        )
    )(vol)
    nv, nf = int(res.n_vertices), int(res.n_faces)
    return MeshPatch(
        vertices=np.asarray(res.vertices[:nv]),
        colors=np.clip(np.asarray(res.colors[:nv]), 0, 255).astype(np.uint8),
        faces=np.asarray(res.faces[:nf]),
        cells=np.asarray(res.cells[:nv]),
    )


def save_volume_mesh(path: str, tracker, cfg: KintinuousConfig) -> int:
    patch = mesh_current_volume(tracker, cfg)
    mc = MeshCollector()
    mc.add(patch)
    return mc.save(path)
