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


class MeshCollector:
    """Accumulates mesh patches; merge-with-offset save
    (MeshGenerator::save, :37-191)."""

    def __init__(self):
        self.patches: List[MeshPatch] = []

    def add(self, patch: MeshPatch):
        self.patches.append(patch)

    @property
    def n_triangles(self) -> int:
        return sum(len(p.faces) for p in self.patches)

    def save(self, path: str) -> int:
        if not self.patches:
            save_ply(path, np.zeros((0, 3), np.float32))
            return 0
        verts, cols, faces = [], [], []
        off = 0
        for p in self.patches:
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
    )


def save_volume_mesh(path: str, tracker, cfg: KintinuousConfig) -> int:
    patch = mesh_current_volume(tracker, cfg)
    mc = MeshCollector()
    mc.add(patch)
    return mc.save(path)
