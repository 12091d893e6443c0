"""Multi-host (DCN) layer: jax.distributed runtime, host-partitioned
slice/keyframe ownership, and the distributed pose-graph solve.

The reference is strictly single-process/single-GPU (no NCCL/MPI
anywhere — SURVEY.md §2.7); this module is the new host-level scaling
layer (§7 stage 6):

- `init_distributed` wraps jax.distributed.initialize so N processes
  (each owning its local chips) form one global device mesh;
- `HostPartition` assigns round-robin ownership of the heavy host-side
  work streams — extracted cloud slices (CloudSliceProcessor role,
  CloudSliceProcessor.cpp:97-161) and place-recognition keyframes
  (PlaceRecognition.cpp:53-88) — so each host filters/normals/matches
  only its share; `allgather_points` exchanges the processed results
  over DCN at save/merge time;
- `DistributedPoseGraph` shards the factor arrays of the GN/CG solve
  across the global mesh: every factor-product reduction psums over the
  mesh axis while the small replicated CG state iterates identically on
  every host (backend/pose_graph.gn_core(axis_name=...) — the
  distributed replacement for iSAM batch optimise, iSAMInterface:136-140).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from kintinuous_tpu.backend.pose_graph import PoseGraph, gn_core


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the jax.distributed runtime (no-op when already up or
    when running single-process with no coordinator configured)."""
    if num_processes is None or num_processes <= 1:
        return
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = "h") -> Mesh:
    """1-D mesh over every device of every process."""
    return Mesh(np.array(jax.devices()), axis_names=(axis_name,))


class HostPartition:
    """Round-robin ownership of host-side work items across processes.

    The frontend's outputs (slices, PR keyframes) are globally ordered
    by index; each host processes only the items it owns, keeping the
    CPU-bound backend (the reference's bottleneck, README.md:186) at
    1/N load per host.
    """

    def __init__(self, num_processes: Optional[int] = None,
                 process_id: Optional[int] = None):
        self.num = num_processes if num_processes is not None else jax.process_count()
        self.pid = process_id if process_id is not None else jax.process_index()

    def owns(self, index: int) -> bool:
        return index % self.num == self.pid

    def owner(self, index: int) -> int:
        return index % self.num


def allgather_points(arr: np.ndarray, mesh: Mesh) -> np.ndarray:
    """Exchange variable-count per-host point payloads over DCN.

    arr: (n_i, D) float32 on each host (n_i may differ). Returns the
    concatenation over hosts, ordered by process id — the multi-host
    equivalent of CloudSliceProcessor.save's slice concatenation
    (CloudSliceProcessor.cpp:180-231)."""
    from jax.experimental import multihost_utils

    arr = np.ascontiguousarray(arr, np.float32)
    D = arr.shape[1] if arr.ndim == 2 else 1
    counts = multihost_utils.process_allgather(
        np.array([arr.shape[0]], np.int32)
    ).reshape(-1)
    cap = int(counts.max()) if counts.size else 0
    if cap == 0:
        return np.zeros((0, D), np.float32)
    padded = np.zeros((cap, D), np.float32)
    padded[: arr.shape[0]] = arr.reshape(-1, D)
    gathered = multihost_utils.process_allgather(padded)  # (P, cap, D)
    return np.concatenate(
        [gathered[p, : int(counts[p])] for p in range(gathered.shape[0])]
    )


class DistributedPoseGraph(PoseGraph):
    """PoseGraph whose optimise() shards factor products over a global
    device mesh (all hosts hold the full — tiny — graph metadata; the
    O(F) factor work divides by the device count)."""

    def __init__(self, mesh: Optional[Mesh] = None, **kw):
        super().__init__(**kw)
        self.mesh = mesh if mesh is not None else global_mesh()
        self._axis = self.mesh.axis_names[0]
        self._jit_cache = {}

    def _dist_gn(self, iters: int):
        key = (iters, self.huber_delta)
        if key not in self._jit_cache:
            axis = self._axis
            hd = self.huber_delta

            @partial(
                shard_map,
                mesh=self.mesh,
                in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
                out_specs=(P(), P()),
                check_vma=False,
            )
            def gn(poses, fi, fj, fZinv, fw, fl):
                return gn_core(poses, fi, fj, fZinv, fw, iters,
                               axis_name=axis, fl=fl, huber_delta=hd)

            self._jit_cache[key] = jax.jit(gn)
        return self._jit_cache[key]

    def optimise(self, iters: int = 10) -> float:
        if not self._fw:
            return 0.0
        n_dev = self.mesh.shape[self._axis]
        N = len(self.poses)
        F = len(self._fw)
        FB = ((self._bucket(F) + n_dev - 1) // n_dev) * n_dev
        fi = np.zeros(FB, np.int32)
        fj = np.zeros(FB, np.int32)
        fZ = np.tile(np.eye(4, dtype=np.float32), (FB, 1, 1))
        fw = np.zeros(FB, np.float32)
        fl = np.zeros(FB, np.float32)
        fi[:F] = self._fi
        fj[:F] = self._fj
        fZ[:F] = np.array(self._fZ, np.float32)
        fw[:F] = self._fw
        fl[:F] = np.array(self._floop, np.float32)
        rep = NamedSharding(self.mesh, P())
        shd = NamedSharding(self.mesh, P(self._axis))
        poses = jax.device_put(np.array(self.poses, np.float32), rep)
        args = (
            poses,
            jax.device_put(fi, shd),
            jax.device_put(fj, shd),
            jax.device_put(np.linalg.inv(fZ).astype(np.float32), shd),
            jax.device_put(fw, shd),
            jax.device_put(fl, shd),
        )
        out, chi2 = self._dist_gn(int(iters))(*args)
        out = np.asarray(jax.device_get(out), np.float64)
        for k in range(N):
            self.poses[k] = out[k]
        # TOTAL chi2 — same gate semantics as PoseGraph.optimise
        return float(np.asarray(chi2))
