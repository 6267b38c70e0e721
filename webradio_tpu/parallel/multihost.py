"""Multi-host deployment helpers: distributed init + host-sharded ingest.

Single-host multi-chip needs nothing beyond a local Mesh; across hosts the
runtime comes up via ``jax.distributed`` and the wideband capture is ingested
*host-parallel*: each host contributes the time slice of the block its local
devices own, assembled into one global array without any host ever holding
the full block (the DCN analog of the reference's single-process capture
thread, SURVEY §2.7).

These helpers are exercised degenerately (1 process) in CI; on a real pod
slice they are driven by the launcher with the standard
``JAX_COORDINATOR_ADDRESS`` / process-id environment.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Bring up ``jax.distributed`` when a multi-process env is configured.

    Arguments default from the standard env (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``). No-op (returns False) in
    single-process runs, so the same entry point works everywhere.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return False
    kwargs = {"coordinator_address": coordinator}
    num = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else os.environ.get(
        "JAX_PROCESS_ID")
    if num is not None:
        kwargs["num_processes"] = int(num)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    log.info("jax.distributed up: process %d / %d, %d local devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count())
    return True


def host_time_slice(block_frames: int, mesh: Mesh) -> tuple[int, int]:
    """This host's [start, stop) frame range of a time-sharded block.

    The ingest layer reads only this range from its capture source (each
    host owns a contiguous run of the ``time`` axis when the mesh is built
    from ``jax.devices()`` in default order).
    """
    t_shards = mesh.shape["time"]
    per_shard = block_frames // t_shards
    # which time shards live on this process?
    my = [
        i // mesh.shape["chan"]
        for i, d in enumerate(mesh.devices.flat)
        if d.process_index == jax.process_index()
    ]
    lo, hi = min(my), max(my)
    return lo * per_shard, (hi + 1) * per_shard


#: fixed broadcast-buffer size: the collective's shape must be identical
#: on every process, so control blobs ride a constant-size u8 array
CONTROL_BLOB_BYTES = 65_536


def broadcast_blob(payload: bytes | None) -> bytes:
    """Broadcast a byte blob from process 0 to every process.

    The live serving pump's control channel: process 0 (the HTTP owner)
    publishes its control state each block; followers apply it before
    stepping, so every process traces and executes the SAME program with
    the SAME parameters (SPMD control writes, SURVEY §2.7). A fixed-size
    uint8 buffer keeps the collective shape static. Single-process runs
    return the payload unchanged (no collective)."""
    if jax.process_count() == 1:
        return payload or b""
    from jax.experimental import multihost_utils

    buf = np.zeros(CONTROL_BLOB_BYTES + 4, np.uint8)
    if jax.process_index() == 0 and payload:
        n = len(payload)
        if n > CONTROL_BLOB_BYTES:
            raise ValueError(f"control blob too large ({n} bytes)")
        buf[:4] = np.frombuffer(np.uint32(n).tobytes(), np.uint8)
        buf[4:4 + n] = np.frombuffer(payload, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    n = int(np.frombuffer(out[:4].tobytes(), np.uint32)[0])
    return out[4:4 + n].tobytes()


def gather_to_host(x) -> np.ndarray:
    """Collective gather of a (possibly multi-host-sharded) array to a
    host numpy array on EVERY process. Must be called by all processes
    in the same order — the multihost pump's publish step does. The
    single-process path is a plain device fetch."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def make_global_block(local_planes: np.ndarray, block_frames: int,
                      mesh: Mesh) -> jax.Array:
    """Assemble the global ``[2, block_frames]`` IQ block from this host's
    local time slice (``[2, local_frames]`` float32).

    Uses ``jax.make_array_from_process_local_data`` so no host materializes
    the whole block; the result is sharded ``P(None, "time")``, ready for
    the sharded step.
    """
    sharding = NamedSharding(mesh, P(None, "time"))
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_planes, np.float32),
        (2, block_frames),
    )
