"""Multi-host bring-up: jax.distributed initialization + global meshes.

The reference is strictly single-process/single-GPU (SURVEY §2 parallelism
inventory: no torch.distributed/NCCL/MPI anywhere); multi-host support is
a TPU-framework delta mandated by the BASELINE north star (tile sharding
over ICI within a slice, DCN across hosts, ≥0.8 scaling efficiency).

Bring-up is env-var gated so single-host runs need no configuration:

  RAIN_TPU_COORDINATOR    host:port of process 0 (presence enables init)
  RAIN_TPU_NUM_PROCESSES  total process count
  RAIN_TPU_PROCESS_ID     this process's id

On TPU pods, jax.distributed.initialize() can also auto-detect all three
from the TPU metadata server; set RAIN_TPU_COORDINATOR=auto to use that.
After initialization jax.devices() returns the GLOBAL device list, so a
mesh built from it spans hosts: the tile-row axis maps shards to chips in
device order, keeping each host's bands contiguous — gradient psums then
ride ICI within each slice and cross DCN only once per leaf.
"""

from __future__ import annotations

import os

import jax


def initialize_from_env(log_fn=print) -> bool:
    """Initialize jax.distributed when the RAIN_TPU_* env vars are set.

    Returns True when running multi-process (after initialization),
    False for plain single-process runs. Safe to call more than once.
    """
    coord = os.environ.get("RAIN_TPU_COORDINATOR")
    if not coord:
        return False
    # NOTE: jax.process_count() would INITIALIZE the backend, after which
    # jax.distributed.initialize() refuses to run — probe the distributed
    # client state instead.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    if coord == "auto":
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["RAIN_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["RAIN_TPU_PROCESS_ID"]))
    log_fn(f"[dist] process {jax.process_index()}/{jax.process_count()} "
           f"with {jax.local_device_count()} local / "
           f"{jax.device_count()} global devices")
    return jax.process_count() > 1


def global_device_count() -> int:
    return jax.device_count()
