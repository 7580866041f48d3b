"""Multi-host SPMD initialization and per-host data sharding glue.

Replaces the reference's NCCL/DDP process-group bootstrap
(`src/utils/distributed.py:21-35`, PL DDP spawn): on TPU pods each host
runs the same program; `jax.distributed.initialize()` wires the fleet and
every jit over a global mesh spans all chips. Data: each host feeds its own
shard of the global batch (`ShardedLoader(host_id=process_index)`) and
`make_global_array` assembles the logically-global array from local shards.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. On TPU pods with standard env vars this is
    zero-config; explicit args support manual bring-up. No-op if already
    initialized or single-process."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # single-process / already initialized


def host_info() -> Dict[str, int]:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def make_global_array(local_batch: np.ndarray, mesh: Mesh,
                      pspec: P) -> jax.Array:
    """Assemble a global jax.Array from this host's shard of the batch
    (every host holds rows [h*B/H, (h+1)*B/H) of the global batch)."""
    sharding = NamedSharding(mesh, pspec)
    global_shape = (local_batch.shape[0] * jax.process_count(),
                    *local_batch.shape[1:])
    local_devices = [d for d in mesh.devices.flat
                     if d.process_index == jax.process_index()]
    # rows per local device
    per_dev = local_batch.shape[0] // max(len(local_devices), 1)
    arrays = [
        jax.device_put(local_batch[i * per_dev:(i + 1) * per_dev], d)
        for i, d in enumerate(local_devices)
    ]
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, arrays)


def shard_batch_for_host(loader_kwargs: dict) -> dict:
    """Patch ShardedLoader kwargs with this process's slot."""
    out = dict(loader_kwargs)
    out.setdefault("host_id", jax.process_index())
    out.setdefault("host_count", jax.process_count())
    return out


_SEQ_FIELDS = ("input_ids", "attention_mask", "mask")


def batch_pspec(name: str, arr, seq_len: Optional[int], mesh: Mesh) -> P:
    """Per-leaf input PartitionSpec: batch axis over (dp, fsdp); the sequence
    axis additionally over sp for length-L fields (labels only when they are
    per-position — [B, n_targets] regression/multilabel targets stay
    replicated along axis 1)."""
    has_sp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("sp", 1) > 1
    is_seq = arr.ndim >= 2 and seq_len is not None and arr.shape[1] == seq_len \
        and (name in _SEQ_FIELDS or name == "labels")
    if has_sp and is_seq:
        return P(("dp", "fsdp"), "sp")
    return P(("dp", "fsdp"))


def make_global_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    """Place a host-local numpy batch onto the mesh as global jax.Arrays.

    Single-process: a committed `device_put` with the data sharding (inputs
    arrive pre-sharded instead of replicated). Multi-process: every host
    holds rows [h*B/H, (h+1)*B/H) of the global batch (ShardedLoader's
    host_id slice) and `jax.make_array_from_process_local_data` assembles the
    logically-global array — the reference's DistributedSampler + NCCL
    scatter collapsed into addressable-shard bookkeeping."""
    seq_len = None
    if "input_ids" in batch:
        seq_len = np.asarray(batch["input_ids"]).shape[1] \
            if np.asarray(batch["input_ids"]).ndim >= 2 else None
    out = {}
    multi = jax.process_count() > 1
    for k, v in batch.items():
        v = np.asarray(v)
        sharding = NamedSharding(mesh, batch_pspec(k, v, seq_len, mesh))
        if multi:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = jax.device_put(v, sharding)
    return out


def local_rows(arr: jax.Array) -> np.ndarray:
    """This process's contiguous slab of a batch-sharded global array, in
    global row order — rows [h*B/H, (h+1)*B/H), matching the ShardedLoader
    host slice that fed them (`data/loader.py:78`).

    Works for any output sharding: fully-addressable arrays (single host, or
    replicated outputs) are sliced directly; multi-host batch/seq-sharded
    outputs are assembled from the addressable shards that intersect this
    host's row range (replicated shards overwrite with identical data).
    Inverse of `make_global_batch` on the batch axis, so
    `all_hosts_concat(local_rows(x)) == device_get(x)` at any world size."""
    H = jax.process_count()
    lb = arr.shape[0] // H
    h0 = jax.process_index() * lb
    if getattr(arr, "is_fully_addressable", True):
        out = np.asarray(jax.device_get(arr))
        return out[h0:h0 + lb]
    buf = np.zeros((lb,) + arr.shape[1:], dtype=arr.dtype)
    for s in arr.addressable_shards:
        idx = s.index
        r = idx[0] if idx else slice(0, arr.shape[0])
        start = r.start or 0
        stop = arr.shape[0] if r.stop is None else r.stop
        a, b = max(start, h0), min(stop, h0 + lb)
        if a >= b:
            continue
        data = np.asarray(jax.device_get(s.data))
        buf[(slice(a - h0, b - h0),) + tuple(idx[1:])] = data[a - start:b - start]
    return buf


def all_hosts_concat(arr: np.ndarray) -> np.ndarray:
    """Row-concatenate equal-shape per-host arrays across all processes
    (ordered by process index). Identity at process_count == 1. The
    psum-analog for host-side eval state — replaces the reference's
    torchmetrics `dist_reduce_fx="sum"`/cat (`src/tasks/torchmetrics.py:
    92-98`) for metrics that need full logits (MCC/F1/AUROC)."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    out = np.asarray(multihost_utils.process_allgather(np.asarray(arr)))
    return out.reshape((-1,) + tuple(arr.shape[1:]))
