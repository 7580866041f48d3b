"""Profiling and benchmarking helpers.

Replaces the reference's `src/utils/profiling.py` (torch.utils.benchmark
wrappers + CUDA memory hooks) with JAX equivalents: wall-time benchmarks
with proper device sync, XLA profiler traces (viewable in TensorBoard /
xprof), and live device-memory stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


def _sync(tree) -> None:
    """Block until a pytree's computation is complete — via a value fetch,
    since `block_until_ready` can return early on remote backends."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        jax.device_get(jnp.sum(leaves[0].ravel()[0:1]))


def benchmark(fn: Callable, *args, iters: int = 10, warmup: int = 2,
              **kwargs) -> Dict[str, float]:
    """Wall-time a jitted callable (reference `benchmark_forward`)."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "mean_ms": dt * 1e3, "iters_per_s": 1.0 / dt}


def benchmark_backward(loss_fn: Callable, *args, iters: int = 10,
                       warmup: int = 2) -> Dict[str, float]:
    grad_fn = jax.jit(jax.grad(loss_fn))
    return benchmark(grad_fn, *args, iters=iters, warmup=warmup)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dna_tpu_trace"):
    """XLA profiler trace context (open in xprof/TensorBoard).
    Reference analog: torch profiler / memory hooks."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Dict[str, Any]:
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }


def flops_estimate(fn: Callable, *args) -> Optional[float]:
    """Ask XLA for the cost analysis of a jitted function."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return None
