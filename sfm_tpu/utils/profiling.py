"""Device observability: the slot the reference's OpenCL profiling occupies
(CL_QUEUE_PROFILING_ENABLE + durationOfEvent, opencl_wrapper.cpp:157-164).

Provides device discovery info, XLA cost analysis of compiled programs
(device FLOPs/bytes — the analog of per-kernel event durations), and a
jax.profiler trace context for deep dives.
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax


def device_info() -> list[dict[str, Any]]:
    """Enumerate devices (analog of OpenCL::Container device discovery,
    opencl_wrapper.cpp:59-104)."""
    out = []
    for d in jax.devices():
        out.append({
            "id": d.id,
            "platform": d.platform,
            "kind": getattr(d, "device_kind", "?"),
            "process": d.process_index,
        })
    return out


def compiled_cost(fn, *args, **kwargs) -> dict[str, float]:
    """FLOP/byte estimates of a jitted function from XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return {k: float(v) for k, v in ca.items()
                if isinstance(v, (int, float))}
    except Exception:
        return {}


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope: view with tensorboard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
