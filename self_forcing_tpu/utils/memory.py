"""Device-memory tools (reference demo_utils/memory.py, TPU edition).

The reference's DynamicSwapInstaller metaclass hack streams weights to the
GPU on attribute access (:13-58); on TPU the equivalents are explicit
device_put with donation and HBM telemetry from the runtime.
"""
from __future__ import annotations

import jax


def get_hbm_stats(device=None) -> dict:
    """bytes_in_use / bytes_limit (demo_utils/memory.py:72-82's
    get_cuda_free_memory_gb analogue)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": int(stats.get("bytes_in_use", 0)),
        "bytes_limit": int(stats.get("bytes_limit", 0)),
        "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", 0)),
    }


def get_free_memory_gb(device=None) -> float:
    s = get_hbm_stats(device)
    if s["bytes_limit"]:
        return (s["bytes_limit"] - s["bytes_in_use"]) / 1024 ** 3
    return 0.0


def move_to_device(tree, device=None):
    """Explicit host->device transfer of a pytree
    (demo_utils/memory.py:85-114's partial model moves)."""
    device = device or jax.devices()[0]
    return jax.device_put(tree, device)


def offload_to_host(tree):
    return jax.device_get(tree)
