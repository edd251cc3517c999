"""Host->device transfer helpers.

``device_put`` of an ml_dtypes-bfloat16 numpy array takes a pathological
slow path on the tunneled TPU backend: measured 28 MB/s for a 768 MB
buffer vs 520 MB/s for same-size float32 and 622 MB/s for uint16 — a 22x
penalty that dominated every bf16 mirror build (the round-3 10M build
spent minutes in it). The same bits shipped as a uint16 VIEW ride the
fast path, and a zero-cost ``bitcast_convert_type`` on device restores
the bf16 dtype. All bf16 uploads in the codebase go through here.
"""
from __future__ import annotations

import numpy as np


def put_bf16(host: np.ndarray):
    """Upload ``host`` (float32 or ml_dtypes bfloat16) as a device bf16
    array via the u16-view fast path. f32 inputs are converted on the host
    first (measured ~5 GB/s) — half the wire bytes of shipping f32 and
    ~20x the throughput of shipping bf16 directly."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    if host.dtype != ml_dtypes.bfloat16:
        host = np.asarray(host, np.float32).astype(ml_dtypes.bfloat16)
    u16 = np.ascontiguousarray(host).view(np.uint16)
    return jax.lax.bitcast_convert_type(jax.device_put(u16), jnp.bfloat16)
