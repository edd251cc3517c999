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


_WRITE_BLOCK = None


def _write_block_fn():
    global _WRITE_BLOCK
    if _WRITE_BLOCK is None:
        from functools import partial

        import jax

        @partial(jax.jit, donate_argnums=(0,))
        def write(buf, blk, lo):
            return jax.lax.dynamic_update_slice(buf, blk, (lo, 0))

        _WRITE_BLOCK = write
    return _WRITE_BLOCK


def put_bf16_blocks(src: np.ndarray, n_rows: int,
                    block_bytes: int = 256 << 20):
    """Assemble an [n_rows, dim] bf16 device mirror from host rows in
    ~``block_bytes`` pieces (u16-view fast path per piece, donated
    device-side writes — no whole-mirror copies).

    Unlike one monolithic ``put_bf16``, each block marks stall-watchdog
    progress (utils.progress): a multi-GB transfer through the tunneled
    backend can legitimately run for many minutes at single-digit MB/s,
    and a silent monolithic put made healthy runs indistinguishable from
    lost RPCs (ADVICE r4: the watchdog killed a live 7.7 GB install).
    Also avoids materializing the full bf16 host twin (7.7 GB at
    10M x 384) — only one block is ever resident."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from . import progress

    n_rows = int(n_rows)
    dim = int(src.shape[1])
    rows_per = max(int(block_bytes) // (dim * 2), 1)
    write = _write_block_fn()
    mirror = jnp.zeros((n_rows, dim), jnp.bfloat16)
    for lo in range(0, n_rows, rows_per):
        hi = min(lo + rows_per, n_rows)
        blk = np.asarray(src[lo:hi], np.float32).astype(ml_dtypes.bfloat16)
        dev = jax.lax.bitcast_convert_type(
            jax.device_put(blk.view(np.uint16)), jnp.bfloat16)
        mirror = write(mirror, dev, jnp.int32(lo))
        progress.mark()  # heartbeat per block
    return mirror
