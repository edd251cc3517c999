"""Pallas TPU kernel: fused masked L2 distance + running top-k flat scan.

The XLA path materializes the full [B, N] distance matrix in HBM before
lax.top_k reads it back — at 1M x batch 128 that is ~0.5 GB of HBM traffic
each way. This kernel streams corpus tiles HBM -> VMEM once, computes the
distance tile on the MXU, and folds it into a running [B, K] top-k held in
VMEM scratch, so HBM traffic is exactly one read of the corpus.

Selection uses K rounds of masked argmin on the VPU (K is small; lax.top_k
isn't relied on inside Mosaic). Masked/padded rows surface as +inf / -1,
matching ops.topk.masked_topk conventions.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _select_topk(d, ids, k):
    """K rounds of masked argmin over axis 1, carrying global ids alongside
    (no gather — Mosaic only lowers same-shape gathers). d, ids [B, T] ->
    ([B, k], [B, k])."""
    b, t = d.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    vals = []
    idxs = []
    cur = d
    for _ in range(k):
        m = jnp.min(cur, axis=1)  # [B]
        col = jnp.argmin(cur, axis=1).astype(jnp.int32)  # [B]
        sel = cols == col[:, None]
        # exactly one column selected per row -> masked sum extracts its id
        id_at = jnp.sum(jnp.where(sel, ids, 0), axis=1)
        vals.append(m)
        idxs.append(jnp.where(jnp.isfinite(m), id_at, -1))
        cur = jnp.where(sel, jnp.inf, cur)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)


def _scan_kernel(q_ref, qsq_ref, x_ref, xsq_ref, mask_ref,
                 out_d_ref, out_i_ref, best_d, best_i, *, k, tile):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_i[:] = jnp.full_like(best_i, -1)

    q = q_ref[:]  # [B, D]
    x = x_ref[:]  # [T, D]
    d = (
        qsq_ref[:]  # [B, 1]
        - 2.0 * jax.lax.dot_general(
            q, x, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + xsq_ref[:].reshape(1, -1)
    )
    d = jnp.maximum(d, 0.0)
    valid = mask_ref[:].reshape(1, -1) != 0
    d = jnp.where(valid, d, jnp.inf)

    b, t = d.shape
    tile_ids = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1) + i * tile
    tile_d, tile_i = _select_topk(d, tile_ids, k)
    all_d = jnp.concatenate([best_d[:], tile_d], axis=1)  # [B, 2K]
    all_i = jnp.concatenate([best_i[:], tile_i], axis=1)
    merged_d, merged_i = _select_topk(all_d, all_i, k)
    best_d[:] = merged_d
    best_i[:] = merged_i

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_d_ref[:] = best_d[:]
        out_i_ref[:] = best_i[:]


@partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def pallas_l2_topk(x, x_sq, mask, q, k: int, tile: int = 1024,
                   interpret: bool = False):
    """Fused flat scan. x [N, D], x_sq [N], mask [N] bool, q [B, D].

    Returns (dists [B, k] squared L2 (+inf padded), rows [B, k] (-1 padded)).
    N must be a multiple of ``tile`` (capacity buckets guarantee this).
    """
    n, dim = x.shape
    b = q.shape[0]
    if n % tile != 0:
        raise ValueError(f"N={n} not a multiple of tile={tile}")
    n_tiles = n // tile
    q_sq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)  # [B,1]
    mask_i8 = mask.astype(jnp.int8).reshape(n, 1)
    xsq_col = x_sq.reshape(n, 1)

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
    )
    out_d, out_i = pl.pallas_call(
        partial(_scan_kernel, k=k, tile=tile),
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(q, q_sq, x, xsq_col, mask_i8)
    return out_d, out_i
