"""Shard-count-independent persistence for multi-chip device state.

Save writes ONE blob per device shard, sliced straight off the sharded
jax Array via ``addressable_shards`` — the layout that generalizes to
multi-host (each host persists only the shards it addresses; no host ever
materializes the full corpus). A small JSON-able manifest records the
geometry. Load reassembles the global arrays and re-shards them onto ANY
mesh size: padding is strictly append-only (masked rows at the flat tail,
invalid clusters at the IVF tail), so global row and cluster identity is
invariant across shard counts — save on 8 devices, load on 4 (or 16) and
search results are bit-identical.

Reference analog: the chunked manifest format (reference:
src/hybrid/persistence.rs:188-277) — but where the reference's chunks are
a host-RAM tiering device, these shards are the unit of device placement.
Replicated state (the sharded-HNSW graph, ShardedHNSWState) needs no
shard-aware persistence: the regular HNSWPersister round-trips it and
``shard_hnsw_state`` re-replicates on any mesh.
"""
from __future__ import annotations

import json

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cbor import codec
from ..core.object_store import ObjectStore
from ..utils.padding import round_up
from .sharded import ShardedIVFState

MANIFEST_VERSION = 1


class ShardedPersistenceError(RuntimeError):
    pass


def _shard_slices(arr: jax.Array, axis: int = 0):
    """(lo, hi, np_slice) per addressable shard, ordered by global offset."""
    out = []
    for s in arr.addressable_shards:
        idx = s.index[axis]
        lo = idx.start or 0
        out.append((lo, idx.stop if idx.stop is not None else arr.shape[axis],
                    np.asarray(s.data)))
    out.sort(key=lambda t: t[0])
    return out


def _load_manifest(store: ObjectStore, prefix: str, kind: str) -> dict:
    man = json.loads(store.get(f"{prefix}/sharded_manifest.json"))
    if man.get("version", 0) > MANIFEST_VERSION:
        raise ShardedPersistenceError(
            f"manifest version {man['version']} is newer than supported "
            f"{MANIFEST_VERSION}"
        )
    if man.get("kind") != kind:
        raise ShardedPersistenceError(
            f"expected kind={kind!r}, found {man.get('kind')!r}"
        )
    return man


# --------------------------------------------------------------- flat corpus
def save_sharded_flat(
    store: ObjectStore, prefix: str,
    x: jax.Array, x_sq: jax.Array, mask: jax.Array,
) -> None:
    """Persist a row-sharded flat corpus (as consumed by
    ``sharded_flat_search``): one ``shards/shard-%04d.cbor`` per device
    slice + manifest."""
    # slice x_sq/mask per addressable shard too — np.asarray on the full
    # sharded array would materialize the global corpus on this host (and
    # raise outright on a multi-host mesh where it is not fully
    # addressable), defeating the per-shard memory bound this format
    # exists for
    slices = _shard_slices(x)
    sq_by_lo = {lo: b for lo, _, b in _shard_slices(x_sq)}
    mk_by_lo = {lo: b for lo, _, b in _shard_slices(mask)}
    shards = []
    for i, (lo, hi, block) in enumerate(slices):
        key = f"{prefix}/shards/shard-{i:04d}.cbor"
        store.put(key, codec.dumps({
            "x": block.astype(np.float32),
            "x_sq": sq_by_lo[lo].astype(np.float32),
            "mask": mk_by_lo[lo].astype(np.uint8),
        }))
        shards.append({"key": key, "lo": int(lo), "hi": int(hi)})
    store.put(f"{prefix}/sharded_manifest.json", json.dumps({
        "version": MANIFEST_VERSION, "kind": "flat",
        "dim": int(x.shape[1]), "n_rows": int(x.shape[0]),
        "dtype": str(np.asarray(slices[0][2]).dtype),
        "shards": shards,
    }).encode())


def load_sharded_flat(
    store: ObjectStore, prefix: str, mesh: Mesh, axis: str = "data",
):
    """Load a flat corpus saved with ANY shard count onto ``mesh``.

    Returns (x, x_sq, mask) device arrays row-sharded over ``axis``. Rows
    keep their global indices; extra rows appended for divisibility carry
    mask=False.
    """
    man = _load_manifest(store, prefix, "flat")
    n, d = man["n_rows"], man["dim"]
    n_dev = mesh.shape[axis]
    n_pad = round_up(n, n_dev)
    x = np.zeros((n_pad, d), np.float32)
    x_sq = np.zeros(n_pad, np.float32)
    mask = np.zeros(n_pad, bool)
    for sh in man["shards"]:
        obj = codec.loads(store.get(sh["key"]))
        lo, hi = sh["lo"], sh["hi"]
        x[lo:hi] = obj["x"]
        x_sq[lo:hi] = obj["x_sq"]
        mask[lo:hi] = obj["mask"].astype(bool)
    shard = NamedSharding(mesh, P(axis))
    if man["dtype"] == "bfloat16":
        import ml_dtypes

        dtype = ml_dtypes.bfloat16  # numpy has no native bfloat16
    else:
        dtype = np.float32
    import jax.numpy as jnp
    return (
        jax.device_put(jnp.asarray(x, dtype), shard),
        jax.device_put(x_sq, shard),
        jax.device_put(mask, shard),
    )


# ----------------------------------------------------------------- IVF tiles
def save_sharded_ivf(
    store: ObjectStore, prefix: str, state: ShardedIVFState,
) -> None:
    """Persist cluster-sharded IVF state: per-shard self-contained blobs
    (list vectors + global row ids + validity) so a loader never needs the
    original corpus, plus real (unpadded) centroids."""
    vec_slices = _shard_slices(state.list_vecs)
    row_slices = {lo: b for lo, _, b in _shard_slices(state.list_rows)}
    val_slices = {lo: b for lo, _, b in _shard_slices(state.list_valid)}
    shards = []
    for i, (lo, hi, vecs) in enumerate(vec_slices):
        key = f"{prefix}/shards/shard-{i:04d}.cbor"
        store.put(key, codec.dumps({
            "list_vecs": vecs.astype(np.float32),
            "list_rows": row_slices[lo].astype(np.int32),
            "list_valid": val_slices[lo].astype(np.uint8),
        }))
        shards.append({"key": key, "lo": int(lo), "hi": int(hi)})
    cents = np.asarray(state.centroids)[: state.n_clusters]
    store.put(f"{prefix}/centroids.cbor",
              codec.dumps({"centroids": cents.astype(np.float32)}))
    c_pad, l_pad, d = state.list_vecs.shape
    store.put(f"{prefix}/sharded_manifest.json", json.dumps({
        "version": MANIFEST_VERSION, "kind": "ivf",
        "dim": int(d), "l_pad": int(l_pad),
        "c_pad": int(c_pad), "n_clusters": int(state.n_clusters),
        "shards": shards,
    }).encode())


def load_sharded_ivf(
    store: ObjectStore, prefix: str, mesh: Mesh, axis: str = "data",
) -> ShardedIVFState:
    """Load IVF state saved with ANY shard count onto ``mesh``. Clusters
    keep their global ids; padding clusters (all-invalid, far centroids)
    are re-derived for the new device count."""
    man = _load_manifest(store, prefix, "ivf")
    c_real, l_pad, d = man["n_clusters"], man["l_pad"], man["dim"]
    n_dev = mesh.shape[axis]
    c_pad = round_up(c_real, n_dev)
    vecs = np.zeros((c_pad, l_pad, d), np.float32)
    rows = np.full((c_pad, l_pad), -1, np.int32)
    valid = np.zeros((c_pad, l_pad), bool)
    for sh in man["shards"]:
        obj = codec.loads(store.get(sh["key"]))
        lo = sh["lo"]
        hi = min(sh["hi"], c_real)  # drop the old mesh's padding clusters
        if hi <= lo:
            continue
        n = hi - lo
        vecs[lo:hi] = obj["list_vecs"][:n]
        rows[lo:hi] = obj["list_rows"][:n]
        valid[lo:hi] = obj["list_valid"][:n].astype(bool)
    cents_real = codec.loads(store.get(f"{prefix}/centroids.cbor"))["centroids"]
    if cents_real.shape[0] != c_real:
        raise ShardedPersistenceError(
            f"centroid count {cents_real.shape[0]} != n_clusters {c_real}"
        )
    cents = np.full((c_pad, d), 1e30, np.float32)
    cents[:c_real] = cents_real
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return ShardedIVFState(
        centroids=jax.device_put(cents, repl),
        list_vecs=jax.device_put(vecs, shard),
        list_rows=jax.device_put(rows, shard),
        list_valid=jax.device_put(valid, shard),
        n_clusters=c_real,
    )
