"""Chunk / manifest / CBOR codec tests (mirrors reference tests/unit/chunk_tests.rs)."""
import json

import numpy as np
import pytest

from fabstir_vectordb_tpu import cbor
from fabstir_vectordb_tpu.core import (
    VectorChunk,
    ChunkMetadata,
    HNSWManifest,
    IVFManifest,
    Manifest,
    ChunkError,
    MANIFEST_VERSION,
)


def test_cbor_scalar_roundtrip():
    for v in [None, True, False, 0, 23, 24, 255, 256, 65536, -1, -500,
              1.5, -2.25, "hello", "", b"bytes", [1, "a", None],
              {"k": [1, 2], "n": {"x": 1.0}}]:
        assert cbor.loads(cbor.dumps(v)) == v


def test_cbor_large_ints_and_floats():
    assert cbor.loads(cbor.dumps(2**40)) == 2**40
    assert cbor.loads(cbor.dumps(-(2**40))) == -(2**40)
    out = cbor.loads(cbor.dumps(3.141592653589793))
    assert out == 3.141592653589793


def test_cbor_ndarray_roundtrip():
    for dt in (np.float32, np.float64, np.int32, np.int64, np.uint8):
        a = (np.arange(12, dtype=dt)).reshape(3, 4)
        b = cbor.loads(cbor.dumps(a))
        np.testing.assert_array_equal(a, b)
        assert b.dtype == a.dtype

    flat = np.arange(5, dtype=np.float32)
    np.testing.assert_array_equal(cbor.loads(cbor.dumps(flat)), flat)


def test_cbor_compress_roundtrip():
    data = b"hello world " * 1000
    comp = cbor.compress_zstd(data)
    assert len(comp) < len(data)
    assert cbor.decompress_zstd(comp) == data


def test_chunk_roundtrip():
    data = np.random.default_rng(0).standard_normal((5, 8)).astype(np.float32)
    chunk = VectorChunk("chunk-0", 0, 4, [f"id{i}" for i in range(5)], data)
    back = VectorChunk.from_cbor(chunk.to_cbor())
    assert back.chunk_id == "chunk-0"
    assert back.ids == chunk.ids
    np.testing.assert_array_equal(back.data, data)
    np.testing.assert_array_equal(back.get_vector("id3"), data[3])
    assert back.get_vector("nope") is None


def test_chunk_id_data_mismatch_rejected():
    with pytest.raises(ChunkError):
        VectorChunk("c", 0, 1, ["a"], np.zeros((2, 3), np.float32))


def test_chunk_overlap():
    a = VectorChunk("a", 0, 9, [], np.zeros((0, 4), np.float32))
    b = VectorChunk("b", 10, 19, [], np.zeros((0, 4), np.float32))
    c = VectorChunk("c", 5, 14, [], np.zeros((0, 4), np.float32))
    assert not a.overlaps_with(b)
    assert a.overlaps_with(c) and c.overlaps_with(b)


def test_manifest_roundtrip_with_structures():
    m = Manifest(chunk_size=10000, total_vectors=123)
    m.add_chunk(ChunkMetadata("chunk-0", 100, 4096, cid="cid0", id_range=("a", "z")))
    hnsw = HNSWManifest(entry_point="vec_0001")
    hnsw.add_layer(0, 123)
    hnsw.node_chunk_map["vec_0001"] = "chunk-0"
    m.hnsw_structure = hnsw
    m.ivf_structure = IVFManifest(
        centroids=np.ones((2, 4), np.float32),
        cluster_assignments={"0": ["chunk-0"]},
    )
    m.deleted_vectors = ["vec_dead"]

    text = m.to_json()
    back = Manifest.from_json(text)
    assert back.version == MANIFEST_VERSION
    assert back.total_vectors == 123
    assert back.num_chunks == 1
    assert back.get_chunk("chunk-0").cid == "cid0"
    assert back.hnsw_structure.entry_point == "vec_0001"
    assert back.hnsw_structure.layers[0]["node_count"] == 123
    assert back.ivf_structure.num_centroids == 2
    assert back.ivf_structure.cluster_assignments["0"] == ["chunk-0"]
    assert back.deleted_vectors == ["vec_dead"]


def test_manifest_forward_version_rejected():
    obj = json.loads(Manifest(total_vectors=1).to_json())
    obj["version"] = MANIFEST_VERSION + 1
    with pytest.raises(ChunkError, match="version"):
        Manifest.from_json(json.dumps(obj))


def test_manifest_v2_auto_upgrades():
    obj = json.loads(Manifest(total_vectors=1).to_json())
    obj["version"] = 2
    back = Manifest.from_json(json.dumps(obj))
    assert back.version == MANIFEST_VERSION


def test_manifest_duplicate_chunk_id_invalid():
    m = Manifest()
    m.add_chunk(ChunkMetadata("dup", 1, 1))
    m.add_chunk(ChunkMetadata("dup", 1, 1))
    with pytest.raises(ChunkError, match="Duplicate"):
        m.validate()


class TestChunkPartitionProperties:
    """Property-style partition invariants over random sizes (reference:
    proptest chunk partition tests per docs/IMPLEMENTATION_CHUNKED.md:67)."""

    def test_partition_invariants_random(self, rng):
        from fabstir_vectordb_tpu.core import MemoryObjectStore
        from fabstir_vectordb_tpu.index import HybridConfig, HybridIndex, IVFConfig
        from fabstir_vectordb_tpu.storage.persistence import HybridPersister

        for trial in range(5):
            n = int(rng.integers(1, 400))
            chunk_size = int(rng.integers(1, 120))
            dim = int(rng.integers(2, 12))
            vecs = rng.standard_normal((n, dim)).astype(np.float32)
            idx = HybridIndex(dim, HybridConfig(auto_migrate=False))
            idx.initialize(None)  # HNSW-only mode
            idx.insert_batch([f"t{trial}-v{i}" for i in range(n)], vecs,
                             np.full(n, 1.0), now=1.0)
            store = MemoryObjectStore()
            m = HybridPersister(store).save_index_chunked(
                idx, f"p{trial}", chunk_size=chunk_size)

            # invariants: chunk count, disjoint full coverage, size bounds
            want_chunks = (n + chunk_size - 1) // chunk_size
            assert len(m.chunks) == want_chunks
            assert sum(c.vector_count for c in m.chunks) == n
            assert all(c.vector_count <= chunk_size for c in m.chunks)
            assert all(c.vector_count >= 1 for c in m.chunks)
            loaded, _ = HybridPersister(store).load_index_chunked(f"p{trial}")
            assert loaded.stats(now=1.0).total_vectors == n


def test_cbor_fuzz_roundtrip_random_structures():
    """Property fuzz: 200 random nested JSON-ish structures (dicts, lists,
    strings incl. unicode, ints spanning widths, floats, bools, None,
    bytes, f32/f64/i32/i64 ndarrays) must round-trip exactly through the
    self-describing codec (reference parity: serde_cbor round-trips
    arbitrary Value trees)."""
    import numpy as np

    from fabstir_vectordb_tpu.cbor.codec import dumps, loads

    rng = np.random.default_rng(123)

    def rand_value(depth=0):
        kinds = ["int", "float", "str", "bool", "none", "bytes", "arr"]
        if depth < 3:
            kinds += ["list", "dict"] * 2
        k = kinds[rng.integers(0, len(kinds))]
        if k == "int":
            return int(rng.integers(-2**62, 2**62))
        if k == "float":
            return float(np.float64(rng.standard_normal()))
        if k == "str":
            return "".join(chr(int(c)) for c in rng.integers(32, 0x2FFF, 5))
        if k == "bool":
            return bool(rng.integers(0, 2))
        if k == "none":
            return None
        if k == "bytes":
            return bytes(rng.integers(0, 256, int(rng.integers(0, 16)),
                                      dtype=np.uint8))
        if k == "arr":
            dt = [np.float32, np.float64, np.int32, np.int64][
                rng.integers(0, 4)]
            return rng.integers(-100, 100, int(rng.integers(0, 8))).astype(dt)
        if k == "list":
            return [rand_value(depth + 1)
                    for _ in range(int(rng.integers(0, 5)))]
        return {f"k{j}": rand_value(depth + 1)
                for j in range(int(rng.integers(0, 5)))}

    def assert_same(a, b):
        if isinstance(a, np.ndarray):
            assert isinstance(b, np.ndarray), type(b)
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(a, b)
        elif isinstance(a, dict):
            assert set(a) == set(b)
            for kk in a:
                assert_same(a[kk], b[kk])
        elif isinstance(a, list):
            assert isinstance(b, list) and len(a) == len(b)
            for x, y in zip(a, b):
                assert_same(x, y)
        else:
            assert a == b and type(a) is type(b), (a, b)

    for _ in range(200):
        v = rand_value()
        assert_same(v, loads(dumps(v)))
