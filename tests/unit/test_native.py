"""Native C++ runtime tests (libfvdb_native via ctypes)."""
import numpy as np
import pytest

from fabstir_vectordb_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


class TestNativeFS:
    def test_put_get_delete(self, tmp_path):
        s = native.NativeFileSystemObjectStore(str(tmp_path))
        s.put("a/b/c.bin", b"hello")
        assert s.get("a/b/c.bin") == b"hello"
        assert s.exists("a/b/c.bin")
        assert s.list_keys("a/") == ["a/b/c.bin"]
        s.delete("a/b/c.bin")
        assert not s.exists("a/b/c.bin")
        from fabstir_vectordb_tpu.core.object_store import NotFoundError

        with pytest.raises(NotFoundError):
            s.get("a/b/c.bin")

    def test_get_many_parallel(self, tmp_path):
        s = native.NativeFileSystemObjectStore(str(tmp_path))
        for i in range(20):
            s.put(f"k{i}", f"v{i}".encode())
        out = s.get_many([f"k{i}" for i in range(20)] + ["missing"])
        assert out[:20] == [f"v{i}".encode() for i in range(20)]
        assert out[20] is None

    def test_escape_rejected(self, tmp_path):
        s = native.NativeFileSystemObjectStore(str(tmp_path))
        from fabstir_vectordb_tpu.core.object_store import StorageError

        with pytest.raises(StorageError):
            s.put("../evil", b"x")

    def test_usable_with_persister(self, tmp_path):
        """The native store is a drop-in ObjectStore for persistence."""
        from fabstir_vectordb_tpu.index import HybridIndex, HybridConfig, IVFConfig
        from fabstir_vectordb_tpu.storage import HybridPersister

        rng = np.random.default_rng(0)
        vecs = rng.standard_normal((60, 8)).astype(np.float32)
        idx = HybridIndex(8, HybridConfig(ivf=IVFConfig(n_clusters=3, n_probe=3)))
        idx.initialize(vecs)
        idx.insert_batch([f"v{i}" for i in range(60)], vecs)
        store = native.NativeFileSystemObjectStore(str(tmp_path))
        p = HybridPersister(store)
        p.save_index_chunked(idx, "s", chunk_size=25)
        idx2, _ = p.load_index_chunked("s")
        assert idx2.store.active_count == 60


class TestNativeCache:
    def test_lru_and_stats(self):
        c = native.NativeByteCache(max_bytes=100)
        c.put("a", b"x" * 40)
        c.put("b", b"y" * 40)
        assert c.get("a") == b"x" * 40
        c.put("c", b"z" * 40)  # evicts b (LRU)
        assert c.get("b") is None
        assert c.get("a") is not None and c.get("c") is not None
        stats = c.stats()
        assert stats["evictions"] == 1
        assert stats["misses"] == 1 and stats["hits"] == 3
        assert stats["entries"] == 2

    def test_remove(self):
        c = native.NativeByteCache(max_bytes=1000)
        c.put("k", b"v")
        assert c.remove("k") and not c.remove("k")
        assert c.get("k") is None


class TestInMemoryIndex:
    def test_add_search_cosine(self):
        ix = native.InMemoryIndex(4)
        ix.add_vector("a", [1, 0, 0, 0], {"tag": "x"})
        ix.add_vector("b", [0, 1, 0, 0], {"tag": "y"})
        ix.add_vector("c", [0.9, 0.1, 0, 0], {"tag": "x"})
        assert len(ix) == 3
        res = ix.search([1, 0, 0, 0], 2)
        assert res[0][0] == "a" and res[0][1] < 1e-6
        assert res[1][0] == "c"

    def test_duplicate_and_dim_checks(self):
        ix = native.InMemoryIndex(4)
        ix.add_vector("a", [1, 0, 0, 0])
        with pytest.raises(ValueError):
            ix.add_vector("a", [0, 1, 0, 0])
        with pytest.raises(ValueError):
            ix.add_vector("b", [1, 0])

    def test_update_delete_get(self):
        ix = native.InMemoryIndex(4)
        ix.add_vector("a", [1, 0, 0, 0])
        ix.update_vector("a", [0, 0, 0, 1])
        np.testing.assert_array_equal(ix.get_vector("a"), [0, 0, 0, 1])
        ix.delete_vector("a")
        with pytest.raises(KeyError):
            ix.get_vector("a")
        assert ix.search([1, 0, 0, 0], 3) == []
        with pytest.raises(KeyError):
            ix.delete_vector("a")

    def test_search_with_filter(self):
        ix = native.InMemoryIndex(2)
        for i in range(10):
            ix.add_vector(f"v{i}", [1.0, i / 10.0],
                          {"kind": "even" if i % 2 == 0 else "odd", "i": i})
        flt = native.SearchFilter().add_string_equals("kind", "odd")
        res = ix.search_with_filter([1.0, 0.0], 3, flt)
        assert res and all(m["kind"] == "odd" for _, _, m in res)

        nf = native.SearchFilter().add_numeric("i", "gte", 8)
        res = ix.search_with_filter([1.0, 1.0], 5, nf)
        assert {r[2]["i"] for r in res} <= {8, 9}
        with pytest.raises(ValueError):
            native.SearchFilter().add_numeric("i", "regex", 1)
