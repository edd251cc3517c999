"""ChunkCache + ObjectStore decorator tests (mirrors reference chunk_cache/storage tests)."""
import numpy as np
import pytest

from fabstir_vectordb_tpu.core import (
    ChunkCache,
    VectorChunk,
    MemoryObjectStore,
    FileSystemObjectStore,
    CachedObjectStore,
    RetryObjectStore,
    BatchObjectStore,
    CircuitBreaker,
    CircuitOpenError,
    StorageError,
)
from fabstir_vectordb_tpu.core.object_store import NotFoundError


def make_chunk(cid, n=4, dim=8):
    data = np.full((n, dim), float(hash(cid) % 97), np.float32)
    return VectorChunk(cid, 0, n - 1, [f"{cid}:{i}" for i in range(n)], data)


class TestChunkCache:
    def test_lru_eviction_and_metrics(self):
        cache = ChunkCache(max_chunks=2)
        cache.put(make_chunk("a"))
        cache.put(make_chunk("b"))
        assert cache.get("a") is not None  # a is now most recent
        cache.put(make_chunk("c"))  # evicts b
        assert cache.get("b") is None
        assert cache.get("a") is not None and cache.get("c") is not None
        assert cache.metrics.evictions == 1
        assert cache.metrics.misses == 1
        assert cache.metrics.hits == 3
        assert 0 < cache.metrics.hit_rate < 1

    def test_byte_cap(self):
        cache = ChunkCache(max_chunks=100, max_bytes=3000)
        for i in range(5):  # each chunk ~ 4*8*4 + overhead bytes
            cache.put(make_chunk(f"c{i}", n=16, dim=16))  # 1KB data each
        assert len(cache) < 5

    def test_remove_and_clear(self):
        cache = ChunkCache(max_chunks=4)
        cache.put(make_chunk("a"))
        assert cache.remove("a") and not cache.remove("a")
        cache.put(make_chunk("b"))
        cache.clear()
        assert len(cache) == 0 and cache.total_bytes == 0


class TestMemoryStore:
    def test_crud_and_call_counting(self):
        s = MemoryObjectStore()
        s.put("a/b", b"1")
        assert s.get("a/b") == b"1"
        assert s.list_keys("a/") == ["a/b"]
        s.delete("a/b")
        assert not s.exists("a/b")
        with pytest.raises(NotFoundError):
            s.get("a/b")
        assert s.get_calls["a/b"] == 2 and s.put_calls["a/b"] == 1

    def test_fault_injection(self):
        s = MemoryObjectStore(fail_on={"k": 2})
        s.put("k", b"v")
        with pytest.raises(StorageError):
            s.get("k")
        with pytest.raises(StorageError):
            s.get("k")
        assert s.get("k") == b"v"


class TestFileSystemStore:
    def test_roundtrip(self, tmp_path):
        s = FileSystemObjectStore(str(tmp_path))
        s.put("x/y/z.bin", b"data")
        assert s.get("x/y/z.bin") == b"data"
        assert s.list_keys("x/") == ["x/y/z.bin"]
        s.delete("x/y/z.bin")
        assert not s.exists("x/y/z.bin")

    def test_escape_rejected(self, tmp_path):
        s = FileSystemObjectStore(str(tmp_path))
        with pytest.raises(StorageError):
            s.put("../evil", b"x")


class TestCachedStore:
    def test_hit_miss_stats(self):
        inner = MemoryObjectStore()
        inner.put("k", b"v")
        s = CachedObjectStore(inner)
        assert s.get("k") == b"v"
        assert s.get("k") == b"v"
        assert s.stats.hits == 1 and s.stats.misses == 1
        assert inner.get_calls["k"] == 1  # second read served from cache

    def test_ttl_expiry(self):
        t = [0.0]
        inner = MemoryObjectStore()
        inner.put("k", b"v")
        s = CachedObjectStore(inner, ttl_seconds=10, clock=lambda: t[0])
        s.get("k")
        t[0] = 5.0
        s.get("k")
        assert inner.get_calls["k"] == 1
        t[0] = 20.0
        s.get("k")
        assert inner.get_calls["k"] == 2

    def test_eviction_by_entries(self):
        inner = MemoryObjectStore()
        for i in range(4):
            inner.put(f"k{i}", b"v")
        s = CachedObjectStore(inner, max_entries=2)
        for i in range(4):
            s.get(f"k{i}")
        assert s.stats.evictions == 2

    def test_write_through_and_delete_invalidate(self):
        inner = MemoryObjectStore()
        s = CachedObjectStore(inner)
        s.put("k", b"v")
        assert s.get("k") == b"v" and inner.get_calls.get("k", 0) == 0
        s.delete("k")
        with pytest.raises(NotFoundError):
            s.get("k")


class TestRetryStore:
    def test_retries_then_succeeds(self):
        inner = MemoryObjectStore(fail_on={"k": 2})
        inner.put("k", b"v")
        sleeps = []
        s = RetryObjectStore(inner, max_retries=3, sleep=sleeps.append)
        assert s.get("k") == b"v"
        assert len(sleeps) == 2
        assert sleeps[1] > sleeps[0] * 1.2  # exponential growth (with jitter)

    def test_gives_up_after_max(self):
        inner = MemoryObjectStore(fail_on={"k": 99})
        inner.put("k", b"v")
        s = RetryObjectStore(inner, max_retries=2, sleep=lambda *_: None)
        with pytest.raises(StorageError):
            s.get("k")

    def test_not_found_not_retried(self):
        inner = MemoryObjectStore()
        s = RetryObjectStore(inner, max_retries=3, sleep=lambda *_: None)
        with pytest.raises(NotFoundError):
            s.get("missing")
        assert inner.get_calls["missing"] == 1

    def test_circuit_breaker_opens_and_half_opens(self):
        t = [0.0]
        breaker = CircuitBreaker(failure_threshold=2, reset_timeout=30, clock=lambda: t[0])
        inner = MemoryObjectStore(fail_on={"k": 99})
        inner.put("k", b"v")
        s = RetryObjectStore(inner, max_retries=1, breaker=breaker, sleep=lambda *_: None)
        with pytest.raises(StorageError):
            s.get("k")
        assert breaker.state == "open"
        with pytest.raises(CircuitOpenError):
            s.get("k")
        t[0] = 31.0
        assert breaker.state == "half-open"
        inner.fail_on["k"] = 0
        assert s.get("k") == b"v"
        assert breaker.state == "closed"


class TestBatchStore:
    def test_buffered_until_flush(self):
        inner = MemoryObjectStore()
        s = BatchObjectStore(inner, max_buffer=100)
        s.put("a", b"1")
        assert s.get("a") == b"1"  # visible via buffer
        assert not inner.exists("a")
        s.flush()
        assert inner.get("a") == b"1"

    def test_auto_flush_at_capacity(self):
        inner = MemoryObjectStore()
        s = BatchObjectStore(inner, max_buffer=2)
        s.put("a", b"1")
        s.put("b", b"2")
        assert inner.exists("a") and inner.exists("b")

    def test_delete_buffering(self):
        inner = MemoryObjectStore()
        inner.put("a", b"1")
        s = BatchObjectStore(inner, max_buffer=100)
        s.delete("a")
        with pytest.raises(NotFoundError):
            s.get("a")
        assert inner.exists("a")
        s.flush()
        assert not inner.exists("a")


def test_chunk_loader_honors_injected_empty_cache():
    """Regression: an EMPTY ChunkCache is falsy (__len__ == 0); the loader
    must not silently replace it with a default-sized one."""
    import numpy as np

    from fabstir_vectordb_tpu.core import ChunkCache, MemoryObjectStore
    from fabstir_vectordb_tpu.core.chunk import VectorChunk
    from fabstir_vectordb_tpu.storage.chunk_loader import ChunkLoader

    store = MemoryObjectStore()
    for i in range(10):
        store.put(
            f"chunks/chunk-{i}.cbor",
            VectorChunk(f"chunk-{i}", 0, 0, ["a"],
                        np.zeros((1, 4), np.float32)).to_cbor(),
        )
    cache = ChunkCache(max_chunks=6)
    loader = ChunkLoader(store, cache=cache)
    assert loader.cache is cache
    for i in range(10):
        loader.load_chunk(f"chunks/chunk-{i}.cbor")
    assert len(cache) == 6  # bounded by the injected capacity
    assert cache.metrics.evictions == 4


class TestEncryptedObjectStore:
    def _store(self, **kw):
        from fabstir_vectordb_tpu.core import MemoryObjectStore
        from fabstir_vectordb_tpu.storage.encryption import (
            EncryptedObjectStore, derive_key,
        )
        inner = MemoryObjectStore()
        return inner, EncryptedObjectStore(
            inner, derive_key("test phrase"), **kw
        )

    def test_roundtrip_and_ciphertext_at_rest(self):
        inner, enc = self._store()
        enc.put("k", b"secret-data")
        assert enc.get("k") == b"secret-data"
        assert b"secret-data" not in inner.get("k")

    def test_plaintext_rejected_by_default(self):
        from fabstir_vectordb_tpu.core.object_store import StorageError
        import pytest
        inner, enc = self._store()
        inner.put("k", b"attacker-chosen plaintext")
        with pytest.raises(StorageError):
            enc.get("k")

    def test_plaintext_allowed_when_opted_in(self):
        inner, enc = self._store(allow_plaintext=True)
        inner.put("legacy", b"old plaintext blob")
        assert enc.get("legacy") == b"old plaintext blob"

    def test_tampered_ciphertext_rejected(self):
        from fabstir_vectordb_tpu.core.object_store import StorageError
        import pytest
        inner, enc = self._store()
        enc.put("k", b"payload")
        blob = bytearray(inner.get("k"))
        blob[-1] ^= 0xFF
        inner.put("k", bytes(blob))
        with pytest.raises(StorageError):
            enc.get("k")


def test_fs_store_rejects_path_traversal(tmp_path):
    """Keys must never escape the store root (session ids and backup paths
    flow into keys — '../' in any of them would write outside the root)."""
    from fabstir_vectordb_tpu.core.object_store import (
        FileSystemObjectStore, StorageError)

    store = FileSystemObjectStore(str(tmp_path / "root"))
    for key in ("../evil", "../../etc/passwd", "/etc/hostname",
                "a/../../b", ".."):
        with pytest.raises(StorageError):
            store.put(key, b"x")
        with pytest.raises((StorageError, Exception)):
            store.get(key)
    store.put("ok/nested/key", b"x")  # sane nesting still works
    assert store.get("ok/nested/key") == b"x"


def test_parallel_fetch_forwards_through_decorator_chain():
    """The IO profile survives any decorator stack (an AEAD/cache/retry
    chain over a network store must keep the chunk loader's fan-out)."""
    from fabstir_vectordb_tpu.core.object_store import (
        BatchObjectStore, CachedObjectStore, MemoryObjectStore,
        RetryObjectStore)
    from fabstir_vectordb_tpu.storage.encryption import EncryptedObjectStore

    class FakeNet(MemoryObjectStore):
        parallel_fetch = True

    chain = EncryptedObjectStore(
        CachedObjectStore(RetryObjectStore(BatchObjectStore(FakeNet()))),
        b"k" * 32)
    assert chain.parallel_fetch is True
    assert CachedObjectStore(MemoryObjectStore()).parallel_fetch is False


class TestRangeReads:
    """Byte-range reads power sub-chunk lazy cold serving (index/cold.py):
    a first search fetches only the row spans its probe plan touches
    instead of whole 15 MB chunks."""

    def test_memory_store_range(self):
        from fabstir_vectordb_tpu.core.object_store import MemoryObjectStore

        s = MemoryObjectStore()
        s.put("k", bytes(range(100)))
        assert s.supports_range
        assert s.get_range("k", 10, 5) == bytes(range(10, 15))
        assert s.get_range("k", 95, 50) == bytes(range(95, 100))  # EOF trunc
        assert s.range_calls["k"] == 2
        assert s.get_calls.get("k", 0) == 0  # ranges never count as full gets

    def test_fs_store_range_pread(self, tmp_path):
        from fabstir_vectordb_tpu.core.object_store import (
            FileSystemObjectStore, NotFoundError)

        s = FileSystemObjectStore(str(tmp_path))
        s.put("a/b", b"0123456789")
        assert s.supports_range
        assert s.get_range("a/b", 3, 4) == b"3456"
        assert s.get_range("a/b", 8, 10) == b"89"  # reads past EOF truncate
        assert s.get_range("a/b", 0, 0) == b""
        with pytest.raises(NotFoundError):
            s.get_range("missing", 0, 4)

    def test_range_capability_forwards_through_decorators(self):
        from fabstir_vectordb_tpu.core.object_store import (
            BatchObjectStore, CachedObjectStore, MemoryObjectStore,
            RetryObjectStore)
        from fabstir_vectordb_tpu.storage.encryption import (
            EncryptedObjectStore)

        inner = MemoryObjectStore()
        inner.put("k", b"abcdefgh")
        chain = CachedObjectStore(RetryObjectStore(BatchObjectStore(inner)))
        assert chain.supports_range
        assert chain.get_range("k", 2, 3) == b"cde"
        assert inner.range_calls["k"] == 1
        # a fully-cached blob answers ranges locally (no inner IO)
        chain.get("k")
        assert chain.get_range("k", 2, 3) == b"cde"
        assert inner.range_calls["k"] == 1

        # AEAD covers the whole blob: ranged reads of ciphertext are
        # impossible, so the encrypting decorator declares no range support
        # (and still answers correctly by decrypt + slice)
        enc = EncryptedObjectStore(MemoryObjectStore(), b"k" * 32)
        enc.put("k", b"abcdefgh")
        assert not enc.supports_range
        assert enc.get_range("k", 2, 3) == b"cde"

    def test_batch_store_range_sees_buffered_writes(self):
        from fabstir_vectordb_tpu.core.object_store import (
            BatchObjectStore, MemoryObjectStore, NotFoundError)

        inner = MemoryObjectStore()
        b = BatchObjectStore(inner, max_buffer=100)
        b.put("k", b"0123456789")  # buffered, not yet in inner
        assert b.get_range("k", 4, 3) == b"456"
        b.delete("k")
        with pytest.raises(NotFoundError):
            b.get_range("k", 0, 2)

    def test_chunk_loader_fetch_range_retries(self):
        from fabstir_vectordb_tpu.core.object_store import MemoryObjectStore
        from fabstir_vectordb_tpu.storage.chunk_loader import ChunkLoader

        inner = MemoryObjectStore(fail_on={"k": 2})
        inner.put("k", b"0123456789")
        loader = ChunkLoader(inner, max_retries=3, base_delay=0.0)
        assert loader.fetch_range("k", 1, 3) == b"123"
        assert inner.range_calls["k"] == 3  # two injected failures + success
