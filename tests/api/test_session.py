"""Session SDK e2e tests (mirrors reference bindings/node/test suite)."""
import numpy as np
import pytest

from fabstir_vectordb_tpu.api import (
    VectorDBSession,
    VectorDBConfig,
    VectorDBError,
)
from fabstir_vectordb_tpu.core import MemoryObjectStore


def make_session(session_id="test-session", store=None):
    cfg = VectorDBConfig(session_id=session_id, storage_mode="mock")
    return VectorDBSession.create(cfg, store=store or MemoryObjectStore())


def vec_inputs(n, dim=8, seed=0, prefix="doc", meta=None):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        out.append(
            {
                "id": f"{prefix}{i}",
                "vector": rng.standard_normal(dim).astype(float).tolist(),
                "metadata": (meta(i) if meta else {"index": i}),
            }
        )
    return out


class TestSessionConfig:
    def test_create_requires_session_id(self):
        with pytest.raises(VectorDBError) as e:
            VectorDBSession.create({"sessionId": ""}, store=MemoryObjectStore())
        assert e.value.code == "INVALID_CONFIG"

    def test_create_validates_chunk_and_cache(self):
        with pytest.raises(VectorDBError):
            VectorDBSession.create(
                {"sessionId": "s", "chunkSize": 0}, store=MemoryObjectStore()
            )
        with pytest.raises(VectorDBError):
            VectorDBSession.create(
                {"sessionId": "s", "cacheSizeMb": 0}, store=MemoryObjectStore()
            )

    def test_real_mode_requires_seed_phrase(self):
        with pytest.raises(VectorDBError):
            VectorDBSession.create(
                {"sessionId": "s", "storageMode": "real", "userSeedPhrase": ""},
            )

    def test_real_mode_seed_phrase_word_count(self):
        with pytest.raises(VectorDBError):
            VectorDBSession.create(
                {"sessionId": "s", "storageMode": "real",
                 "userSeedPhrase": "too few words"},
            )


class TestAddAndSearch:
    def test_add_and_exact_search(self):
        s = make_session()
        inputs = vec_inputs(20)
        s.add_vectors(inputs)
        res = s.search(inputs[7]["vector"], 3)
        assert res[0]["id"] == "doc7"
        assert res[0]["score"] > 0.99
        assert res[0]["metadata"] == {"index": 7}
        assert "_originalId" not in res[0]["metadata"]

    def test_first_batch_trains_ivf_when_big_enough(self):
        s = make_session()
        s.add_vectors(vec_inputs(20))
        assert s.get_stats().index_type == "hybrid"

    def test_small_dataset_hnsw_only(self):
        s = make_session()
        s.add_vectors(vec_inputs(5))
        stats = s.get_stats()
        assert stats.index_type == "hnsw"
        assert stats.vector_count == 5

    def test_dimension_enforced(self):
        s = make_session()
        s.add_vectors(vec_inputs(3, dim=8))
        with pytest.raises(VectorDBError) as e:
            s.add_vectors(vec_inputs(1, dim=16, prefix="other"))
        assert e.value.code == "INVALID_INPUT"
        with pytest.raises(VectorDBError):
            s.search([0.0] * 16, 3)

    def test_duplicate_id_rejected(self):
        s = make_session()
        s.add_vectors(vec_inputs(3))
        with pytest.raises(VectorDBError):
            s.add_vectors(vec_inputs(1))

    def test_non_object_metadata_wrapped_and_unwrapped(self):
        s = make_session()
        s.add_vectors(
            [{"id": "a", "vector": [1.0] * 8, "metadata": "just-a-string"}]
        )
        res = s.search([1.0] * 8, 1)
        assert res[0]["id"] == "a"
        assert res[0]["metadata"] == "just-a-string"

    def test_score_threshold(self):
        s = make_session()
        s.add_vectors(
            [
                {"id": "near", "vector": [0.0] * 8, "metadata": None},
                {"id": "far", "vector": [10.0] * 8, "metadata": None},
            ]
        )
        res = s.search([0.01] * 8, 2, {"threshold": 0.5})
        assert [r["id"] for r in res] == ["near"]

    def test_include_vectors(self):
        s = make_session()
        inputs = vec_inputs(4)
        s.add_vectors(inputs)
        res = s.search(inputs[0]["vector"], 1, {"includeVectors": True})
        np.testing.assert_allclose(res[0]["vector"], inputs[0]["vector"], rtol=1e-6)

    def test_filtered_search(self):
        s = make_session()
        s.add_vectors(
            vec_inputs(30, meta=lambda i: {"cat": "a" if i % 2 == 0 else "b", "i": i})
        )
        q = [0.0] * 8
        res = s.search(q, 5, {"filter": {"cat": "b"}})
        assert res
        for r in res:
            assert r["metadata"]["cat"] == "b"
        res2 = s.search(q, 5, {"filter": {"i": {"$gte": 10, "$lt": 20}}})
        for r in res2:
            assert 10 <= r["metadata"]["i"] < 20

    def test_invalid_filter_rejected(self):
        s = make_session()
        s.add_vectors(vec_inputs(3))
        with pytest.raises(VectorDBError):
            s.search([0.0] * 8, 1, {"filter": {"x": {"$regex": "a"}}})


class TestCRUD:
    def test_delete_vector(self):
        s = make_session()
        inputs = vec_inputs(10)
        s.add_vectors(inputs)
        s.delete_vector("doc3")
        res = s.search(inputs[3]["vector"], 10)
        assert all(r["id"] != "doc3" for r in res)
        with pytest.raises(VectorDBError):
            s.delete_vector("doc3")  # already deleted
        with pytest.raises(VectorDBError):
            s.delete_vector("ghost")

    def test_delete_by_metadata(self):
        s = make_session()
        s.add_vectors(
            vec_inputs(12, meta=lambda i: {"user": {"id": str(i % 3)}, "i": i})
        )
        result = s.delete_by_metadata({"user.id": "1"})
        assert result.deleted_count == 4
        assert all(int(d[3:]) % 3 == 1 for d in result.deleted_ids)
        # idempotent: second call deletes nothing
        assert s.delete_by_metadata({"user.id": "1"}).deleted_count == 0

    def test_delete_by_metadata_array_contains(self):
        s = make_session()
        s.add_vectors(
            vec_inputs(6, meta=lambda i: {"tags": ["ai"] if i < 2 else ["ml"]})
        )
        result = s.delete_by_metadata({"tags": "ai"})
        assert result.deleted_count == 2

    def test_update_metadata_replaces(self):
        s = make_session()
        inputs = vec_inputs(5)
        s.add_vectors(inputs)
        s.update_metadata("doc2", {"title": "new", "tags": ["x"]})
        res = s.search(inputs[2]["vector"], 1)
        assert res[0]["id"] == "doc2"
        assert res[0]["metadata"] == {"title": "new", "tags": ["x"]}
        with pytest.raises(VectorDBError):
            s.update_metadata("nope", {})

    def test_vacuum(self):
        s = make_session()
        s.add_vectors(vec_inputs(20))
        s.delete_vector("doc1")
        s.delete_vector("doc2")
        stats = s.vacuum()
        assert stats.total_removed == 2
        assert s.get_stats().total_deleted_count == 0
        assert s.get_stats().vector_count == 18

    def test_destroy(self):
        s = make_session()
        s.add_vectors(vec_inputs(3))
        s.destroy()
        with pytest.raises(VectorDBError) as e:
            s.search([0.0] * 8, 1)
        assert e.value.code == "SESSION_ERROR"


class TestSchema:
    SCHEMA = {
        "fields": {"title": {"type": "string"}, "views": {"type": "number"}},
        "required": ["title"],
    }

    def test_schema_enforced_on_add(self):
        s = make_session()
        s.set_schema(self.SCHEMA)
        s.add_vectors(
            [{"id": "ok", "vector": [0.1] * 8, "metadata": {"title": "t"}}]
        )
        with pytest.raises(VectorDBError) as e:
            s.add_vectors(
                [{"id": "bad", "vector": [0.1] * 8, "metadata": {"views": 3}}]
            )
        assert e.value.code == "INVALID_DATA"

    def test_schema_enforced_on_update(self):
        s = make_session()
        s.set_schema(self.SCHEMA)
        s.add_vectors(
            [{"id": "a", "vector": [0.1] * 8, "metadata": {"title": "t"}}]
        )
        with pytest.raises(VectorDBError):
            s.update_metadata("a", {"title": 5})

    def test_schema_disable(self):
        s = make_session()
        s.set_schema(self.SCHEMA)
        s.set_schema(None)
        s.add_vectors([{"id": "x", "vector": [0.1] * 8, "metadata": {"v": 1}}])


class TestPersistenceRoundtrip:
    def test_save_load_roundtrip(self):
        store = MemoryObjectStore()
        s = make_session("sess-rt", store)
        inputs = vec_inputs(40, meta=lambda i: {"i": i, "cat": "x"})
        s.add_vectors(inputs)
        s.set_schema({"fields": {"i": {"type": "number"}}, "required": []})
        s.delete_vector("doc9")
        cid = s.save_to_s5()
        assert cid == "sess-rt"

        s2 = make_session("sess-rt-2", store)
        s2.load_user_vectors(cid)
        stats = s2.get_stats()
        assert stats.vector_count == 39
        assert stats.total_deleted_count == 1
        res = s2.search(inputs[4]["vector"], 3)
        assert res[0]["id"] == "doc4"
        assert res[0]["metadata"]["i"] == 4
        assert s2.schema is not None
        # deleted vector stays deleted
        res9 = s2.search(inputs[9]["vector"], 40)
        assert all(r["id"] != "doc9" for r in res9)

    def test_metadata_updates_persist_after_save_load(self):
        """Twin of the reference's metadata-update persistence suite
        (reference: tests/integration/metadata_update_persistence_tests.rs:66-149):
        update some vectors' metadata, save, reload in a fresh session —
        updated fields present, untouched vectors keep their originals."""
        store = MemoryObjectStore()
        s = make_session("sess-mu", store)
        s.add_vectors(vec_inputs(
            5, meta=lambda i: {"status": "initial", "timestamp": 1000}))
        s.update_metadata(
            "doc1",
            {"status": "updated", "extra": "new field", "timestamp": 2000})
        s.update_metadata("doc3", {"status": "modified", "timestamp": 3000})
        cid = s.save_to_s5()

        s2 = make_session("sess-mu-2", store)
        s2.load_user_vectors(cid)
        by_id = {r["id"]: r["metadata"]
                 for r in s2.search([0.0] * 8, 5, {"threshold": -1.0})}
        assert by_id["doc1"]["status"] == "updated"
        assert by_id["doc1"]["extra"] == "new field"
        assert by_id["doc1"]["timestamp"] == 2000
        assert by_id["doc3"]["status"] == "modified"
        assert by_id["doc3"]["timestamp"] == 3000
        # untouched vector keeps its original metadata
        assert by_id["doc0"]["status"] == "initial"
        assert by_id["doc0"]["timestamp"] == 1000
        assert s2.get_stats().vector_count == 5

    def test_rich_metadata_types_survive_roundtrip(self):
        """Nested objects, arrays, booleans, and nulls round-trip through
        save/load intact (reference:
        tests/integration/metadata_update_persistence_tests.rs:290-354)."""
        store = MemoryObjectStore()
        s = make_session("sess-rich", store)
        meta = {
            "nested": {"deep": {"value": "data-0"}},
            "array": [1, 2, 3],
            "bool": True,
            "null": None,
        }
        s.add_vectors(
            [{"id": "r0", "vector": [0.5] * 8, "metadata": meta}])
        cid = s.save_to_s5()
        s2 = make_session("sess-rich-2", store)
        s2.load_user_vectors(cid)
        got = s2.search([0.5] * 8, 1)[0]["metadata"]
        assert got["nested"]["deep"]["value"] == "data-0"
        assert got["array"] == [1, 2, 3]
        assert got["bool"] is True
        assert got["null"] is None

    def test_invalid_filter_typed_errors(self):
        """Twin of the reference's invalid-filter error handling
        (reference: bindings/node/test/search-filter.test.js:531-586):
        unsupported operators and malformed ranges produce typed errors
        that name the problem."""
        s = make_session()
        s.add_vectors(vec_inputs(5, meta=lambda i: {"value": i}))
        q = [0.0] * 8
        with pytest.raises(VectorDBError) as e:
            s.search(q, 3, {"filter": {"$invalid": "test"}})
        assert e.value.code == "INVALID_INPUT"
        assert "Unsupported" in str(e.value) or "invalid" in str(e.value)
        with pytest.raises(VectorDBError) as e:
            s.search(q, 3, {"filter": {"value": {}}})  # empty range object
        assert e.value.code == "INVALID_INPUT"

    def test_load_missing_cid_fails(self):
        s = make_session()
        with pytest.raises(VectorDBError) as e:
            s.load_user_vectors("no-such-cid")
        assert e.value.code == "STORAGE_ERROR"

    def test_stats_shape(self):
        s = make_session()
        s.add_vectors(vec_inputs(15))
        js = s.get_stats().to_json()
        for key in ("vectorCount", "memoryUsageMb", "indexType",
                    "hnswVectorCount", "ivfVectorCount", "totalDeletedCount"):
            assert key in js


class TestRegressions:
    """Edge regressions mirroring the reference's topk / dimension
    regression scripts (reference: bindings/node/test)."""

    def test_k_exceeds_count_returns_all(self):
        s = make_session()
        s.add_vectors(vec_inputs(5))
        out = s.search([0.0] * 8, 50)
        assert len(out) == 5
        # results sorted by descending score
        scores = [r["score"] for r in out]
        assert scores == sorted(scores, reverse=True)

    def test_k_one(self):
        s = make_session()
        inputs = vec_inputs(20)
        s.add_vectors(inputs)
        out = s.search(inputs[7]["vector"], 1)
        assert len(out) == 1 and out[0]["id"] == "doc7"

    def test_search_dimension_mismatch(self):
        s = make_session()
        s.add_vectors(vec_inputs(12))
        with pytest.raises(VectorDBError) as e:
            s.search([0.0] * 4, 5)
        assert e.value.code == "INVALID_INPUT"

    def test_search_empty_session(self):
        s = make_session()
        assert s.search([0.0] * 8, 5) == []

    def test_ids_unicode_and_long(self):
        s = make_session()
        weird = "café/путь:☂ " + "x" * 300
        s.add_vectors([{"id": weird, "vector": [0.5] * 8, "metadata": None}])
        out = s.search([0.5] * 8, 1)
        assert out[0]["id"] == weird


@pytest.mark.skipif(
    __import__("os").environ.get("FVDB_SCALE_TESTS") != "1",
    reason="FVDB_SCALE_TESTS=1 to enable",
)
class TestE2EChunked50K:
    """50K add -> save -> load -> search -> delete -> vacuum -> destroy
    (reference: bindings/node/test/e2e-chunked.test.js:60-80)."""

    def test_full_workflow(self):
        store = MemoryObjectStore()
        s = make_session("e2e-50k", store=store)
        n, dim = 50_000, 64
        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        batch = [
            {"id": f"v{i}", "vector": vecs[i].tolist(),
             "metadata": {"i": i, "genre": "g" + str(i % 5)}}
            for i in range(n)
        ]
        for lo in range(0, n, 10_000):
            s.add_vectors(batch[lo:lo + 10_000])
        assert s.get_stats().vector_count == n

        cid = s.save_to_s5()
        # 50K / 10K chunk -> 5 chunks
        chunk_keys = [k for k in store.list_keys() if "/chunks/" in k]
        assert len(chunk_keys) == 5

        s2 = make_session("e2e-50k-load", store=store)
        s2.load_user_vectors(cid)
        assert s2.get_stats().vector_count == n

        q = vecs[123] + 0.001
        out = s2.search(q.tolist(), 10, {"filter": {"genre": "g3"}})
        assert out and all(r["metadata"]["genre"] == "g3" for r in out)
        out = s2.search(q.tolist(), 10)
        assert out[0]["id"] == "v123"

        s2.delete_vector("v123")
        out = s2.search(q.tolist(), 10)
        assert out[0]["id"] != "v123"
        removed = s2.vacuum()
        assert removed.total_removed == 1
        s2.destroy()
        with pytest.raises(VectorDBError):
            s2.search(q.tolist(), 5)


class TestConcurrency:
    """Concurrent readers/writer smoke test (the reference relies on
    Arc<RwLock> + unsafe Send/Sync, src/hnsw/core.rs:688; here the store
    serializes mutation under an RLock and searches snapshot device state)."""

    def test_parallel_searches_during_inserts(self):
        import threading

        s = make_session()
        s.add_vectors(vec_inputs(64, seed=1))
        errors = []
        stop = threading.Event()

        def searcher():
            rng = np.random.default_rng(0)
            while not stop.is_set():
                try:
                    out = s.search(rng.standard_normal(8).tolist(), 5)
                    assert len(out) >= 1
                except Exception as e:  # noqa: BLE001
                    errors.append(e)
                    return

        threads = [threading.Thread(target=searcher) for _ in range(4)]
        for t in threads:
            t.start()
        try:
            for i in range(8):
                s.add_vectors(vec_inputs(32, seed=100 + i, prefix=f"b{i}-"))
        finally:
            stop.set()
            for t in threads:
                t.join(20)
        assert not errors, errors[:1]
        assert s.get_stats().vector_count == 64 + 8 * 32


def test_delete_then_reinsert_same_id():
    """Re-inserting a soft-deleted id works without vacuum (the reference
    client's update() is delete+insert); the tombstoned row stays invisible
    and persistence keeps the live id out of deleted_vectors."""
    from fabstir_vectordb_tpu.core import MemoryObjectStore

    store = MemoryObjectStore()
    s = make_session(store=store)
    s.add_vectors(vec_inputs(12))
    s.delete_vector("doc3")
    s.add_vectors([{"id": "doc3", "vector": [0.25] * 8, "metadata": {"v": 2}}])
    out = s.search([0.25] * 8, 1)
    assert out[0]["id"] == "doc3" and out[0]["metadata"] == {"v": 2}

    cid = s.save_to_s5()
    s2 = make_session("reload", store=store)
    s2.load_user_vectors(cid)
    out = s2.search([0.25] * 8, 1)
    assert out[0]["id"] == "doc3" and out[0]["metadata"] == {"v": 2}
    assert s2.get_stats().vector_count == 12


class TestInternalIdKeying:
    def test_internal_ids_use_full_digest(self):
        # truncated 8-hex ids (32 bits) birthday-collide near 65K vectors;
        # internal keys must carry the full 32-byte digest
        from fabstir_vectordb_tpu.api.session import VectorDBSession
        iid = VectorDBSession._internal_id("some-user-id")
        assert iid.startswith("vec_") and len(iid) == 4 + 64
        assert iid != VectorDBSession._internal_id("some-user-id2")

    def test_distinct_ids_roundtrip_through_search(self):
        import numpy as np
        from fabstir_vectordb_tpu.api.session import VectorDBSession
        from fabstir_vectordb_tpu.core import MemoryObjectStore
        s = VectorDBSession.create(
            {"sessionId": "ids", "storageMode": "mock"}, MemoryObjectStore()
        )
        rng = np.random.default_rng(0)
        vecs = rng.standard_normal((64, 8)).astype(np.float32)
        s.add_vectors([
            {"id": f"user-{i}", "vector": vecs[i].tolist(), "metadata": {"i": i}}
            for i in range(64)
        ])
        res = s.search(vecs[17].tolist(), 1)
        assert res[0]["id"] == "user-17"
        assert res[0]["metadata"]["i"] == 17


class TestColumnarFilteredSearch:
    def _session(self, n=5000, dim=16):
        import numpy as np
        from fabstir_vectordb_tpu.api.session import VectorDBSession
        from fabstir_vectordb_tpu.core import MemoryObjectStore
        s = VectorDBSession.create(
            {"sessionId": "colf", "storageMode": "mock"}, MemoryObjectStore()
        )
        rng = np.random.default_rng(0)
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        s.add_vectors([
            {"id": f"u{i}", "vector": vecs[i].tolist(),
             "metadata": {"cat": "even" if i % 2 == 0 else "odd", "i": i,
                          "tags": ["all", f"mod{i % 10}"]}}
            for i in range(n)
        ])
        return s, vecs

    def test_filtered_results_respect_mask(self):
        s, vecs = self._session(n=2000)
        res = s.search(vecs[100].tolist(), 5, {"filter": {"cat": "even"}})
        assert res and res[0]["id"] == "u100"
        assert all(r["metadata"]["cat"] == "even" for r in res)
        res = s.search(vecs[100].tolist(), 5, {"filter": {"cat": "odd"}})
        assert all(r["metadata"]["cat"] == "odd" for r in res)
        assert res[0]["id"] != "u100"

    def test_array_contains_filter(self):
        s, vecs = self._session(n=1000)
        res = s.search(vecs[7].tolist(), 5, {"filter": {"tags": "mod7"}})
        assert res[0]["id"] == "u7"
        assert all(r["metadata"]["i"] % 10 == 7 for r in res)

    def test_filter_mask_cached_until_mutation(self):
        s, vecs = self._session(n=500)
        f = {"filter": {"cat": "even"}}
        s.search(vecs[0].tolist(), 3, f)
        assert len(s._mask_cache) == 1
        (epoch, _mask), = s._mask_cache.values()
        assert epoch == s.columnar.epoch
        s.add_vectors([{"id": "new", "vector": vecs[0].tolist(),
                        "metadata": {"cat": "even"}}])
        assert s.columnar.epoch != epoch  # cache entry now stale
        res = s.search(vecs[0].tolist(), 2, f)
        assert {r["id"] for r in res} == {"u0", "new"}

    def test_container_filter_falls_back_to_oversample(self):
        import numpy as np
        from fabstir_vectordb_tpu.api.session import VectorDBSession
        from fabstir_vectordb_tpu.core import MemoryObjectStore
        s = VectorDBSession.create(
            {"sessionId": "fb", "storageMode": "mock"}, MemoryObjectStore()
        )
        rng = np.random.default_rng(1)
        vecs = rng.standard_normal((50, 8)).astype(np.float32)
        s.add_vectors([
            {"id": f"v{i}", "vector": vecs[i].tolist(),
             "metadata": {"obj": {"x": i % 3}}}
            for i in range(50)
        ])
        # nested-object equality is not columnar-lowerable
        assert s.columnar.mask(
            __import__("fabstir_vectordb_tpu.core.metadata_filter",
                       fromlist=["MetadataFilter"]
                       ).MetadataFilter.from_json({"obj": {"x": 1}}), 50
        ) is None
        res = s.search(vecs[1].tolist(), 5, {"filter": {"obj": {"x": 1}}})
        assert res and res[0]["id"] == "v1"
        assert all(r["metadata"]["obj"]["x"] == 1 for r in res)

    def test_filtered_latency_near_unfiltered(self):
        import time
        s, vecs = self._session(n=20_000)
        q = vecs[123].tolist()
        s.search(q, 10)                                  # warm compile
        s.search(q, 10, {"filter": {"cat": "even"}})     # warm compile + mask
        t0 = time.perf_counter()
        for _ in range(5):
            s.search(q, 10)
        plain = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        for _ in range(5):
            s.search(q, 10, {"filter": {"cat": "even"}})
        filt = (time.perf_counter() - t0) / 5
        # VERDICT round-1 criterion: filtered <= 2x unfiltered (was O(N)
        # Python per query; allow headroom for CI noise)
        assert filt < 3.0 * plain + 0.01, (filt, plain)

    def test_delete_by_metadata_uses_columnar_path(self):
        s, vecs = self._session(n=300)
        res = s.delete_by_metadata({"cat": "odd"})
        assert res.deleted_count == 150
        left = s.search(vecs[3].tolist(), 5)
        assert all(r["metadata"]["cat"] == "even" for r in left)

    def test_columnar_rebuilt_on_load(self):
        from fabstir_vectordb_tpu.api.session import VectorDBSession
        s, vecs = self._session(n=400)
        cid = s.save_to_s5()
        s2 = VectorDBSession.create(
            {"sessionId": "colf", "storageMode": "mock"}, s.object_store
        )
        s2.load_user_vectors(cid, {"lazyLoad": False})
        res = s2.search(vecs[42].tolist(), 3, {"filter": {"cat": "even"}})
        assert res[0]["id"] == "u42"
        assert s2.columnar.epoch > 0


class TestShardedMetadataMap:
    def test_metadata_map_sharded_and_loaded(self):
        import numpy as np
        from fabstir_vectordb_tpu.api.session import VectorDBSession
        from fabstir_vectordb_tpu.core import MemoryObjectStore
        store = MemoryObjectStore()
        s = VectorDBSession.create(
            {"sessionId": "shard", "storageMode": "mock", "chunkSize": 100},
            store,
        )
        rng = np.random.default_rng(0)
        vecs = rng.standard_normal((250, 8)).astype(np.float32)
        s.add_vectors([
            {"id": f"m{i}", "vector": vecs[i].tolist(), "metadata": {"i": i}}
            for i in range(250)
        ])
        cid = s.save_to_s5()
        assert store.exists(f"{cid}/metadata/meta-manifest.json")
        assert store.exists(f"{cid}/metadata/meta-2.cbor")  # 250/100 -> 3
        assert not store.exists(f"{cid}/metadata_map.cbor")  # no monolith

        s2 = VectorDBSession.create(
            {"sessionId": "shard", "storageMode": "mock", "chunkSize": 100},
            store,
        )
        s2.load_user_vectors(cid, {"lazyLoad": False})
        res = s2.search(vecs[42].tolist(), 1)
        assert res[0]["id"] == "m42" and res[0]["metadata"]["i"] == 42

    def test_shrinking_session_drops_stale_shards(self):
        import numpy as np
        from fabstir_vectordb_tpu.api.session import VectorDBSession
        from fabstir_vectordb_tpu.core import MemoryObjectStore
        store = MemoryObjectStore()
        s = VectorDBSession.create(
            {"sessionId": "shr", "storageMode": "mock", "chunkSize": 50}, store
        )
        rng = np.random.default_rng(1)
        vecs = rng.standard_normal((150, 8)).astype(np.float32)
        s.add_vectors([
            {"id": f"m{i}", "vector": vecs[i].tolist(), "metadata": {"i": i}}
            for i in range(150)
        ])
        s.save_to_s5()
        assert store.exists("shr/metadata/meta-2.cbor")
        for i in range(100, 150):
            s.delete_vector(f"m{i}")
        s.vacuum()
        s.save_to_s5()
        assert not store.exists("shr/metadata/meta-2.cbor")

    def test_legacy_monolithic_blob_still_loads(self):
        import numpy as np
        from fabstir_vectordb_tpu import cbor
        from fabstir_vectordb_tpu.api.session import VectorDBSession
        from fabstir_vectordb_tpu.core import MemoryObjectStore
        store = MemoryObjectStore()
        s = VectorDBSession.create(
            {"sessionId": "leg", "storageMode": "mock"}, store
        )
        rng = np.random.default_rng(2)
        vecs = rng.standard_normal((20, 8)).astype(np.float32)
        s.add_vectors([
            {"id": f"m{i}", "vector": vecs[i].tolist(), "metadata": {"i": i}}
            for i in range(20)
        ])
        s._persister.save_index_chunked(s.index, "leg")
        store.put("leg/metadata_map.cbor", cbor.dumps(s.metadata_map))
        s2 = VectorDBSession.create(
            {"sessionId": "leg", "storageMode": "mock"}, store
        )
        s2.load_user_vectors("leg", {"lazyLoad": False})
        assert s2.search(vecs[5].tolist(), 1)[0]["id"] == "m5"


class TestReducedRankServing:
    """Full session stack through the reduced-rank (PCA) regime: ingest ->
    columnar filter -> search with exact rerank, threshold forced to 0."""

    def test_session_search_and_filter_via_pca(self, monkeypatch):
        from fabstir_vectordb_tpu.utils import limits

        monkeypatch.setattr(limits, "FLAT_THRESHOLD", 0)
        monkeypatch.setenv("FVDB_FLAT_THRESHOLD", "0")
        monkeypatch.setenv("FVDB_PCA_RANK", "8")
        s = make_session("pca-e2e")
        inputs = vec_inputs(4000, dim=16,
                            meta=lambda i: {"g": i % 4, "i": i})
        s.add_vectors(inputs)

        res = s.search(inputs[123]["vector"], 3)
        assert res[0]["id"] == "doc123"
        assert res[0]["score"] > 0.999  # exact rerank: exact self-distance 0

        res = s.search(inputs[123]["vector"], 5, {"filter": {"g": 2}})
        assert len(res) == 5
        for r in res:
            assert r["metadata"]["g"] == 2

        # deletes respected through the masks-only state
        s.delete_vector("doc123")
        res = s.search(inputs[123]["vector"], 3)
        assert res[0]["id"] != "doc123"


class TestInputValidation:
    """Hostile/edge inputs must produce typed INVALID_INPUT errors, never
    leaked internals or silently-poisoned state (found live: k=-5 returned
    results, k=1e9 leaked an XLA message, null in a vector stored NaN)."""

    def test_k_validation(self):
        s = make_session("kval")
        s.add_vectors(vec_inputs(20))
        q = [0.0] * 8
        for bad_k in (0, -5, 2.5, True, 10**9):
            with pytest.raises(VectorDBError) as ei:
                s.search(q, bad_k)
            assert ei.value.code == "INVALID_INPUT"
        # large-but-valid k truncates instead of crashing
        res = s.search(q, 16_384)
        assert len(res) == 20

    def test_non_finite_vectors_rejected(self):
        s = make_session("nanval")
        with pytest.raises(VectorDBError):
            s.add_vectors([{"id": "a", "vector": [1.0, None, 0.0, 0.0]}])
        with pytest.raises(VectorDBError):
            s.add_vectors([{"id": "a", "vector": [1.0, float("nan"), 0, 0]}])
        with pytest.raises(VectorDBError):
            s.add_vectors([{"id": "a", "vector": [1.0, "x", 0, 0]}])
        with pytest.raises(VectorDBError):
            s.add_vectors([{"id": "a", "vector": [[1.0, 2.0]]}])  # nested
        s.add_vectors([{"id": "ok", "vector": [1, 0, 0, 0]}])
        with pytest.raises(VectorDBError):
            s.search([1.0, float("inf"), 0, 0], 1)
        with pytest.raises(VectorDBError):
            s.search([1.0, "x", 0, 0], 1)
        assert s.search([1, 0, 0, 0], 1)[0]["id"] == "ok"


class TestSessionRobustness:
    """Regressions for review findings: silent metadata loss, schema
    resurrection, failed-first-batch index pinning, bounded perf window."""

    def test_metadata_shard_failure_raises_not_empty(self):
        """A present meta-manifest promises its shards: a failing shard GET
        must raise STORAGE_ERROR — silently returning {} loses every
        vector's metadata and the next save persists the loss."""
        store = MemoryObjectStore()
        s = make_session("sess-ms", store)
        s.add_vectors(vec_inputs(20, meta=lambda i: {"i": i}))
        cid = s.save_to_s5()

        store.fail_on[f"{cid}/metadata/meta-0.cbor"] = 99
        s2 = make_session("sess-ms-2", store)
        with pytest.raises(VectorDBError) as e:
            s2.load_user_vectors(cid)
        assert e.value.code == "STORAGE_ERROR"

    def test_cleared_schema_stays_cleared_after_resave(self):
        store = MemoryObjectStore()
        s = make_session("sess-sc", store)
        s.add_vectors(vec_inputs(12, meta=lambda i: {"n": i}))
        s.set_schema({"fields": {"n": {"type": "number"}}, "required": []})
        s.save_to_s5()
        s.set_schema(None)
        cid = s.save_to_s5()

        s2 = make_session("sess-sc-2", store)
        s2.load_user_vectors(cid)
        assert s2.schema is None
        # metadata the old schema would reject now inserts fine
        s2.add_vectors([{"id": "free", "vector": [0.5] * 8,
                         "metadata": {"n": "not-a-number"}}])

    def test_failed_first_batch_does_not_pin_index(self):
        s = make_session()
        with pytest.raises(VectorDBError):
            s.add_vectors([
                {"id": "dup", "vector": [0.1] * 16, "metadata": {}},
                {"id": "dup", "vector": [0.2] * 16, "metadata": {}},
            ])
        assert s.index is None and s.dim is None
        # retry with a DIFFERENT dimension succeeds
        s.add_vectors([{"id": "ok", "vector": [0.1] * 8, "metadata": {}}])
        assert s.get_stats().vector_count == 1

    def test_malformed_items_raise_typed_errors(self):
        s = make_session()
        for bad in (["not-a-dict"],
                    [{"id": "a", "vector": 5}],
                    [{"id": "a"}]):
            with pytest.raises(VectorDBError) as e:
                s.add_vectors(bad)
            assert e.value.code == "INVALID_INPUT"

    def test_empty_session_validates_before_empty_result(self):
        """Validation must not flip from silent-[] to INVALID_INPUT on the
        first insert: invalid inputs are typed errors even pre-init."""
        s = make_session()
        with pytest.raises(VectorDBError):
            s.search([0.0] * 8, 3, {"filter": {"$invalid": 1}})
        with pytest.raises(VectorDBError):
            s.search([float("nan")] * 8, 3)
        assert s.search([0.0] * 8, 3) == []

    def test_perf_monitor_window_bounded_total_monotonic(self):
        from fabstir_vectordb_tpu.utils.tracing import PerfMonitor

        m = PerfMonitor(window=100)
        for i in range(250):
            m.record(float(i))
        assert len(m.records) == 100
        st = m.stats()
        assert st["total_searches"] == 250
        assert st["p50_ms"] >= 150  # quantiles describe the recent window
