"""VectorStore + FlatIndex engine tests."""
import numpy as np
import pytest

from fabstir_vectordb_tpu.index import VectorStore, FlatIndex
from fabstir_vectordb_tpu.index.store import (
    DuplicateIdError,
    UnknownIdError,
    DimensionMismatchError,
)


def make_store(n=100, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    store = VectorStore(dim, initial_capacity=64)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    store.add_batch([f"v{i}" for i in range(n)], vecs, timestamps=1000.0)
    return store, vecs


class TestVectorStore:
    def test_add_and_lookup(self):
        store, vecs = make_store(10)
        assert store.count == 10 and store.active_count == 10
        np.testing.assert_array_equal(store.get_vector("v3"), vecs[3])
        assert store.row_of("v3") == 3 and store.id_of(3) == "v3"

    def test_duplicate_id_rejected(self):
        store, _ = make_store(5, dim=4)
        with pytest.raises(DuplicateIdError):
            store.add_batch(["v0"], np.zeros((1, 4), np.float32))
        with pytest.raises(DuplicateIdError):
            store.add_batch(["a", "a"], np.zeros((2, 4), np.float32))

    def test_dim_mismatch(self):
        store, _ = make_store(5, dim=4)
        with pytest.raises(DimensionMismatchError):
            store.add_batch(["x"], np.zeros((1, 5), np.float32))

    def test_growth_preserves_data(self):
        store = VectorStore(8, initial_capacity=8)
        rng = np.random.default_rng(0)
        all_vecs = []
        for batch in range(5):
            v = rng.standard_normal((7, 8)).astype(np.float32)
            store.add_batch([f"b{batch}_{i}" for i in range(7)], v)
            all_vecs.append(v)
        assert store.capacity >= 35
        np.testing.assert_array_equal(store.get_vector("b0_0"), all_vecs[0][0])
        np.testing.assert_array_equal(store.get_vector("b4_6"), all_vecs[4][6])

    def test_soft_delete_and_vacuum(self):
        store, _ = make_store(10)
        assert store.mark_deleted("v1")
        assert not store.mark_deleted("v1")  # already deleted
        assert store.is_deleted("v1")
        assert store.active_count == 9 and store.deleted_count == 1
        removed = store.vacuum()
        assert removed == ["v1"]
        assert not store.contains("v1")
        with pytest.raises(UnknownIdError):
            store.row_of("v1")

    def test_unknown_id(self):
        store, _ = make_store(3)
        with pytest.raises(UnknownIdError):
            store.mark_deleted("ghost")


class TestFlatIndex:
    def test_exact_search_matches_numpy(self):
        store, vecs = make_store(80, dim=12)
        idx = FlatIndex(store)
        q = vecs[5] + 0.01
        results = idx.search(q, 5)
        assert results[0][0] == "v5"
        d = np.linalg.norm(vecs - q, axis=1)
        want = np.argsort(d)[:5]
        got_rows = [store.row_of(r[0]) for r in results]
        assert got_rows == list(want)
        np.testing.assert_allclose(
            [r[1] for r in results], np.sort(d)[:5], rtol=1e-4, atol=1e-4
        )

    def test_deleted_rows_excluded(self):
        store, vecs = make_store(30, dim=8)
        idx = FlatIndex(store)
        q = vecs[7]
        assert idx.search(q, 1)[0][0] == "v7"
        store.mark_deleted("v7")
        assert idx.search(q, 1)[0][0] != "v7"

    def test_extra_mask_fused(self):
        store, vecs = make_store(20, dim=8)
        idx = FlatIndex(store)
        mask = np.zeros(store.capacity, bool)
        mask[store.row_of("v9")] = True
        results = idx.search(vecs[0], 5, extra_mask=mask)
        assert [r[0] for r in results] == ["v9"]

    def test_k_larger_than_n(self):
        store, vecs = make_store(4, dim=8)
        idx = FlatIndex(store)
        results = idx.search(vecs[0], 10)
        assert len(results) == 4

    def test_cosine_metric(self):
        store, vecs = make_store(30, dim=8)
        idx = FlatIndex(store, metric="cosine")
        q = 3.0 * vecs[11]  # scale-invariant under cosine
        assert idx.search(q, 1)[0][0] == "v11"


class TestTieredFlatSearcher:
    def test_matches_resident_exact(self, rng):
        from fabstir_vectordb_tpu.index.tiered import TieredFlatSearcher

        n, d, k = 5000, 32, 10
        x = rng.standard_normal((n, d)).astype(np.float32)
        mask = np.ones(n, bool)
        mask[[7, 999, 4321]] = False
        q = x[:6] + 0.01

        tiered = TieredFlatSearcher(x, mask, tile_rows=1024)  # 5 tiles, ragged tail
        assert tiered.n_tiles == 5
        ticks = []
        vals, rows = tiered.search(q, k, progress=ticks.append)
        assert ticks == [0, 1, 2, 3, 4]  # watchdog heartbeat per tile

        dist = ((q[:, None, :] - x[None]) ** 2).sum(-1)
        dist[:, ~mask] = np.inf
        want = np.argsort(dist, axis=1)[:, :k]
        np.testing.assert_array_equal(rows, want)
        np.testing.assert_allclose(
            vals, np.take_along_axis(dist, want, 1), rtol=1e-3, atol=1e-3
        )
        assert not {7, 999, 4321} & set(rows.ravel().tolist())

    def test_extra_mask_and_small_corpus(self, rng):
        from fabstir_vectordb_tpu.index.tiered import TieredFlatSearcher

        n, d, k = 100, 8, 5
        x = rng.standard_normal((n, d)).astype(np.float32)
        tiered = TieredFlatSearcher(x)
        extra = np.zeros(n, bool)
        extra[:10] = True
        vals, rows = tiered.search(x[2][None], k, extra_mask=extra)
        assert rows[0, 0] == 2
        assert set(rows[0].tolist()) <= set(range(10))
        # original mask untouched after the filtered query
        vals2, rows2 = tiered.search(x[50][None], k)
        assert rows2[0, 0] == 50


def test_multi_device_tiered_matches_exact(rng):
    import jax

    from fabstir_vectordb_tpu.index.tiered import MultiDeviceTieredSearcher

    n, d, k = 6000, 16, 7
    x = rng.standard_normal((n, d)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[123] = False
    ms = MultiDeviceTieredSearcher(
        x, mask, devices=jax.devices("cpu")[:8], tile_rows=1024)
    assert len(ms.shards) == 8
    q = x[:5] + 0.01
    vals, rows = ms.search(q, k)

    dist = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    dist[:, 123] = np.inf
    want = np.argsort(dist, axis=1)[:, :k]
    np.testing.assert_array_equal(rows, want)
