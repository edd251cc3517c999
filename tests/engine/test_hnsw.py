"""HNSW engine tests (mirrors reference tests/hnsw/* behavior)."""
import numpy as np
import pytest

from fabstir_vectordb_tpu.index import VectorStore, HNSWIndex, HNSWConfig, FlatIndex
from fabstir_vectordb_tpu.index.flat import recall_at_k


def build_index(n=300, dim=16, seed=0, **cfg_kw):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    store = VectorStore(dim)
    rows = store.add_batch([f"v{i}" for i in range(n)], vecs)
    cfg = HNSWConfig(seed=seed, **cfg_kw)
    hnsw = HNSWIndex(store, cfg)
    hnsw.insert_rows(rows)
    return store, hnsw, vecs


class TestBuildAndSearch:
    def test_single_node(self):
        store = VectorStore(8)
        rows = store.add_batch(["only"], np.ones((1, 8), np.float32))
        hnsw = HNSWIndex(store)
        hnsw.insert_rows(rows)
        d, r = hnsw.search_rows(np.ones((1, 8), np.float32), 3)
        assert r[0, 0] == 0 and d[0, 0] < 1e-4
        assert r[0, 1] == -1

    def test_empty_graph(self):
        store = VectorStore(8)
        hnsw = HNSWIndex(store)
        d, r = hnsw.search_rows(np.zeros((2, 8), np.float32), 3)
        assert (r == -1).all()

    def test_exact_neighbor_found(self):
        store, hnsw, vecs = build_index(n=200)
        for i in (0, 57, 199):
            d, r = hnsw.search_rows(vecs[i][None], 1)
            assert r[0, 0] == i
            assert d[0, 0] < 1e-2

    def test_recall_vs_flat(self):
        store, hnsw, vecs = build_index(n=800, dim=24)
        rng = np.random.default_rng(7)
        q = rng.standard_normal((32, 24)).astype(np.float32)
        _, rows = hnsw.search_rows(q, 10, ef=100)
        oracle = FlatIndex(store)
        rec = recall_at_k(oracle, rows, q, 10)
        assert rec >= 0.9, f"recall {rec}"

    def test_recall_improves_with_ef(self):
        store, hnsw, vecs = build_index(n=1000, dim=16)
        rng = np.random.default_rng(3)
        q = rng.standard_normal((24, 16)).astype(np.float32)
        oracle = FlatIndex(store)
        recalls = []
        for ef in (10, 200):
            _, rows = hnsw.search_rows(q, 10, ef=ef)
            recalls.append(recall_at_k(oracle, rows, q, 10))
        assert recalls[-1] >= recalls[0]
        assert recalls[-1] >= 0.95

    def test_batch_queries(self):
        store, hnsw, vecs = build_index(n=300)
        q = np.stack([vecs[3], vecs[100], vecs[250]])
        _, rows = hnsw.search_rows(q, 1)
        assert list(rows[:, 0]) == [3, 100, 250]

    def test_incremental_insert_after_build(self):
        store, hnsw, vecs = build_index(n=300, dim=8)
        new = (vecs[10] + 0.01).reshape(1, 8)
        rows = store.add_batch(["new"], new)
        hnsw.insert_rows(rows)
        d, r = hnsw.search_rows(new, 1)
        assert store.id_of(int(r[0, 0])) == "new"


class TestDeletion:
    def test_deleted_excluded_from_results(self):
        store, hnsw, vecs = build_index(n=200)
        q = vecs[50][None]
        store.mark_deleted("v50")
        _, rows = hnsw.search_rows(q, 5)
        assert 50 not in rows[0]

    def test_entry_point_deletion_recovers(self):
        store, hnsw, vecs = build_index(n=100)
        entry_id = store.id_of(hnsw.entry_point)
        store.mark_deleted(entry_id)
        d, rows = hnsw.search_rows(vecs[3][None], 5)
        assert (rows[0] >= 0).sum() >= 5  # search still works

    def test_vacuum_scrubs_graph(self):
        store, hnsw, vecs = build_index(n=150)
        for i in range(10):
            store.mark_deleted(f"v{i}")
        removed = hnsw.vacuum()
        assert removed == 10
        assert hnsw.num_nodes == 140
        integrity = hnsw.check_integrity()
        assert integrity["ok"], integrity["dangling_refs"][:5]
        # remaining vectors still searchable
        _, rows = hnsw.search_rows(vecs[100][None], 1)
        assert rows[0, 0] == 100


class TestStats:
    def test_graph_stats(self):
        store, hnsw, vecs = build_index(n=200)
        stats = hnsw.graph_stats()
        assert stats.num_nodes == 200
        assert stats.num_edges > 200
        assert stats.avg_degree > 1
        assert stats.max_layer >= 0
        assert hnsw.memory_usage_bytes() > 0

    def test_level_distribution_geometric(self):
        store, hnsw, vecs = build_index(n=1000)
        levels = hnsw.levels[hnsw.member_rows()]
        frac_upper = (levels >= 1).mean()
        # P(level>=1) = 0.408; allow generous tolerance
        assert 0.3 < frac_upper < 0.52


def test_optimize_connections_orders_by_distance(rng):
    store = VectorStore(8)
    x = rng.standard_normal((200, 8)).astype(np.float32)
    rows = store.add_batch([f"v{i}" for i in range(200)], x)
    h = HNSWIndex(store)
    h.insert_rows(rows)
    touched = h.optimize_connections()
    assert touched == 200
    # every list now ascends by distance (invalid slots trail)
    for r in rows[:20]:
        lst = h.nbrs0[r]
        valid = lst[lst >= 0]
        d = ((store.data[valid] - store.data[r]) ** 2).sum(-1)
        assert (np.diff(d) >= -1e-5).all()
    # search still correct
    q = x[:4] + 0.01
    _, got = h.search_rows(q, 5)
    assert (got[:, 0] == rows[:4]).all()


def test_defragment_reclaims_after_removal(rng):
    store = VectorStore(8)
    x = rng.standard_normal((300, 8)).astype(np.float32)
    rows = store.add_batch([f"v{i}" for i in range(300)], x)
    h = HNSWIndex(store)
    h.insert_rows(rows)
    before = h.up_count
    # remove a third of the nodes, then physically drop them
    for i in range(0, 300, 3):
        store.mark_deleted(f"v{i}")
    h.remove_rows(rows[::3])
    reclaimed = h.defragment()
    assert reclaimed >= 0
    assert h.up_count <= before
    q = x[1][None] + 0.01
    _, got = h.search_rows(q, 5)
    assert got[0, 0] == rows[1]
    assert h.check_integrity()["ok"]


@pytest.mark.parametrize("mode", ["layer0", "per_layer"])
def test_link_modes_build_searchable_graphs(rng, mode):
    """Beam-based construction paths (used above FLAT_THRESHOLD) still
    build graphs with solid recall."""
    store = VectorStore(16)
    x = rng.standard_normal((400, 16)).astype(np.float32)
    rows = store.add_batch([f"v{i}" for i in range(400)], x)
    h = HNSWIndex(store, HNSWConfig(link_mode=mode, seed=7))
    h.insert_rows(rows)
    q = x[:16] + 0.01
    _, got = h.search_rows(q, 5, ef=64)
    top1 = (got[:, 0] == rows[:16]).mean()
    assert top1 >= 0.9, f"{mode}: top1={top1}"


def test_device_mirror_delta_matches_full_upload(rng):
    """Incremental adjacency mirror (dirty-row scatters) must equal a full
    re-upload after multiple insert/delete rounds."""
    import jax.numpy as jnp

    store = VectorStore(8)
    x = rng.standard_normal((600, 8)).astype(np.float32)
    rows = store.add_batch([f"v{i}" for i in range(600)], x)
    h = HNSWIndex(store)
    for lo in range(0, 600, 150):  # several batches -> several delta updates
        h.insert_rows(rows[lo:lo + 150])
        dev = h._device_arrays()
    store.mark_deleted("v10")
    h.insert_rows(np.array([], np.int64))  # no-op
    dev = h._device_arrays()
    np.testing.assert_array_equal(np.asarray(dev["nbrs0"]), h.nbrs0)
    np.testing.assert_array_equal(np.asarray(dev["nbrs_up"]), h.nbrs_up)
    np.testing.assert_array_equal(np.asarray(dev["up_offset"]), h.up_offset)


def test_reverse_link_prune_popular_target(rng=None):
    """A batch whose members all point at one popular region must leave every
    reverse list width-bounded, duplicate-free, and containing near links.

    Exercises the overfull branch of _add_reverse_links_bulk (flat-pair
    ranking + truncated heuristic): one tight cluster guarantees hundreds of
    reverse additions landing on the same few targets in a single batch.
    """
    rng = np.random.default_rng(7)
    dim = 16
    n = 2048
    # one dominant tight cluster -> popular targets
    vecs = 0.05 * rng.standard_normal((n, dim)).astype(np.float32)
    vecs[: n // 8] += rng.standard_normal((n // 8, dim)).astype(np.float32)
    store = VectorStore(dim)
    rows = store.add_batch([f"v{i}" for i in range(n)], vecs)
    cfg = HNSWConfig(seed=3)
    hnsw = HNSWIndex(store, cfg)
    hnsw.insert_rows(rows)

    members = hnsw.member_rows()
    assert len(members) == n
    for row in members[:: 64]:
        lst = hnsw.nbrs0[row]
        real = lst[lst >= 0]
        assert len(real) <= cfg.m0
        assert len(np.unique(real)) == len(real), "duplicate reverse links"
        assert (real != row).all(), "self link"
    # graph must remain navigable: near-perfect self-recall
    q = vecs[:: 97]
    d, ids = hnsw.search_rows(q, k=1, ef=64)
    assert (ids[:, 0] == np.arange(n)[:: 97]).mean() >= 0.95


def test_beam_expand_preserves_recall(monkeypatch):
    """expand=4 must match expand=1 quality: wider per-step expansion only
    ADDS explored nodes (termination still keys on the single best), so
    recall cannot degrade."""
    import os
    store, hnsw, vecs = build_index(n=3000, dim=24, seed=11)
    q = vecs[::29]
    truth = FlatIndex(store)
    recalls = {}
    for w in (1, 4):
        monkeypatch.setenv("FVDB_BEAM_EXPAND", str(w))
        _, ids = hnsw.search_rows(q, k=10, ef=48)
        recalls[w] = recall_at_k(truth, ids, q, 10)
    assert recalls[4] >= recalls[1] - 0.02, recalls
    assert recalls[4] >= 0.9, recalls


def test_ef_smaller_than_k_still_returns_k():
    """ef < k must not shrink the result set (ef clamps to >= k)."""
    store, hnsw, vecs = build_index(n=400, dim=16, seed=21)
    d, ids = hnsw.search_rows(vecs[:4], k=20, ef=4)
    assert ids.shape == (4, 20)
    assert (ids >= 0).all()
    assert (ids[:, 0] == np.arange(4)).all()
    assert (np.diff(d, axis=1) >= -1e-6).all()  # ascending
