"""Embedded bindings surface: Vector/VectorBatch math, video helpers,
domain metadata types, streaming top-k, angular distance.

Behavioral parity targets: reference bindings/wasm/src/vector.rs,
bindings/wasm/src/video.rs, src/types/mod.rs, src/core/vector_ops.rs
(StreamingTopK :204-263, angular/IP corrections :581-596).
"""
import numpy as np
import pytest

from fabstir_vectordb_tpu.core.types import (
    S5Metadata,
    VideoMetadata,
    VideoNFTMetadata,
)
from fabstir_vectordb_tpu.embedded import (
    Vector,
    VectorBatch,
    VideoClustering,
    VideoRecommender,
    VideoSimilarityIndex,
    cosine_similarity,
    cosine_similarity_simd,
    euclidean_distance,
)
from fabstir_vectordb_tpu.ops import StreamingTopK, angular_distance


class TestVector:
    def test_dimension_get_magnitude(self):
        v = Vector([3.0, 4.0])
        assert v.dimension() == 2
        assert v.get(0) == 3.0
        assert v.magnitude() == pytest.approx(5.0)
        with pytest.raises(IndexError):
            v.get(2)

    def test_normalize(self):
        v = Vector([3.0, 4.0]).normalize()
        assert v.magnitude() == pytest.approx(1.0)
        # zero vector normalizes to itself (vector.rs:30-40)
        z = Vector([0.0, 0.0]).normalize()
        assert z.magnitude() == 0.0

    def test_cosine_and_euclidean(self):
        a, b = Vector([1.0, 0.0]), Vector([0.0, 1.0])
        assert cosine_similarity(a, b) == pytest.approx(0.0, abs=1e-6)
        assert cosine_similarity(a, a) == pytest.approx(1.0, rel=1e-5)
        assert euclidean_distance(a, b) == pytest.approx(np.sqrt(2), rel=1e-6)
        assert cosine_similarity_simd(a, b) == cosine_similarity(a, b)

    def test_dimension_mismatch(self):
        with pytest.raises(ValueError, match="Dimension mismatch"):
            cosine_similarity(Vector([1.0]), Vector([1.0, 2.0]))
        with pytest.raises(ValueError, match="Dimension mismatch"):
            euclidean_distance(Vector([1.0]), Vector([1.0, 2.0]))

    def test_zero_magnitude_cosine_is_zero(self):
        assert cosine_similarity(Vector([0.0, 0.0]), Vector([1.0, 0.0])) == 0.0

    def test_batch_similarities(self):
        batch = VectorBatch()
        batch.add_vector(Vector([1.0, 0.0]))
        batch.add_vector(Vector([0.0, 1.0]))
        batch.add_vector(Vector([1.0, 1.0]))
        sims = batch.compute_similarities(Vector([1.0, 0.0]))
        assert len(batch) == 3
        assert sims[0] == pytest.approx(1.0, rel=1e-5)
        assert sims[1] == pytest.approx(0.0, abs=1e-6)
        assert sims[2] == pytest.approx(1 / np.sqrt(2), rel=1e-5)

    def test_empty_batch(self):
        assert len(VectorBatch().compute_similarities(Vector([1.0]))) == 0


class TestVideoSimilarityIndex:
    def test_find_similar_includes_self_first(self):
        ix = VideoSimilarityIndex()
        ix.add_video("a", [1.0, 0.0], ["tag1"])
        ix.add_video("b", [0.9, 0.1])
        ix.add_video("c", [0.0, 1.0])
        out = ix.find_similar("a", 2)
        assert [o.id for o in out] == ["a", "b"]
        assert out[0].similarity == pytest.approx(1.0, rel=1e-5)

    def test_unknown_video(self):
        with pytest.raises(KeyError, match="not found"):
            VideoSimilarityIndex().find_similar("nope", 3)


class TestVideoRecommender:
    def test_recommend_excludes_watched(self):
        rec = VideoRecommender()
        rec.add_video("w1", [1.0, 0.0], "action")
        rec.add_video("w2", [0.9, 0.1], "action")
        rec.add_video("new1", [0.95, 0.05], "action")
        rec.add_video("far", [0.0, 1.0], "drama")
        out = rec.recommend_from_history(["w1", "w2"], 2)
        assert [o.id for o in out] == ["new1", "far"]
        assert out[0].category == "action"
        assert out[1].category == "drama"
        assert out[0].score > out[1].score

    def test_empty_history(self):
        rec = VideoRecommender()
        rec.add_video("a", [1.0], "x")
        assert rec.recommend_from_history([], 5) == []
        assert rec.recommend_from_history(["unknown"], 5) == []


class TestVideoClustering:
    def test_two_well_separated_clusters(self):
        vc = VideoClustering()
        rng = np.random.default_rng(0)
        for i in range(10):
            vc.add_video(f"a{i}", [10.0, 0.0] + 0.1 * rng.standard_normal(2))
        for i in range(10):
            vc.add_video(f"b{i}", [0.0, 10.0] + 0.1 * rng.standard_normal(2))
        clusters = vc.cluster(2)
        assert len(clusters) == 2
        groups = [set(c.video_ids) for c in clusters]
        total = set().union(*groups)
        assert len(total) == 20
        for g in groups:
            prefixes = {vid[0] for vid in g}
            assert len(prefixes) == 1  # pure clusters

    def test_k_capped_and_empty(self):
        vc = VideoClustering()
        assert vc.cluster(3) == []
        vc.add_video("only", [1.0, 2.0])
        clusters = vc.cluster(5)
        assert len(clusters) == 1
        assert clusters[0].video_ids == ["only"]


class TestDomainTypes:
    def test_video_metadata_roundtrip(self):
        m = VideoMetadata(video_id="v1", title="T", tags=["a"],
                          duration_seconds=120, model_name="MiniLM")
        assert VideoMetadata.from_json(m.to_json()) == m

    def test_nft_camelcase_aliases(self):
        d = {
            "address": "0xabc", "id": "1", "image": "img", "name": "n",
            "type": "video", "genre": ["g"], "attributes": [],
            "mintDateTime": "2025-01-01T00:00:00Z",
            "posterImage": "poster.png", "userPub": "pubkey",
        }
        m = VideoNFTMetadata.from_json(d)
        assert m.mint_date_time == "2025-01-01T00:00:00Z"
        assert m.poster_image == "poster.png"
        assert m.user_pub == "pubkey"
        # canonical snake_case output; None optionals omitted
        out = m.to_json()
        assert out["mint_date_time"] == "2025-01-01T00:00:00Z"
        assert "summary" not in out and "supply" not in out
        # snake_case input also accepted
        m2 = VideoNFTMetadata.from_json(out)
        assert m2.poster_image == "poster.png"

    def test_s5_metadata(self):
        m = S5Metadata(cid="abc", size=100, mime_type="application/cbor",
                       created_at=1700000000, encryption="xchacha20-poly1305")
        assert S5Metadata.from_json(m.to_json()) == m


class TestStreamingTopK:
    def test_keeps_k_best(self):
        tk = StreamingTopK(3)
        for d, vid in [(5.0, "e"), (1.0, "a"), (4.0, "d"), (2.0, "b"),
                       (3.0, "c")]:
            tk.push(d, vid)
        assert tk.results() == [(1.0, "a"), (2.0, "b"), (3.0, "c")]
        assert tk.worst == 3.0
        assert len(tk) == 3

    def test_not_full_worst_is_inf(self):
        tk = StreamingTopK(5)
        tk.push(1.0, "a")
        assert tk.worst == float("inf")

    def test_push_many_and_invalid_k(self):
        tk = StreamingTopK(2)
        tk.push_many([3.0, 1.0, 2.0], ["c", "a", "b"])
        assert [i for _, i in tk.results()] == ["a", "b"]
        with pytest.raises(ValueError):
            StreamingTopK(0)


class TestAngular:
    def test_angular_distance(self):
        import jax.numpy as jnp

        a = jnp.array([1.0, 0.0])
        b = jnp.array([0.0, 1.0])
        assert float(angular_distance(a, b)) == pytest.approx(np.pi / 2,
                                                              rel=1e-5)
        assert float(angular_distance(a, a)) == pytest.approx(0.0, abs=1e-3)
        # zero vector -> cosine 0 -> pi/2
        z = jnp.array([0.0, 0.0])
        assert float(angular_distance(z, b)) == pytest.approx(np.pi / 2,
                                                              rel=1e-5)
