"""core.types semantics (reference parity: src/types/mod.rs, types.rs —
VectorId blake3 content hashing, SearchResult dedup, camelCase aliases)."""
import numpy as np
import pytest

from fabstir_vectordb_tpu.core.types import (
    Embedding,
    S5Metadata,
    SearchResult,
    VectorId,
    VideoMetadata,
    VideoNFTMetadata,
    deduplicate_results,
    distance_to_score,
)


class TestVectorId:
    def test_content_hash_deterministic_and_distinct(self):
        a1 = VectorId.from_string("hello")
        a2 = VectorId.from_string("hello")
        b = VectorId.from_string("world")
        assert a1 == a2 and hash(a1) == hash(a2)
        assert a1 != b
        assert len(a1.to_hex()) == 64  # full 32-byte digest

    def test_display_truncates_but_identity_is_full_digest(self):
        a = VectorId.from_string("hello")
        assert str(a).startswith("vec_") and len(str(a)) == 4 + 8
        rt = VectorId.from_hex(a.to_hex())
        assert rt == a

    def test_from_hex_roundtrip_rejects_garbage(self):
        with pytest.raises(ValueError):
            VectorId.from_hex("zz")


class TestSearchResults:
    def test_sort_and_dedup_keeps_best_score(self):
        rs = [
            SearchResult(id="a", distance=0.5),
            SearchResult(id="b", distance=0.1),
            SearchResult(id="a", distance=0.2),
        ]
        out = deduplicate_results(rs)
        ids = [r.id for r in out]
        assert ids == ["b", "a"]  # sorted ascending by distance, deduped
        best_a = next(r for r in out if r.id == "a")
        assert best_a.distance == 0.2

    def test_distance_to_score_monotone(self):
        assert distance_to_score(0.0) == 1.0
        assert distance_to_score(1.0) == 0.5
        assert distance_to_score(3.0) < distance_to_score(1.0)


class TestEmbedding:
    def test_cosine_and_euclidean(self):
        e1 = Embedding(values=[1.0, 0.0])
        e2 = Embedding(values=[0.0, 1.0])
        assert e1.cosine_similarity(e2) == pytest.approx(0.0, abs=1e-6)
        assert e1.euclidean_distance(e2) == pytest.approx(np.sqrt(2), abs=1e-6)
        assert e1.dimension == 2


class TestJsonAliases:
    def test_video_metadata_camelcase_roundtrip(self):
        d = {"videoId": "v1", "title": "t", "durationSeconds": 12.5}
        m = VideoMetadata.from_json(d)
        out = m.to_json()
        rt = VideoMetadata.from_json(out)
        assert rt.to_json() == out

    def test_video_nft_roundtrip(self):
        m = VideoNFTMetadata.from_json({"name": "clip", "tokenId": "7"})
        out = m.to_json()
        assert VideoNFTMetadata.from_json(out).to_json() == out

    def test_s5_metadata_roundtrip(self):
        m = S5Metadata.from_json({"cid": "s5://x", "size": 10,
                                  "mimeType": "video/mp4",
                                  "createdAt": 123})
        assert S5Metadata.from_json(m.to_json()).to_json() == m.to_json()
