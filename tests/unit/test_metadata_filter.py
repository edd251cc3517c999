"""Filter-language semantics tests (mirrors reference tests/unit/metadata_filter_tests.rs)."""
import numpy as np
import pytest

from fabstir_vectordb_tpu.core import MetadataFilter, FilterError
from fabstir_vectordb_tpu.core.metadata_filter import get_field, _MISSING


def m(f):
    return MetadataFilter.from_json(f)


def test_simple_equality():
    f = m({"category": "tech"})
    assert f.matches({"category": "tech", "x": 1})
    assert not f.matches({"category": "news"})
    assert not f.matches({})


def test_equality_number_and_bool():
    assert m({"views": 10}).matches({"views": 10.0})
    assert not m({"published": True}).matches({"published": 1})
    assert m({"published": True}).matches({"published": True})


def test_array_contains_semantics():
    f = m({"tags": "ai"})
    assert f.matches({"tags": ["ml", "ai"]})
    assert not f.matches({"tags": ["ml"]})


def test_in_operator():
    f = m({"status": {"$in": ["active", "pending"]}})
    assert f.matches({"status": "active"})
    assert f.matches({"status": "pending"})
    assert not f.matches({"status": "closed"})
    assert not f.matches({})


def test_in_requires_array():
    with pytest.raises(FilterError):
        m({"status": {"$in": "active"}})


def test_range_operators():
    f = m({"age": {"$gte": 18, "$lte": 65}})
    assert f.matches({"age": 18}) and f.matches({"age": 65})
    assert not f.matches({"age": 17}) and not f.matches({"age": 66})

    g = m({"score": {"$gt": 40, "$lt": 100}})
    assert g.matches({"score": 41})
    assert not g.matches({"score": 40}) and not g.matches({"score": 100})


def test_range_non_numeric_field_fails_match():
    f = m({"age": {"$gte": 18}})
    assert not f.matches({"age": "old"})
    assert not f.matches({"age": True})


def test_mixed_gte_gt_is_error():
    with pytest.raises(FilterError):
        m({"age": {"$gte": 1, "$gt": 2}})
    with pytest.raises(FilterError):
        m({"age": {"$lte": 1, "$lt": 2}})


def test_and_or_combinators():
    f = m({"$and": [{"a": 1}, {"b": 2}]})
    assert f.matches({"a": 1, "b": 2})
    assert not f.matches({"a": 1, "b": 3})

    g = m({"$or": [{"a": 1}, {"b": 2}]})
    assert g.matches({"a": 1}) and g.matches({"b": 2})
    assert not g.matches({"a": 9, "b": 9})


def test_empty_and_matches_everything_empty_or_nothing():
    assert m({"$and": []}).matches({"anything": 1})
    assert not m({"$or": []}).matches({"anything": 1})


def test_implicit_and_multi_field():
    f = m({"a": 1, "b": "x"})
    assert f.matches({"a": 1, "b": "x"})
    assert not f.matches({"a": 1, "b": "y"})


def test_dot_notation_nested_access():
    f = m({"user.id": "123"})
    assert f.matches({"user": {"id": "123"}})
    assert not f.matches({"user": {"id": "456"}})
    assert not f.matches({"user": "flat"})
    assert get_field({"a": {"b": {"c": 1}}}, "a.b.c") == 1
    assert get_field({"a": 1}, "a.b") is _MISSING


def test_unsupported_operator_rejected():
    with pytest.raises(FilterError):
        m({"$not": [{"a": 1}]})
    with pytest.raises(FilterError):
        m({"a": {"$regex": "x"}})


def test_filter_must_be_object():
    with pytest.raises(FilterError):
        m(["a"])
    with pytest.raises(FilterError):
        m("a")


def test_empty_field_object_rejected():
    with pytest.raises(FilterError):
        m({"a": {}})


def test_nested_object_equality():
    f = m({"author": {"name": "alice"}})
    assert f.matches({"author": {"name": "alice"}})
    assert not f.matches({"author": {"name": "bob"}})


def test_compile_mask():
    f = m({"cat": {"$in": ["a", "b"]}})
    rows = [{"cat": "a"}, {"cat": "c"}, None, {"cat": "b"}]
    mask = f.compile_mask(rows)
    assert mask.dtype == bool
    np.testing.assert_array_equal(mask, [True, False, False, True])
