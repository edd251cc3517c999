"""Schema-validation tests (mirrors reference src/core/schema.rs tests)."""
import pytest

from fabstir_vectordb_tpu.core import MetadataSchema, SchemaError


SCHEMA = {
    "fields": {
        "title": {"type": "string"},
        "views": {"type": "number"},
        "published": {"type": "boolean"},
        "tags": {"type": "array", "items": {"type": "string"}},
        "author": {"type": "object", "fields": {"name": {"type": "string"}}},
    },
    "required": ["title", "views"],
}


def test_valid_metadata_passes():
    s = MetadataSchema.from_json(SCHEMA)
    s.validate(
        {
            "title": "t",
            "views": 3,
            "published": True,
            "tags": ["a", "b"],
            "author": {"name": "alice"},
        }
    )


def test_missing_required_field():
    s = MetadataSchema.from_json(SCHEMA)
    with pytest.raises(SchemaError, match="required"):
        s.validate({"views": 3})


def test_required_field_null_rejected():
    s = MetadataSchema.from_json(SCHEMA)
    with pytest.raises(SchemaError):
        s.validate({"title": None, "views": 3})


def test_null_allowed_for_optional():
    s = MetadataSchema.from_json(SCHEMA)
    s.validate({"title": "t", "views": 1, "published": None})


def test_wrong_types_rejected():
    s = MetadataSchema.from_json(SCHEMA)
    with pytest.raises(SchemaError):
        s.validate({"title": 5, "views": 3})
    with pytest.raises(SchemaError):
        s.validate({"title": "t", "views": "many"})
    with pytest.raises(SchemaError):
        s.validate({"title": "t", "views": 3, "published": 1})


def test_bool_is_not_number():
    s = MetadataSchema.from_json(SCHEMA)
    with pytest.raises(SchemaError):
        s.validate({"title": "t", "views": True})


def test_array_element_type_checked():
    s = MetadataSchema.from_json(SCHEMA)
    with pytest.raises(SchemaError):
        s.validate({"title": "t", "views": 1, "tags": ["ok", 5]})
    # null elements allowed
    s.validate({"title": "t", "views": 1, "tags": ["ok", None]})


def test_nested_object_fields_checked():
    s = MetadataSchema.from_json(SCHEMA)
    with pytest.raises(SchemaError):
        s.validate({"title": "t", "views": 1, "author": {"name": 7}})
    # undeclared nested fields allowed
    s.validate({"title": "t", "views": 1, "author": {"name": "x", "extra": 1}})


def test_undeclared_top_level_fields_allowed():
    s = MetadataSchema.from_json(SCHEMA)
    s.validate({"title": "t", "views": 1, "other": object})


def test_required_undeclared_is_schema_error():
    with pytest.raises(SchemaError):
        MetadataSchema.from_json({"fields": {}, "required": ["ghost"]})


def test_roundtrip_json():
    s = MetadataSchema.from_json(SCHEMA)
    s2 = MetadataSchema.from_json(s.to_json())
    assert s2.fields.keys() == s.fields.keys()
    assert s2.required == s.required
