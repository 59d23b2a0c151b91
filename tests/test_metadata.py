"""Dataset definition validation matrix + inherit frozen-field rules,
ported from /root/reference/test/io/mandoline/dataset_test.clj:15-121
and src/io/mandoline/test/invalid_metadata.clj:9-61."""

import math

import pytest

from mandoline_spark.core import metadata as md

GOOD = {
    "dimensions": {"x": 4, "y": 5, "z": 6},
    "chunk-dimensions": {"x": 2, "y": 2, "z": 2},
    "variables": {
        "foo": {"type": "double", "shape": ["x", "y", "z"], "fill-value": -3},
    },
}


def variant(**overrides):
    out = {k: dict(v) for k, v in GOOD.items()}
    for k, v in overrides.items():
        out[k] = v
    return out


def test_good_definition_passes():
    md.validate_dataset_definition(GOOD)


@pytest.mark.parametrize("missing", ["dimensions", "variables", "chunk-dimensions"])
def test_missing_top_level_key(missing):
    bad = variant()
    del bad[missing]
    with pytest.raises(ValueError):
        md.validate_dataset_definition(bad)


def test_chunk_dims_must_map_one_to_one():
    bad = variant(**{"chunk-dimensions": {"x": 2, "y": 2}})
    with pytest.raises(ValueError):
        md.validate_dataset_definition(bad)
    bad = variant(**{"chunk-dimensions": {"x": 2, "y": 2, "z": 2, "q": 2}})
    with pytest.raises(ValueError):
        md.validate_dataset_definition(bad)


@pytest.mark.parametrize("field", ["shape", "type", "fill-value"])
def test_variable_requires_fields(field):
    bad = variant()
    v = dict(bad["variables"]["foo"])
    del v[field]
    bad["variables"] = {"foo": v}
    with pytest.raises(ValueError):
        md.validate_dataset_definition(bad)


@pytest.mark.parametrize(
    "typ", ["string", "bool", "boolean", "uint", "ushort", "object", "int8"]
)
def test_unsupported_types_rejected(typ):
    bad = variant()
    bad["variables"] = {
        "foo": {"type": typ, "shape": ["x"], "fill-value": 0}
    }
    with pytest.raises(ValueError):
        md.validate_dataset_definition(bad)


@pytest.mark.parametrize("typ", sorted(md.SUPPORTED_TYPES))
def test_all_seven_types_accepted(typ):
    good = variant()
    good["variables"] = {"foo": {"type": typ, "shape": ["x"], "fill-value": 0}}
    md.validate_dataset_definition(good)


@pytest.mark.parametrize("typ", ["byte", "char", "short", "int", "long"])
def test_nan_fill_rejected_for_integral_types(typ):
    bad = variant()
    bad["variables"] = {
        "foo": {"type": typ, "shape": ["x"], "fill-value": float("nan")}
    }
    with pytest.raises(ValueError):
        md.validate_dataset_definition(bad)


@pytest.mark.parametrize("typ", ["float", "double"])
def test_nan_fill_allowed_for_float_types(typ):
    good = variant()
    good["variables"] = {
        "foo": {"type": typ, "shape": ["x"], "fill-value": float("nan")}
    }
    md.validate_dataset_definition(good)


def test_non_numeric_fill_rejected():
    for fill in ["0", None, True, [0]]:
        bad = variant()
        bad["variables"] = {
            "foo": {"type": "int", "shape": ["x"], "fill-value": fill}
        }
        with pytest.raises(ValueError):
            md.validate_dataset_definition(bad)


def test_shape_dims_must_exist():
    bad = variant()
    bad["variables"] = {
        "foo": {"type": "int", "shape": ["x", "nope"], "fill-value": 0}
    }
    with pytest.raises(ValueError):
        md.validate_dataset_definition(bad)


# -- inherit / frozen fields -------------------------------------------------


def _parent():
    tok = md.new_version(md.create(GOOD))
    return tok


def test_inherit_sets_parent_and_chunk_dims():
    parent = _parent()
    child = {"dimensions": {"x": 8, "y": 5, "z": 6}, "variables": dict(GOOD["variables"])}
    out = md.inherit(child, parent)
    assert out["parent"] == parent["version-id"]
    assert out["chunk-dimensions"] == GOOD["chunk-dimensions"]


def test_inherit_rejects_changed_chunk_dims():
    parent = _parent()
    child = variant(**{"chunk-dimensions": {"x": 3, "y": 2, "z": 2}})
    with pytest.raises(ValueError):
        md.inherit(child, parent)


def test_inherit_rejects_type_shape_fill_changes():
    parent = _parent()
    for change in [
        {"type": "float", "shape": ["x", "y", "z"], "fill-value": -3},
        {"type": "double", "shape": ["x", "y"], "fill-value": -3},
        {"type": "double", "shape": ["x", "y", "z"], "fill-value": -4},
    ]:
        child = variant()
        child["variables"] = {"foo": change}
        with pytest.raises(ValueError):
            md.inherit(child, parent)


def test_inherit_allows_new_variables():
    parent = _parent()
    child = variant()
    child["variables"]["bork"] = {
        "type": "float", "shape": ["x"], "fill-value": float("nan")
    }
    out = md.inherit(child, parent)
    assert "bork" in out["variables"]


def test_nan_fill_frozen_across_versions():
    base = variant()
    base["variables"] = {
        "foo": {"type": "double", "shape": ["x"], "fill-value": float("nan")}
    }
    parent = md.new_version(md.create(base))
    out = md.inherit({k: dict(v) for k, v in base.items()}, parent)
    assert math.isnan(out["variables"]["foo"]["fill-value"])


def test_json_nan_roundtrip():
    tok = {"fill-value": float("nan"), "x": 1}
    text = md.generate_metadata(tok)
    assert "NaN" in text and '"NaN"' not in text
    back = md.parse_metadata(text)
    assert math.isnan(back["fill-value"]) and back["x"] == 1


def test_version_ids_monotonic():
    a = md.new_version({})["version-id"]
    b = md.new_version({})["version-id"]
    assert b > a


def test_parse_uri_forms():
    from mandoline_spark.store import parse_uri
    import pytest

    assert parse_uri("mand:///data/stores/main/weather") == (
        "/data/stores/main", "weather", None
    )
    assert parse_uri("mand://rel/path/ds#17") == ("rel/path", "ds", 17)
    assert parse_uri("mand:///r/ds#-1") == ("/r", "ds", -1)
    for bad in ["ddb://x/y", "mand://", "mand://onlyroot", "mand:///r/ds#x"]:
        with pytest.raises(ValueError):
            parse_uri(bad)


def test_connect_uri_roundtrip(store):
    from mandoline_spark.store import connect_uri

    store.create_dataset("ds1")
    conn = connect_uri(store.spark, f"mand://{store.root}/ds1")
    assert conn.name == "ds1"
