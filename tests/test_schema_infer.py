"""A6/E6 — schema inference semantics, mirroring the reference's pinned
behaviors (/root/reference/test/photon/current/schema_test.clj:35-71):
unversioned vs versioned buckets, per-field type/mode/count, nested paths.
"""

import json

import pytest
from pyspark.sql import functions as F

from photon_spark.schema_infer import (
    get_schema, infer_schema_fields, infer_schemas)


@pytest.fixture(scope="module")
def events(spark):
    rows = []
    # stream "chatter": 6 unversioned events with a nested payload (the
    # chatter fixture shape, common.clj:15-35), 3 tagged "0.0.1" whose
    # payload adds a field.
    for i in range(6):
        rows.append(("chatter", None, i + 1, json.dumps({
            "service-id": "request://chatter",
            "text": f"msg {i}",
            "textanalysis": {"aggregateSentiment": 40 + i,
                             "keyphrases": [{"phrase": "x", "count": 1}]},
        })))
    for i in range(3):
        rows.append(("chatter", "0.0.1", 100 + i, json.dumps({
            "service-id": "request://chatter",
            "extra": True,
        })))
    # a second stream, sometimes missing a field (mode=optional)
    for i in range(4):
        payload = {"a": 1.5} if i % 2 else {"a": 2.5, "b": "x"}
        rows.append(("other", None, 200 + i, json.dumps(payload)))
    return spark.createDataFrame(
        rows, "stream_name string, schema_tag string, order_id long, "
              "payload string")


def test_version_buckets(events):
    got = {(r["stream_name"], r["schema_tag"]): r
           for r in infer_schemas(events).collect()}
    assert set(got) == {("chatter", "__unversioned__"), ("chatter", "0.0.1"),
                        ("other", "__unversioned__")}
    assert got[("chatter", "__unversioned__")]["n_samples"] == 6
    assert got[("chatter", "0.0.1")]["n_samples"] == 3


def test_nested_field_inference(events):
    row = (infer_schemas(events)
           .where((F.col("stream_name") == "chatter")
                  & (F.col("schema_tag") == "__unversioned__"))
           .first())
    schema = json.loads(row["schema_json"])
    # schema_test.clj:41-71 analogue: service-id is a required string seen
    # in every sampled doc
    assert schema["service-id"] == {
        "type": "string", "mode": "required", "count": 6}
    assert schema["textanalysis.aggregateSentiment"]["type"] == "long"
    assert schema["textanalysis.keyphrases"]["type"] == "array"
    assert schema["textanalysis.keyphrases[].phrase"]["type"] == "string"


def test_required_vs_optional(events):
    row = (infer_schemas(events)
           .where(F.col("stream_name") == "other").first())
    schema = json.loads(row["schema_json"])
    assert schema["a"]["mode"] == "required" and schema["a"]["count"] == 4
    assert schema["b"]["mode"] == "optional" and schema["b"]["count"] == 2


def test_flat_fields_view(events):
    flat = {(r["stream_name"], r["schema_tag"], r["field_path"]): r
            for r in infer_schema_fields(events).collect()}
    r = flat[("chatter", "0.0.1", "extra")]
    assert r["field_type"] == "boolean"
    assert r["mode"] == "required"
    assert r["n_present"] == 3 == r["n_samples"]
    assert flat[("other", "__unversioned__", "b")]["mode"] == "optional"


def test_get_schema_endpoint(events):
    """E6 GET /schema/:stream-name (handler.clj:256-263)."""
    by_version = get_schema(events, "chatter")
    assert set(by_version) == {"__unversioned__", "0.0.1"}
    assert by_version["0.0.1"]["extra"]["type"] == "boolean"


def test_null_payload_counts_toward_denominator(spark):
    # n_samples counts EVERY sampled row — including null / malformed
    # payloads — matching the oracle's buckets CTE (which counts sampled
    # rows before any JSON parsing). A field present in all parseable docs
    # but not all rows is therefore optional.
    rows = [("s", None, 1, json.dumps({"a": 1})),
            ("s", None, 2, json.dumps({"a": 2})),
            ("s", None, 3, None),
            ("s", None, 4, "not json {{")]
    ev = spark.createDataFrame(
        rows, "stream_name string, schema_tag string, order_id long, "
              "payload string")
    flat = infer_schema_fields(ev).collect()
    assert len(flat) == 1
    r = flat[0]
    assert r["n_samples"] == 4
    assert r["n_present"] == 2
    assert r["mode"] == "optional"
    nested = infer_schemas(ev).first()
    assert nested["n_samples"] == 4
    assert json.loads(nested["schema_json"])["a"]["mode"] == "optional"


def test_inference_is_deterministic(events):
    a = sorted(tuple(r) for r in infer_schemas(events).collect())
    b = sorted(tuple(r) for r in infer_schemas(events).collect())
    assert a == b


# ------------------------------------------------- typed views (SURVEY §1.4)

def test_typed_struct_scalars_and_nesting():
    from pyspark.sql import types as T
    from photon_spark.schema_infer import typed_struct
    schema = {
        "a": {"type": "long", "mode": "required", "count": 2},
        "b": {"type": "double", "mode": "optional", "count": 1},
        "c": {"type": "object", "mode": "required", "count": 2},
        "c.x": {"type": "string", "mode": "required", "count": 2},
        "c.y": {"type": "boolean", "mode": "optional", "count": 1},
        "tags": {"type": "array", "mode": "required", "count": 2},
        "tags[]": {"type": "string", "mode": "optional", "count": 4},
    }
    st = typed_struct(schema)
    by_name = {f.name: f.dataType for f in st.fields}
    assert by_name["a"] == T.LongType()
    assert by_name["b"] == T.DoubleType()
    assert isinstance(by_name["c"], T.StructType)
    inner = {f.name: f.dataType for f in by_name["c"].fields}
    assert inner == {"x": T.StringType(), "y": T.BooleanType()}
    assert by_name["tags"] == T.ArrayType(T.StringType())
    # no phantom sibling field literally named "tags[]"
    assert "tags[]" not in by_name


def test_typed_struct_array_element_types():
    """Regression: '[]'-suffixed paths must become '[]' children of the
    unsuffixed segment, not sibling tree nodes — otherwise every array
    degrades to array<string> and a phantom always-null 'name[]' field
    pollutes the view."""
    from pyspark.sql import types as T
    from photon_spark.schema_infer import typed_struct
    schema = {
        "nums": {"type": "array", "mode": "required", "count": 2},
        "nums[]": {"type": "long", "mode": "optional", "count": 6},
        "c": {"type": "object", "mode": "required", "count": 2},
        "c.xs": {"type": "array", "mode": "required", "count": 2},
        "c.xs[]": {"type": "double", "mode": "optional", "count": 4},
        # array of objects: no entry for the element itself, only its fields
        "objs": {"type": "array", "mode": "required", "count": 1},
        "objs[].k": {"type": "string", "mode": "optional", "count": 3},
        # array of arrays
        "mat": {"type": "array", "mode": "required", "count": 1},
        "mat[]": {"type": "array", "mode": "optional", "count": 2},
        "mat[][]": {"type": "long", "mode": "optional", "count": 4},
    }
    st = typed_struct(schema)
    by_name = {f.name: f.dataType for f in st.fields}
    assert set(by_name) == {"nums", "c", "objs", "mat"}
    assert by_name["nums"] == T.ArrayType(T.LongType())
    inner = {f.name: f.dataType for f in by_name["c"].fields}
    assert inner == {"xs": T.ArrayType(T.DoubleType())}
    assert by_name["objs"] == T.ArrayType(
        T.StructType([T.StructField("k", T.StringType())]))
    assert by_name["mat"] == T.ArrayType(T.ArrayType(T.LongType()))


def test_typed_view_long_array_end_to_end(spark):
    """The inferred view parses a long-array payload to real longs."""
    from pyspark.sql import types as T
    from photon_spark.schema_infer import typed_view
    rows = [("s", None, i, json.dumps({"nums": [i, i + 1], "a": i}))
            for i in range(1, 4)]
    ev = spark.createDataFrame(
        rows, "stream_name string, schema_tag string, order_id long, "
              "payload string")
    tv = typed_view(ev, "s")
    dt = tv.schema["payload_typed"].dataType
    by_name = {f.name: f.dataType for f in dt.fields}
    assert by_name["nums"] == T.ArrayType(T.LongType())
    assert "nums[]" not in by_name
    got = {r["order_id"]: r["payload_typed"] for r in tv.collect()}
    assert list(got[1]["nums"]) == [1, 2]


def test_typed_view_parses_chatter(events):
    """The §1.4 promise end-to-end on the chatter-style fixture: the
    inferred struct parses every payload into typed columns (nested
    object included) without hand-written extraction."""
    from photon_spark.schema_infer import typed_view
    tv = typed_view(events, "chatter")
    rows = {r["order_id"]: r["payload_typed"]
            for r in tv.select("order_id", "payload_typed").collect()}
    assert rows[1]["service-id"] == "request://chatter"
    assert rows[1]["text"] == "msg 0"
    assert rows[1]["textanalysis"]["aggregateSentiment"] == 40
    # merged-version view still parses the versioned rows' extra field
    assert rows[100]["extra"] is True
    # version-pinned view exposes ONLY that version's fields
    tv1 = typed_view(events, "chatter", schema_tag="0.0.1")
    f = {x.name for x in tv1.schema["payload_typed"].dataType.fields}
    assert f == {"service-id", "extra"}


def test_typed_view_null_struct_on_bad_payload(spark):
    from photon_spark.schema_infer import typed_view
    rows = [("s", None, 1, json.dumps({"a": 1})),
            ("s", None, 2, "not json {{")]
    ev = spark.createDataFrame(
        rows, "stream_name string, schema_tag string, order_id long, "
              "payload string")
    got = {r["order_id"]: r["payload_typed"]
           for r in typed_view(ev, "s").collect()}
    assert got[1]["a"] == 1
    assert got[2] is None or got[2]["a"] is None
