"""A6 — sampled JSON schema inference per (stream, schema version).

Reference behavior (default_projs.clj:8-26, schema_test.clj:38-71): the
built-in __streams__ projection infers a schema per (stream-name, schema
version) bucket — ALWAYS from the first 10 events of a version, then a 2%
sample; events without a ``schema`` tag land in the ``__unversioned__``
bucket. The inferred record maps field-path → {type, mode
required/optional, count}.

Spark-first design: the sampling filter is pure Catalyst (window row_number
for the first-10 rule + a deterministic hash-based ~2% rule — the first two
hex chars of md5(order_id) below '05', i.e. 5/256 ≈ 1.95%; md5 rather than
xxhash64/rand so the rule is reproducible AND portable to the DuckDB
oracle); only the sampled rows (≤10 + ~2%) cross into Python, where
per-group schema maps merge in applyInPandas. At 100 TB the Python cost is
bounded by the sample, not the table.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from photon_spark.events import UNVERSIONED

FIRST_N = 10
SAMPLE_HEX_LT = "05"  # md5 prefix rule: 5/256 ≈ 2%

SCHEMA_RESULT = ("stream_name string, schema_tag string, n_samples long, "
                 "schema_json string")

FIELDS_RESULT = ("stream_name string, schema_tag string, field_path string, "
                 "field_type string, n_present long, mode string, "
                 "n_samples long")


def _sample_filter(order_col: str):
    """The deterministic ~2% rule shared by both inference surfaces."""
    return (F.substring(F.md5(F.col(order_col).cast("string")), 1, 2)
            < SAMPLE_HEX_LT)


def _sampled(events: DataFrame, payload_col: str, stream_col: str,
             version_col: str, order_col: str) -> DataFrame:
    """→ (stream_name, schema_tag, payload) rows passing first-N-or-sample.

    Two branches instead of one windowed OR-filter: a bare
    ``row_number() <= N`` predicate gets the rank-limit pushdown
    (WindowGroupLimit keeps ≤N rows per group per map partition BEFORE the
    exchange), while the OR-form forces every row through the full
    shuffle+sort. The md5 branch is map-side only; the overlap between the
    branches is removed by a key dedup over the (tiny) sampled relation.
    """
    version = F.coalesce(F.col(version_col), F.lit(UNVERSIONED))
    base = events.withColumn("_ver", version)
    w = Window.partitionBy(stream_col, "_ver").orderBy(order_col)
    first_n = (base.withColumn("_rn", F.row_number().over(w))
                   .where(F.col("_rn") <= FIRST_N).drop("_rn"))
    sampled = base.where(_sample_filter(order_col))
    return (first_n.unionByName(sampled)
            .dropDuplicates([stream_col, "_ver", order_col])
            .select(F.col(stream_col).alias("stream_name"),
                    F.col("_ver").alias("schema_tag"),
                    F.col(payload_col).alias("payload")))


def _merge_value(schema: dict, path: str, value) -> None:
    # Path encoding contract: "." joins object fields and a "[]" SUFFIX
    # marks an array's element type. The suffix is RESERVED — a JSON
    # field literally named "x[]" is indistinguishable from the element
    # path of a sibling array "x", and _split_path (typed_struct) folds
    # it into that array's element type. Every consumer of inferred
    # paths assumes this encoding; it is owned here, at generation.
    if isinstance(value, dict):
        for k, v in value.items():
            _merge_value(schema, f"{path}.{k}" if path else k, v)
        return
    if isinstance(value, list):
        entry = schema.setdefault(path or "$", {"types": set(), "count": 0})
        entry["types"].add("array")
        entry["count"] += 1
        for v in value[:5]:  # bounded element sampling
            _merge_value(schema, f"{path}[]", v)
        return
    t = ("null" if value is None else
         "boolean" if isinstance(value, bool) else
         "long" if isinstance(value, int) else
         "double" if isinstance(value, float) else "string")
    entry = schema.setdefault(path or "$", {"types": set(), "count": 0})
    entry["types"].add(t)
    entry["count"] += 1


def infer_schemas(events: DataFrame, payload_col: str = "payload",
                  stream_col: str = "stream_name",
                  version_col: str = "schema_tag",
                  order_col: str = "order_id") -> DataFrame:
    """→ DataFrame[stream_name, schema_tag, n_samples, schema_json].

    schema_json: {field_path: {"type": ..., "mode": "required"|"optional",
    "count": n}} — mode is "required" iff the field appeared in every
    sampled ROW of the bucket (null/unparseable payloads count toward the
    denominator, matching the SQL oracle; the reference's required/optional
    semantics otherwise, schema_test.clj:41-71).
    """
    sampled = _sampled(events, payload_col, stream_col, version_col,
                       order_col)

    def merge_group(pdf):
        import pandas as pd
        schema: dict = {}
        # same denominator rule as infer_schema_fields: every sampled row
        # counts (parse failures included), keeping both inference surfaces
        # and the SQL oracle in agreement on n_samples/mode.
        n = len(pdf)
        for payload in pdf["payload"]:
            if payload is None:
                continue
            try:
                doc = json.loads(payload)
            except (ValueError, TypeError):
                continue
            _merge_value(schema, "", doc)
        out = {
            path: {
                "type": sorted(e["types"] - {"null"})[0]
                        if e["types"] - {"null"} else "null",
                "mode": "required" if e["count"] >= n and "[]" not in path
                        else "optional",
                "count": e["count"],
            }
            for path, e in schema.items()
        }
        return pd.DataFrame({
            "stream_name": [pdf["stream_name"].iloc[0]],
            "schema_tag": [pdf["schema_tag"].iloc[0]],
            "n_samples": [n],
            "schema_json": [json.dumps(out, sort_keys=True)],
        })

    return (sampled.groupBy("stream_name", "schema_tag")
            .applyInPandas(merge_group, schema=SCHEMA_RESULT))


def infer_schema_fields(events: DataFrame, payload_col: str = "payload",
                        stream_col: str = "stream_name",
                        version_col: str = "schema_tag",
                        order_col: str = "order_id") -> DataFrame:
    """Flat per-field inference view, one row per
    (stream, version, top-level field):

    → DataFrame[stream_name, schema_tag, field_path, field_type, n_present,
    mode, n_samples] — the SQL-checkable form of :func:`infer_schemas`
    (same sampling, same merge semantics; types use the portable vocabulary
    long/double/string/boolean/object/array/null with the
    alphabetically-first non-null type winning on mixed fields, exactly as
    ``_merge_value``'s reduction does).
    """
    sampled = _sampled(events, payload_col, stream_col, version_col,
                       order_col)

    def flat_fields(pdf):
        fields: dict = {}
        # n_samples counts EVERY sampled row of the bucket — including
        # null / malformed / non-object payloads — matching the oracle's
        # buckets CTE (which counts sampled rows before any JSON parsing).
        # A field is therefore "required" only if present in every sampled
        # ROW, not just every parseable document.
        n = len(pdf)
        for payload in pdf["payload"]:
            if payload is None:
                continue
            try:
                doc = json.loads(payload)
            except (ValueError, TypeError):
                continue
            if not isinstance(doc, dict):
                continue
            for k, v in doc.items():
                t = ("null" if v is None else
                     "boolean" if isinstance(v, bool) else
                     "long" if isinstance(v, int) else
                     "double" if isinstance(v, float) else
                     "object" if isinstance(v, dict) else
                     "array" if isinstance(v, list) else "string")
                e = fields.setdefault(k, {"types": set(), "count": 0})
                e["types"].add(t)
                e["count"] += 1
        rows = []
        for k, e in sorted(fields.items()):
            non_null = sorted(e["types"] - {"null"})
            rows.append((pdf["stream_name"].iloc[0],
                         pdf["schema_tag"].iloc[0], k,
                         non_null[0] if non_null else "null",
                         e["count"],
                         "required" if e["count"] >= n else "optional",
                         n))
        import pandas as pd
        return pd.DataFrame(rows, columns=[
            "stream_name", "schema_tag", "field_path", "field_type",
            "n_present", "mode", "n_samples"])

    return (sampled.groupBy("stream_name", "schema_tag")
            .applyInPandas(flat_fields, schema=FIELDS_RESULT))


def get_schema(events: DataFrame, stream_name: str) -> dict:
    """E6 GET /schema/:stream-name (handler.clj:256-263): version → schema
    map for one stream."""
    rows = (infer_schemas(events.where(F.col("stream_name") == stream_name))
            .collect())
    return {r["schema_tag"]: json.loads(r["schema_json"]) for r in rows}


# --------------------------------------------------------------------------
# Typed per-stream views (SURVEY §1.4): the inferred schema applied back
# to the payload as a real Spark struct via from_json
# --------------------------------------------------------------------------

from pyspark.sql import types as T  # noqa: E402

_SCALAR_TYPES = {
    "long": T.LongType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    # a field whose samples were all-null parses most safely as string
    "null": T.StringType(),
}


def typed_struct(schema: dict) -> T.StructType:
    """Build a Spark StructType from one inferred schema map
    (:func:`infer_schemas`'s ``{field_path: {"type": ...}}``, dotted
    paths for nested objects, ``path[]`` entries for array elements).

    Nested objects become nested StructTypes; arrays become ArrayType of
    the inferred element type (StringType when elements were never
    sampled); mixed-type fields already reduced to one type upstream.
    """
    # group dotted paths into a tree; "[]"-suffixed paths describe the
    # element type of the array at the unsuffixed path. A trailing "[]"
    # on a segment expands into a separate "[]" child of the unsuffixed
    # segment ("c.xs[]" -> ["c","xs","[]"], "xs[][]" -> ["xs","[]","[]"])
    # so kids.get("[]") below actually finds the element node — without
    # the expansion every array degraded to array<string> plus a phantom
    # sibling field literally named "name[]".
    def _split_path(path: str) -> list[str]:
        parts: list[str] = []
        for seg in path.split("."):
            depth = 0
            while seg.endswith("[]") and len(seg) > 2:
                seg = seg[:-2]
                depth += 1
            parts.append(seg)
            parts.extend(["[]"] * depth)
        return parts

    tree: dict = {}
    for path, info in schema.items():
        parts = _split_path(path)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {"children": {}})["children"]
        leaf = node.setdefault(parts[-1], {"children": {}})
        leaf["info"] = info

    def build(node: dict):
        info = node.get("info")
        kids = node["children"]
        t = (info or {}).get("type")
        if t == "object" or (info is None and kids):
            fields = [T.StructField(k, build(v))
                      for k, v in sorted(kids.items()) if k != "[]"]
            return T.StructType(fields)
        if t == "array":
            elem = kids.get("[]")
            return T.ArrayType(build(elem) if elem else T.StringType())
        return _SCALAR_TYPES.get(t, T.StringType())

    # "$" (a top-level non-object doc) and "[]" (elements of a top-level
    # array doc) have no field name to hang a struct field on — skip both.
    return T.StructType([T.StructField(k, build(v))
                         for k, v in sorted(tree.items())
                         if k not in ("$", "[]")])


def typed_view(events: DataFrame, stream_name: str,
               schema_tag: str | None = None,
               payload_col: str = "payload") -> DataFrame:
    """The typed per-stream view SURVEY §1.4 maps payloads to: infer the
    stream's schema (sampled, exactly :func:`infer_schemas`), build the
    struct, and return the stream's events with the payload parsed into
    a real ``payload_typed`` struct column — giving users a columnar,
    predicate-pushable view of a free-form JSON stream (photon's
    chatter fixture, common.clj:15-35; schema pins schema_test.clj:41+).

    ``schema_tag`` picks one version's schema; default merges all
    versions (first-seen type wins per field — the same reduction
    ``_merge_value`` applies within a bucket). Unparseable payloads
    yield a NULL struct, visible rather than dropped.

    Scale shape: inference cost is bounded by the sample (first-10 +
    ~2% per bucket); the schema map itself is a driver-side constant
    (bounded by field count, not rows); the from_json projection is
    map-side Catalyst over the full stream — no shuffle is added to
    the read path.
    """
    stream = events.where(F.col("stream_name") == stream_name)
    versions = get_schema(events, stream_name)
    if schema_tag is not None:
        merged = versions.get(schema_tag, {})
    else:
        merged = {}
        for tag in sorted(versions):
            for path, info in versions[tag].items():
                merged.setdefault(path, info)
    struct = typed_struct(merged)
    return stream.withColumn(
        "payload_typed", F.from_json(F.col(payload_col), struct))
