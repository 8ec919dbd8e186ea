"""A5/A7/U4 + A9/A10 tests: event-sourced projection DDL, restart recovery,
security-state fold, initial-value parsing, counters and runtime stats.

Reference behaviors mirrored (citations into /root/reference):
- projections are registered/deleted via __config__ events and survive
  restart by replaying that stream (src/photon/api.clj:20-33,
  src/photon/core.clj:81-135; re-register replays in
  test/photon/current/projections.clj:159-189).
- default projections are delete-protected (core.clj:102-107,
  projections.clj:150-154).
- __security-state__ folds create-app!/delete-app! into
  {username: {client-id: app}} (src/photon/default_projs.clj:28-39).
"""

import json
import os

from photon_spark.catalog import Catalog, apply_security_event
from photon_spark.events import EventStore, SECURITY_STREAM
from photon_spark.projections.engine import ProjectionEngine
from photon_spark.stats import global_counters, runtime_stats


def _store(spark, tmp_path):
    return EventStore(spark, os.path.join(str(tmp_path), "events"))


def _post(store, stream, n):
    df = store.spark.createDataFrame(
        [(stream, "e", str(i)) for i in range(n)],
        "stream_name string, event_type string, local_id string")
    store.ingest(df)


def test_post_projection_via_config_event(spark, tmp_path):
    store = _store(spark, tmp_path)
    _post(store, "s", 7)
    cat = Catalog(store)
    cat.post_projection("cnt", "lambda st, ev: st + 1", initial_value=0)
    assert "cnt" in cat.projection_keys()
    cat.engine.advance("cnt")
    # counts the 7 events plus the __config__ event itself (stream __all__)
    assert cat.engine.value("cnt") == 8


def test_restart_recovery_replays_config(spark, tmp_path):
    """Fresh Catalog over the same store rebuilds the registry purely from
    the __config__ stream (photon restart semantics, core.clj:81-135),
    including the JSON initial value (U4, exec.clj:177-182)."""
    store = _store(spark, tmp_path)
    cat = Catalog(store)
    cat.post_projection("agg", "lambda st, ev: st", stream_name="s",
                        initial_value={"total": 41, "tag": "x"})
    cat.post_projection("gone", "lambda st, ev: st", initial_value=0)
    cat.delete_projection("gone")

    # "restart": new engine + catalog over the same persisted events
    store2 = EventStore(spark, store.path)
    cat2 = Catalog(store2, ProjectionEngine(store2))
    cat2.sync()
    assert "agg" in cat2.projection_keys()
    assert "gone" not in cat2.projection_keys()
    proj = cat2.engine.projection("agg")
    assert proj.stream_name == "s"
    assert proj.initial_value == {"total": 41, "tag": "x"}
    assert cat2.engine.value("agg") == {"total": 41, "tag": "x"}


def test_reregister_replaces(spark, tmp_path):
    store = _store(spark, tmp_path)
    cat = Catalog(store)
    cat.post_projection("p", "lambda st, ev: st + 1", initial_value=0)
    cat.post_projection("p", "lambda st, ev: st + 2", initial_value=100)
    proj = cat.engine.projection("p")
    assert proj.initial_value == 100
    assert proj.reducer.source == "lambda st, ev: st + 2"


def test_default_projections_delete_protected(spark, tmp_path):
    store = _store(spark, tmp_path)
    cat = Catalog(store)
    cat.delete_projection("__streams__")
    cat.delete_projection("__security-state__")
    assert "__streams__" in cat.projection_keys()
    assert "__security-state__" in cat.projection_keys()


def test_security_state_fold_golden(spark, tmp_path):
    """default_projs.clj:28-39 golden behavior via the real engine fold over
    the __security__ stream."""
    store = _store(spark, tmp_path)
    apps = [
        ("create-app!", {"username": "u1", "client-id": "c1", "secret": "s1"}),
        ("create-app!", {"username": "u1", "client-id": "c2", "secret": "s2"}),
        ("create-app!", {"username": "u2", "client-id": "c3", "secret": "s3"}),
        ("delete-app!", {"username": "u1", "client-id": "c1"}),
    ]
    df = store.spark.createDataFrame(
        [(SECURITY_STREAM, et, json.dumps(p)) for et, p in apps],
        "stream_name string, event_type string, payload string")
    store.ingest(df)
    cat = Catalog(store)
    cat.engine.advance("__security-state__")
    state = cat.engine.value("__security-state__")
    assert set(state) == {"u1", "u2"}
    assert set(state["u1"]) == {"c2"}
    assert state["u2"]["c3"]["secret"] == "s3"


def test_security_fold_unit():
    st = apply_security_event(
        {}, {"event_type": "create-app!",
             "payload": json.dumps({"username": "u", "client-id": "c"})})
    assert "c" in st["u"]
    st = apply_security_event(
        st, {"event_type": "delete-app!",
             "payload": json.dumps({"username": "u", "client-id": "c"})})
    assert st["u"] == {}


def test_global_counters_and_runtime_stats(spark, tmp_path):
    store = _store(spark, tmp_path)
    _post(store, "s", 9)
    engine = ProjectionEngine(store)
    engine.register(
        "c", "lambda st, ev: (st or 0) + 1", initial_value=0)
    engine.advance("c")
    counters = global_counters(store, engine)
    assert counters["incoming"] == 9
    assert counters["processed"] == 9
    rt = runtime_stats()
    assert rt["total-memory"] > 0
    assert rt["available-memory"] > 0
    assert rt["cpu-load"] >= 0
