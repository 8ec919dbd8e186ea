"""Projection engine tests — mirror projections.clj facts: count-fold
convergence, per-stream scoping, resume, replace, delete-protection, failure
capture; plus the native/associative scale tiers."""

import json

import pytest

from photon_spark.events import EventStore
from photon_spark.projections import (
    AssociativeReducer, NativeReducer, ProjectionEngine, PyReducer)

from tests.test_events import make_events


@pytest.fixture()
def engine(spark, tmp_path):
    store = EventStore(spark, str(tmp_path / "events"))
    return ProjectionEngine(store)


def test_count_fold_convergence(engine, spark):
    # projections.clj:96-110 — (fn [a b] (inc a)) over 1003 events, init 1,
    # converges to 1004.  (Reference folds init 0 + registration event → we
    # replicate the arithmetic: init 1, 1003 events ⇒ 1004.)
    engine.store.ingest(make_events(spark, 1003, stream="largestream"))
    engine.register("inc-proj", "lambda prev, ev: prev + 1",
                    stream_name="largestream", initial_value=1)
    proj = engine.advance("inc-proj")
    assert proj.current_value == 1004
    assert proj.processed == 1003
    assert proj.status == "running"
    assert proj.avg_time >= 0.0
    assert proj.mem_used > 0  # measured at the 1000-event tick


def test_resume_from_last_event(engine, spark):
    # streams.clj:255-259 — re-advance folds only new events.
    engine.store.ingest(make_events(spark, 10, stream="s"))
    engine.register("c", "lambda prev, ev: prev + 1", stream_name="s",
                    initial_value=0)
    assert engine.advance("c").current_value == 10
    engine.store.ingest(make_events(spark, 5, stream="s"))
    proj = engine.advance("c")
    assert proj.current_value == 15
    assert proj.processed == 15


def test_stream_scoping(engine, spark):
    # projections.clj:111-112
    engine.store.ingest(make_events(spark, 7, stream="mine"))
    engine.store.ingest(make_events(spark, 9, stream="other"))
    engine.register("mine-count", "lambda p, e: p + 1",
                    stream_name="mine", initial_value=0)
    assert engine.advance("mine-count").current_value == 7


def test_ordered_fold_is_ordered(engine, spark):
    # Non-commutative fold: collect order_ids; must equal the sorted list.
    engine.store.ingest(make_events(spark, 50, stream="s"))
    engine.register("order", "lambda p, e: p + [e['order_id']]",
                    stream_name="s", initial_value=[])
    seen = engine.advance("order").current_value
    assert seen == sorted(seen) and len(seen) == 50


def test_virtual_stream_emission(engine, spark):
    # streams.clj:182-200 — successive states are emitted as a stream.
    engine.store.ingest(make_events(spark, 5, stream="s"))
    engine.register("v", "lambda p, e: p + 1", stream_name="s", initial_value=0)
    proj = engine.advance("v", emit_states=True)
    assert proj.emitted == [1, 2, 3, 4, 5]


def test_failure_capture(engine, spark):
    # streams.clj:84-97 — error ⇒ failed + last_error, state queryable.
    engine.store.ingest(make_events(spark, 5, stream="s"))
    engine.register("boom", "lambda p, e: p + 1/0", stream_name="s",
                    initial_value=0)
    proj = engine.advance("boom")
    assert proj.status == "failed"
    assert "division" in proj.last_error
    assert engine.advance("boom").status == "failed"  # fold stays stopped


def test_replace_and_delete_protection(engine, spark):
    engine.store.ingest(make_events(spark, 3, stream="s"))
    engine.register("p", "lambda p, e: p + 1", stream_name="s", initial_value=0)
    engine.register("p", "lambda p, e: p + 2", stream_name="s", initial_value=0)
    assert engine.advance("p").current_value == 6  # replaced fn, fresh state
    assert engine.unregister("p") is True
    assert engine.unregister("__streams__") is False  # core.clj:102-107


def test_value_keyed_lookup(engine, spark):
    # api.clj:61-64 — F5 keyed lookup into a map-valued projection.
    engine.store.ingest(make_events(spark, 4, stream="s"))
    engine.register(
        "per-type",
        "lambda p, e: {**p, e['event_type']: p.get(e['event_type'], 0) + 1}",
        stream_name="s", initial_value={})
    engine.advance("per-type")
    assert engine.value("per-type", "chatter-event") == 4
    assert engine.value("per-type", "missing") is None


def test_native_reducer_matches_serial(engine, spark):
    engine.store.ingest(make_events(spark, 100, stream="s"))
    engine.register("n-count", NativeReducer("count"), stream_name="s")
    assert engine.advance("n-count").current_value == 100
    # incremental advance across batches
    engine.store.ingest(make_events(spark, 50, stream="s"))
    proj = engine.advance("n-count")
    assert proj.current_value == 150 and proj.processed == 150


def test_associative_reducer_distributed(engine, spark):
    engine.store.ingest(make_events(spark, 200, stream="s"))
    red = AssociativeReducer(
        fold=lambda st, ev: st + ev["order_id"] % 7,
        merge=lambda a, b: a + b, zero=0)
    engine.register("assoc", red, stream_name="s", initial_value=0)
    got = engine.advance("assoc").current_value
    oids = [r["order_id"] for r in engine.store.read_cold("s").collect()]
    assert got == sum(o % 7 for o in oids)


def test_pyreducer_source_persisted(engine, spark):
    src = "lambda prev, ev: prev + 1"
    engine.register("p", src, stream_name="s")
    red = engine.projection("p").reducer
    assert isinstance(red, PyReducer) and red.source == src
