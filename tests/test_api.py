"""E1-E6 facade tests over PhotonAPI — the call-surface a photon client
would switch to (api.clj / handler.clj parity, SURVEY.md §2.7)."""

import json
import os

from photon_spark.api import PhotonAPI


def _api(spark, tmp_path):
    return PhotonAPI(spark, os.path.join(str(tmp_path), "events"))


def test_post_and_get_event_roundtrip(spark, tmp_path):
    api = _api(spark, tmp_path)
    api.post_event("chatter", payload=json.dumps({"text": "hi"}),
                   event_type="chat", local_id="e-1")
    rows = api.stream_contents("chatter").collect()
    assert len(rows) == 1
    ev = rows[0]
    assert json.loads(ev["payload"]) == {"text": "hi"}
    assert ev["order_id"] > 0 and ev["event_time"] is not None
    # R4 point lookup finds the same event
    got = api.get_event("chatter", ev["order_id"])
    assert got["local_id"] == "e-1"


def test_streams_endpoint_counts(spark, tmp_path):
    api = _api(spark, tmp_path)
    for i in range(3):
        api.post_event("a", payload="{}")
    api.post_event("b", payload="{}")
    # with the __streams__ projection advanced, E1 reads its state
    api.engine.advance("__streams__")
    listing = {d["stream"]: d["total-events"] for d in api.streams()}
    assert listing == {"a": 3, "b": 1}


def test_projection_lifecycle_over_api(spark, tmp_path):
    """projections.clj:96-110 analogue: register a count-fold, converge,
    query the value, delete it."""
    api = _api(spark, tmp_path)
    for i in range(5):
        api.post_event("s", payload=json.dumps({"i": i}))
    api.post_projection("cnt", "lambda st, ev: st + 1", stream_name="s",
                        initial_value=0)
    assert api.projection_value("cnt") == 5
    api.post_event("s", payload="{}")
    assert api.projection_value("cnt") == 6  # advances to high-water mark
    descs = {d["projection-name"] for d in api.projections()}
    assert "cnt" in descs
    api.delete_projection("cnt")
    assert "cnt" not in api.projection_keys()


def test_projection_value_keyed_lookup(spark, tmp_path):
    api = _api(spark, tmp_path)
    for u in ["u1", "u1", "u2"]:
        api.post_event("s", payload="{}", service_id=u)
    api.post_projection(
        "per_user",
        "lambda st, ev: {**st, ev['service_id']: st.get(ev['service_id'], 0) + 1}",
        stream_name="s", initial_value={})
    assert api.projection_value("per_user", "u1") == 2
    assert api.projection_value("per_user", "u2") == 1


def test_api_restart_recovers_projections(spark, tmp_path):
    api = _api(spark, tmp_path)
    api.post_event("s", payload="{}")
    api.post_projection("cnt", "lambda st, ev: st + 1", stream_name="s",
                        initial_value=0)
    # fresh handle over the same path = restart
    api2 = _api(spark, tmp_path)
    assert "cnt" in api2.projection_keys()
    assert api2.projection_value("cnt") == 1


def test_schema_endpoint(spark, tmp_path):
    api = _api(spark, tmp_path)
    api.post_event("s", payload=json.dumps({"k": 1, "t": "x"}))
    sch = api.schema("s")["__unversioned__"]
    assert sch["k"]["type"] == "long" and sch["t"]["type"] == "string"


def test_delete_and_stats(spark, tmp_path):
    api = _api(spark, tmp_path)
    for i in range(4):
        api.post_event("a", payload="{}")
    api.post_event("b", payload="{}")
    api.delete_stream("b")
    assert {d["stream"] for d in api.streams()} == {"a"}
    st = api.stats()
    assert st["incoming"] == 5 and st["total-memory"] > 0

def test_post_event_round_trips_provenance_and_rejects_typos(spark, tmp_path):
    import os
    import pytest
    from photon_spark.api import PhotonAPI

    api = PhotonAPI(spark, os.path.join(str(tmp_path), "store"))
    api.post_event("s", payload='{"k": 1}',
                   provenance={"service_id": "svc", "local_id": "42",
                               "relationship_type": "caused-by"})
    ev = api.store.read_all().first()
    assert ev["provenance"]["service_id"] == "svc"
    assert ev["provenance"]["local_id"] == "42"
    assert ev["provenance"]["relationship_type"] == "caused-by"
    with pytest.raises(ValueError, match="event_typ"):
        api.post_event("s", event_typ="oops")


def test_streams_endpoint_never_serves_stale_totals(spark, tmp_path):
    import os
    from photon_spark.api import PhotonAPI

    api = PhotonAPI(spark, os.path.join(str(tmp_path), "store"))
    for i in range(5):
        api.post_event("s", local_id=str(i))
    api.projection_value("__streams__")  # advances the projection
    for i in range(5, 10):
        api.post_event("s", local_id=str(i))
    # E1 must reflect the post-advance ingests, not the stale state
    assert api.streams() == [{"stream": "s", "total-events": 10}]
