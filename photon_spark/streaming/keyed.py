"""Distributed keyed stateful streaming fold (applyInPandasWithState).

The serial :class:`~photon_spark.streaming.stateful.StreamingProjectionRunner`
mirrors photon's per-projection total-order fold (streams.clj:241-274,
410-420). This module is the Spark-FIRST escalation for reducers that are
per-key independent (the per-stream built-ins like `__streams__` counts,
default_projs.clj:8-26): state lives in the executors' state store, keyed
by stream — updates run in parallel across keys, state survives restarts
through the checkpoint, and no event ever reaches the driver.

Scale: this is the shape that holds at 100 TB/day — per-key state is
O(keys) not O(events), each micro-batch touches only the keys it contains,
and the shuffle is the single groupBy(key) exchange.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("stream_name string, n_events long, sum_local long, "
                 "max_order_id long")
STATE_SCHEMA = "n long, s long, mx long"


def keyed_running_totals(events: DataFrame) -> DataFrame:
    """Per-stream running (count, sum(local_id as long), max order_id) over
    a STREAMING events DataFrame; emits the updated state row for every key
    touched by each micro-batch (photon's queryable projection value, in
    update mode).

    The int sums keep the fold associative and restart-exact: replaying a
    checkpoint resumes from the stored state, never recounts.
    """

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, s, mx = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += int(pd.to_numeric(pdf["local_id"], errors="coerce")
                     .fillna(0).sum())
            if len(pdf):
                mx = max(mx, int(pdf["order_id"].max()))
        state.update((n, s, mx))
        yield pd.DataFrame({"stream_name": [key[0]], "n_events": [n],
                            "sum_local": [s], "max_order_id": [mx]})

    return (events
            .groupBy("stream_name")
            .applyInPandasWithState(
                update,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


CSUM_OUTPUT = "stream_name string, processed long, checksum long"
CSUM_STATE = "n long, c long"


def keyed_ordered_checksums(events: DataFrame) -> DataFrame:
    """Per-key ORDERED fold with a rank-weighted checksum — the
    distributed-streaming analogue of the serial runner's order proof:
    within each key, events fold in order_id order (sorted inside the
    micro-batch group; the rank counter persists in state across batches),
    and ``checksum = Σ rankₖ·local_id`` changes under ANY per-key
    reordering, gap, or duplicate. Keys fold in parallel in the executors'
    state store; the only exchange is the groupBy(key) shuffle."""

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        n, c = state.get if state.exists else (0, 0)
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            allf = (pd.concat(frames) if len(frames) > 1 else frames[0]) \
                .sort_values("order_id")
            for lid in pd.to_numeric(allf["local_id"],
                                     errors="coerce").fillna(0).astype(int):
                n += 1
                c += n * int(lid)
        state.update((n, c))
        yield pd.DataFrame({"stream_name": [key[0]], "processed": [n],
                            "checksum": [c]})

    return (events
            .groupBy("stream_name")
            .applyInPandasWithState(
                update,
                outputStructType=CSUM_OUTPUT,
                stateStructType=CSUM_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
