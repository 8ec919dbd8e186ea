"""Scale-adaptive sizing for streaming shuffle/state partitions.

Stateful streaming operators (stream-stream joins, keyed folds,
``dropDuplicatesWithinWatermark``) allocate one state store per shuffle
partition per stateful operator, and EVERY micro-batch pays an
open/commit cycle on each of them; micro-batch plans also get no AQE,
so batch-side shuffles inside ``foreachBatch`` keep the raw
``spark.sql.shuffle.partitions`` instead of being coalesced at runtime.
A core-count constant is therefore wrong in both directions: at bench
scale (MBs of input) a 32-partition stream-stream join commits
32 partitions x 4 join state stores on every micro-batch of a few
thousand rows — the state-store file churn IS the runtime — while on a
100 TB cluster the same constant under-partitions the state and every
store becomes a multi-GB straggler.

Derive the count from the bytes the stream will actually ingest —
the same rule AQE applies to batch shuffles (advisory bytes per
partition), computed up front because a streaming query pins its state
partition count at the first checkpoint commit and cannot re-partition
afterwards. Callers size once from the source directory right before
``.start()``; the clamp keeps a floor of 1 (empty/tiny sources) and a
ceiling that bounds driver bookkeeping. ``STREAM_TARGET_BYTES`` is the
per-partition goal for *state+shuffle* rows, deliberately smaller than
the 128 MB scan split because state rows amplify input bytes (join
candidates, per-key state copies).

Structured Streaming clones the session state at ``.start()``
(the query plans every micro-batch against the cloned conf), so
:func:`stream_shuffle_partitions` can restore the session value
immediately after start without affecting the running query.
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager

#: per-partition input-byte goal for stateful streams (see module doc)
STREAM_TARGET_BYTES = 32 * 1024 * 1024
#: ceiling on derived partition counts (driver/checkpoint bookkeeping)
MAX_STREAM_PARTITIONS = 4096


def dir_bytes(*paths: str) -> int:
    """Total size of all regular files under each path (file or dir)."""
    total = 0
    for p in paths:
        if os.path.isfile(p):
            total += os.path.getsize(p)
            continue
        for dirpath, _dirs, names in os.walk(p):
            for n in names:
                try:
                    total += os.path.getsize(os.path.join(dirpath, n))
                except OSError:
                    pass
    return total


def state_partitions(input_bytes: int,
                     target_bytes: int = STREAM_TARGET_BYTES,
                     lo: int = 1, hi: int = MAX_STREAM_PARTITIONS) -> int:
    """Partition count for a stateful stream ingesting ``input_bytes``."""
    return max(lo, min(hi, math.ceil(max(input_bytes, 1) / target_bytes)))


@contextmanager
def stream_shuffle_partitions(spark, n: int):
    """Temporarily pin ``spark.sql.shuffle.partitions`` for a stream
    start. Restore happens on exit — safe immediately after
    ``.start()`` because the query planned against a cloned session."""
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(int(n)))
    try:
        yield
    finally:
        spark.conf.set(key, prev)
