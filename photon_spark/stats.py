"""A9/A10 — global ingest/processed counters and runtime stats.

Reference parity (citations into /root/reference):

- A9: photon keeps a global ``{:incoming n :processed n}`` atom bumped on
  every ingest and fold step, exposed over the WS stats endpoint
  (src/photon/streams.clj:290-303, src/photon/handler.clj:67-82,117-128).
  Here ``incoming`` is the EventStore's in-memory ingest counter (since
  construction, like photon's since-boot atom) and ``processed`` sums the
  engine's per-projection fold counters.
- A10: JVM memory/CPU snapshot ``{total-memory, available-memory,
  cpu-load}`` (src/photon/api.clj:188-201) — re-expressed with the host
  equivalents; on a cluster the per-executor figures live in Spark's
  metrics system / status API, this is the driver-process view photon
  exposes.
"""

from __future__ import annotations

import os


def global_counters(store=None, engine=None) -> dict:
    """A9: ``{"incoming": events ingested, "processed": fold steps}``."""
    incoming = getattr(store, "ingested", 0) if store is not None else 0
    processed = 0
    if engine is not None:
        processed = sum(p.processed for p in engine.registry.values())
    return {"incoming": incoming, "processed": processed}


def runtime_stats() -> dict:
    """A10: ``{"total-memory", "available-memory", "cpu-load"}`` in bytes /
    load-average units (api.clj:188-201)."""
    try:
        page = os.sysconf("SC_PAGE_SIZE")
        total = os.sysconf("SC_PHYS_PAGES") * page
        avail = os.sysconf("SC_AVPHYS_PAGES") * page
    except (ValueError, OSError, AttributeError):
        total = avail = -1
    try:
        load = os.getloadavg()[0]
    except OSError:
        load = -1.0
    return {"total-memory": total, "available-memory": avail,
            "cpu-load": load}
