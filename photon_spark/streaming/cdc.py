"""Continuous CDC merge maintenance — the streaming twin of
``queries_pipeline.q_upsert_merge``.

A ``CdcMergeTable`` keeps the compacted latest-record-per-key state of a
changelog under continuous micro-batch arrival, with MERGE semantics
(latest record wins; a winning tombstone deletes the key). It is the
state photon's keyed projections hold live (streams.clj:125-145) made
durable and restartable.

Scale design (the PairTable philosophy, pair_cache.py):

- **Write cost is O(batch), never O(table).** Each micro-batch first
  compacts ITSELF to one record per touched key (map-side struct max),
  then lands as a ``batch=<id>`` partition dir — existing state is never
  rewritten on the hot path.
- **Reads compact lazily.** ``state()`` is one keyed aggregate over the
  partition union: argmax by the total (ts, event_id) order, then drop
  keys whose winning record is a tombstone. Because argmax is
  associative, N incremental batches and one big batch produce the SAME
  state (pinned in tests) — ordering across batches does not matter, so
  late/replayed data is safe.
- **At-least-once replay is idempotent.** The ``batch=<id>`` partition
  is written with OVERWRITE (the pair_cache._write_batch replay
  contract): a crashed-and-retried foreachBatch clobbers its own
  partial output instead of double-appending.
- **``compact()`` bounds read amplification**: folds all partitions into
  a single base partition, exactly a Delta/Hudi minor compaction.
  Winning tombstones are RETAINED in the base — they must keep beating
  stale replays of older batches; dropping them (a major compaction) is
  only safe once replay of pre-fold batches is impossible, which this
  table cannot know on its own.

At 100 TB, write the table bucketed by the key columns so ``state()``'s
aggregate and any downstream as-of probe are co-located; the relation
holds only keys + order columns + compact payloads, never wide rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CdcMergeTable:
    """Durable, incrementally-maintained MERGE state.

    ``key_cols`` identify an entity; ``ord_cols`` must be a total
    deterministic order (e.g. ``["ts", "event_id"]`` with a unique id
    tie-break); ``tombstone_col`` is a boolean column in the changelog —
    a record with it true deletes the key when it wins the argmax.
    All other columns are carried as payload.
    """

    def __init__(self, spark, path: str, key_cols: list[str],
                 ord_cols: list[str], tombstone_col: str = "is_tombstone"):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.ord_cols = list(ord_cols)
        self.tombstone_col = tombstone_col

    # ------------------------------------------------------------ write
    def _compact_batch(self, batch_df: DataFrame) -> DataFrame:
        """One record per key: null-skipping max over (ord..., payload)
        structs — partial-then-final, no window, no join."""
        payload = [c for c in batch_df.columns
                   if c not in self.key_cols]
        rec = F.struct(*self.ord_cols,
                       *[c for c in payload if c not in self.ord_cols])
        return (batch_df.groupBy(*self.key_cols)
                        .agg(F.max(rec).alias("rec"))
                        .select(*self.key_cols, "rec.*"))

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Compact one changelog micro-batch and land it as its own
        ``batch=<id>`` OVERWRITE partition. Safe under at-least-once
        replay; cost is O(batch). Batch ids must be integers — the
        ``batch`` partition column is read back as long by ``state_at``
        and ``compact``; a non-numeric tag would silently null out under
        the cast, so it is rejected here instead.

        A write into the partition ``compact()`` adopted as its fold tag
        APPENDS instead of overwriting: mode=overwrite would destroy the
        fold summarizing all earlier history. Appending is exact either
        way the collision arises — a Structured Streaming replay carries
        the same offsets (duplicate records collapse under the argmax),
        and a fresh-checkpoint restart whose ids restarted at the tag
        carries new records that the argmax merges correctly. Raises if
        a ``compact()`` is in progress (or crashed mid-run — re-run it
        to converge, which clears the sentinel)."""
        try:
            # int(str(..)) rejects floats ("2.7") and bools ("True")
            # instead of silently truncating/aliasing onto an existing
            # partition, which mode=overwrite would then destroy
            batch_id = int(str(batch_id))
        except (TypeError, ValueError):
            raise ValueError(
                f"apply_batch: batch_id must be an integer, got "
                f"{batch_id!r} — state_at/compact order batches "
                "numerically") from None
        if os.path.exists(os.path.join(self.path, self._SENTINEL)):
            raise RuntimeError(
                "apply_batch: a compact() is in progress or crashed "
                "mid-run on this table; re-run compact() to converge, "
                "then retry the write")
        dest = os.path.join(self.path, f"batch={batch_id}")
        mode = ("append" if os.path.isdir(dest)
                and any(f.startswith("fold-") for f in os.listdir(dest))
                else "overwrite")
        self._compact_batch(batch_df).write.mode(mode).parquet(dest)

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch`` over a changelog
        stream whose rows match the constructor's column contract."""
        def _apply(df: DataFrame, batch_id: int) -> None:
            self.apply_batch(df, batch_id)
        return _apply

    # ------------------------------------------------------------- read
    def state(self, include_tombstones: bool = False) -> DataFrame:
        """The compacted current state: per key, the record winning the
        total (ord_cols) order across every batch partition; keys whose
        winner is a tombstone are deleted (or flagged, when
        ``include_tombstones``). One keyed aggregate — associative, so
        batch boundaries are invisible."""
        raw = self.spark.read.parquet(self.path).drop("batch")
        out = self._compact_batch(raw)
        if include_tombstones:
            return out
        return out.where(~F.col(self.tombstone_col)) \
                  .drop(self.tombstone_col)

    def state_at(self, batch_id: int,
                 include_tombstones: bool = False) -> DataFrame:
        """Time travel: the compacted state as of ``batch_id`` — the same
        associative argmax restricted to partitions with batch ≤ id, so
        the cost of an as-of read is proportional to the history read,
        not to a replay. Partition pruning on the ``batch`` column keeps
        unread batches untouched on disk. ``compact()`` folds history
        into its highest folded batch id, so as-of reads at or above the
        fold point stay exact; asking for a boundary the compaction
        erased raises instead of answering wrong."""
        # batch ids come from the directory layout (free), not a Spark
        # scan — an as-of read's cost must be the history read, not a
        # partition-discovery + distinct job over the whole table first
        ids = [int(d.split("=", 1)[1]) for d in os.listdir(self.path)
               if d.startswith("batch=")]
        # Two erased-boundary guards. The marker is authoritative: it is
        # written the moment the fold becomes fully visible, BEFORE any
        # superseded partition is deleted, so a compaction crash that
        # removed only SOME lower batches (leaving min(ids) misleadingly
        # low) still refuses instead of answering from partial history.
        floor = max(self._compacted_to(), min(ids))
        if int(batch_id) < floor:
            raise ValueError(
                f"state_at({batch_id}): batches below {floor} were "
                "folded by compact(); that boundary no longer exists")
        raw = (self.spark.read.parquet(self.path)
               .where(F.col("batch").cast("long") <= int(batch_id))
               .drop("batch"))
        out = self._compact_batch(raw)
        if include_tombstones:
            return out
        return out.where(~F.col(self.tombstone_col)) \
                  .drop(self.tombstone_col)

    # -------------------------------------------------------- maintain
    _MARKER = "_compacted_to"
    _SENTINEL = "_compact_in_progress"

    def _compacted_to(self) -> int:
        """Lowest batch id still individually addressable: boundaries
        strictly below this were folded by ``compact()``. Monotone;
        -inf-equivalent before the first compaction. The underscore
        prefix keeps the marker invisible to Spark's partition
        discovery."""
        try:
            with open(os.path.join(self.path, self._MARKER)) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -(1 << 62)

    def _write_marker(self, tag: int) -> None:
        tmp = os.path.join(self.path, self._MARKER + ".tmp")
        with open(tmp, "w") as f:
            f.write(str(max(tag, self._compacted_to())))
        os.replace(tmp, os.path.join(self.path, self._MARKER))

    def compact(self) -> None:
        """Minor compaction: fold every batch partition into a single
        base tagged with the HIGHEST folded batch id (keeping winning
        tombstones — see the module docstring), then drop the superseded
        partitions. State is unchanged (pinned in tests); read
        amplification resets to one partition; ``state_at`` stays exact
        at and above the fold point and refuses erased boundaries below
        it.

        Crash-safe at every step, not just before the swap: readers see
        only non-underscore dirs, and the fold's records win or tie
        every record they summarize, so a visible set is correct iff it
        contains either the whole fold or all original batches. The
        protocol preserves that invariant throughout: (1) write the fold
        — computed from batches ≤ tag ONLY, so a micro-batch landing
        concurrently is neither summarized nor harmed — to an invisible
        ``_compact_tmp`` dir (originals intact); (2) move the fold's
        data files INTO ``batch=<tag>`` beside the originals (union ⊇
        originals at each file move, ⊇ fold once done); (3) durably
        record the fold point in the ``_compacted_to`` marker — from
        here ``state_at`` below tag refuses, so the deletions in (4)
        can never turn an answerable as-of read into a wrong one; (4)
        delete the superseded files/dirs (⊇ fold), sparing ids > tag
        (concurrent foreachBatch output). A crash anywhere leaves a
        correct table, and re-running ``compact()`` finishes the job —
        duplicated records between fold and originals collapse under
        the argmax.

        Concurrency contract: producers that START during the run are
        excluded by the ``_compact_in_progress`` sentinel; a producer
        write job already IN FLIGHT when compact() begins is not (its
        write mode was chosen at submit time). Run compact() from the
        same thread as the foreachBatch sink — the natural deployment —
        so the two never overlap."""
        import shutil
        # Only COMMITTED batches (_SUCCESS present) are summarized,
        # adopted as the fold home, or deleted: an in-flight apply_batch
        # whose dir exists but whose job has not committed is neither
        # read nor touched. Fallback: a table whose committer writes no
        # _SUCCESS markers at all (marksuccessfuljobs=false, foreign
        # writers) treats every dir as committed — the in-flight
        # protection only applies when markers exist to distinguish.
        all_ids = [int(d.split("=", 1)[1]) for d in os.listdir(self.path)
                   if d.startswith("batch=")]
        committed = [i for i in all_ids
                     if os.path.exists(os.path.join(
                         self.path, f"batch={i}", "_SUCCESS"))]
        if not committed:
            committed = all_ids
        if not committed:
            raise ValueError("compact: no batch partitions to fold")
        tag = max(committed)
        folded = committed
        tmp = os.path.join(self.path, f"_compact_tmp_{tag}")
        raw = (self.spark.read.parquet(self.path)
               .where(F.col("batch").cast("long").isin(folded))
               .drop("batch"))
        self._compact_batch(raw).write.mode("overwrite").parquet(tmp)
        dest = os.path.join(self.path, f"batch={tag}")
        old_files = [f for f in os.listdir(dest)
                     if not f.startswith(("_", "."))]
        # sentinel excludes producers that START a write during the
        # move-and-delete span. A producer job submitted BEFORE this
        # point and still running is not excluded (its mode was chosen
        # at submit time) — run compact() from the same thread as the
        # foreachBatch sink (the natural deployment) so no producer
        # write is ever in flight when it runs
        with open(os.path.join(self.path, self._SENTINEL), "w") as f:
            f.write(str(tag))
        for f in os.listdir(tmp):
            if f.startswith(("_", ".")):
                continue
            # fresh job UUID in the part name + single "fold-" prefix ⇒
            # no collision with old_files, even ones from a crashed run
            os.rename(os.path.join(tmp, f),
                      os.path.join(dest, f"fold-{f}"))
        self._write_marker(tag)
        for f in old_files:
            os.remove(os.path.join(dest, f))
        for i in folded:
            if i < tag:
                shutil.rmtree(os.path.join(self.path, f"batch={i}"),
                              ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        os.remove(os.path.join(self.path, self._SENTINEL))
