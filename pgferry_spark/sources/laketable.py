"""Versioned parquet lake table: snapshot log, time travel, vacuum.

``lake_upsert`` (operators/incremental.py) swaps one directory in place —
atomic, but history is gone and a long-running reader can lose files
mid-scan when vacuumed.  ``LakeTable`` is the next step up, the minimal
shape of what lakehouse table formats (Iceberg/Delta) provide:

* every write lands in a NEW immutable ``v<N>/`` directory (copy-on-write
  snapshots — never mutate what a reader might be scanning);
* a one-line ``_CURRENT`` pointer file names the live version, updated by
  atomic rename, so version switch is a metadata operation;
* readers resolve the pointer once, then read a directory nothing will
  ever modify — time travel is just naming an older version;
* ``vacuum`` deletes only snapshots strictly older than the retention
  window, never the current one.

On an object store the pointer becomes the catalog's commit (the rename
trick needs a CAS there); the snapshot layout and reader protocol are
identical.  This is deliberately NOT a full table format: no manifest
files (scan planning trusts directory listing), no merge-on-read delete
vectors, single-writer only (no optimistic-concurrency commit loop) —
each a documented format feature, not an accident.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SnapshotInfo:
    version: int
    rows: int
    op: str
    committed_at: float


class LakeTable:
    """Single-writer versioned parquet table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        os.makedirs(self.path, exist_ok=True)

    # -- commit protocol ----------------------------------------------------

    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _vdir(self, version: int) -> str:
        return os.path.join(self.path, f"v{version:06d}")

    def _clear_uncommitted(self) -> None:
        """Remove version dirs (and ``._append_tmp`` dirs) ABOVE the
        committed pointer that lack ``_meta.json``: a crash between
        writing a version's files and :meth:`_finalize` leaves them
        behind, and every subsequent commit then dies on
        errorifexists/makedirs forever (round-9 ADVICE — a wedged
        ``warc_ingest_stream`` replay).  Uncommitted leftovers are safe
        to delete under the single-writer contract: the pointer never
        referenced them."""
        cur = self.current_version() or 0
        for d in os.listdir(self.path):
            m = re.match(r"^v(\d{6})(\._append_tmp)?$", d)
            if not m or int(m.group(1)) <= cur:
                continue
            full = os.path.join(self.path, d)
            if not os.path.isdir(full):
                continue
            if m.group(2) is None and os.path.isfile(
                os.path.join(full, "_meta.json")
            ):
                continue  # committed ahead of the pointer: never ours
            shutil.rmtree(full)

    def _commit(self, df: DataFrame, op: str) -> SnapshotInfo:
        self._clear_uncommitted()
        cur = self.current_version()
        nxt = 1 if cur is None else cur + 1
        df.write.mode("errorifexists").parquet(self._vdir(nxt))
        return self._finalize(nxt, op)

    def _finalize(self, nxt: int, op: str) -> SnapshotInfo:
        """Seal an already-written version dir: record meta, flip the
        pointer. Split out of :meth:`_commit` so multi-job writers
        (:meth:`compact`) can produce the files themselves and still
        share the exact commit protocol."""
        vdir = self._vdir(nxt)
        rows = self.spark.read.parquet(vdir).count()
        meta = {"version": nxt, "rows": rows, "op": op, "committed_at": time.time()}
        with open(os.path.join(vdir, "_meta.json"), "w") as f:
            json.dump(meta, f)
        # atomic pointer flip: write-aside + rename, so a concurrent reader
        # sees the old version or the new one, never a torn pointer
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, self._pointer())
        return SnapshotInfo(nxt, rows, op, meta["committed_at"])

    # -- public API ---------------------------------------------------------

    def write_snapshot(self, df: DataFrame, op: str = "overwrite") -> SnapshotInfo:
        """Commit ``df`` as the next full snapshot."""
        return self._commit(df, op)

    def append(self, df: DataFrame, op: str = "append") -> SnapshotInfo:
        """Commit previous-snapshot-plus-``df`` WITHOUT rewriting
        history: the new version directory HARDLINKS the current
        version's data files and adds ``df`` as fresh files — O(new
        rows) data written, O(files) metadata, where the read-union-
        rewrite form pays O(table) per batch (the append-only ingest
        cost a long-running drizzle cannot afford).  Every version dir
        stays a complete self-contained snapshot, so time travel,
        ``diff`` and the commit protocol are unchanged; ``vacuum``
        merely unlinks names and the shared blocks live until the last
        version referencing them goes.  Caller contract: ``df``'s
        schema must equal the table's (this is a pure row append, not a
        merge); a fragmenting drizzle should run ``maybe_compact``
        between triggers as usual."""
        self._clear_uncommitted()
        cur = self.current_version()
        if cur is None:
            return self._commit(df, op)
        nxt = cur + 1
        vdir = self._vdir(nxt)
        tmp = vdir + "._append_tmp"
        df.write.mode("errorifexists").parquet(tmp)
        os.makedirs(vdir)
        pv = self._vdir(cur)
        for name in os.listdir(pv):
            if name.endswith(".parquet"):
                os.link(
                    os.path.join(pv, name),
                    os.path.join(vdir, f"prev-{name}"),
                )
        for name in os.listdir(tmp):
            if name.endswith(".parquet"):
                os.rename(
                    os.path.join(tmp, name), os.path.join(vdir, name)
                )
        shutil.rmtree(tmp)
        return self._finalize(nxt, op)

    def read(self, version: int | None = None) -> DataFrame:
        """Read the current snapshot, or time-travel to ``version``."""
        v = self.current_version() if version is None else int(version)
        if v is None:
            raise FileNotFoundError(f"lake table {self.path} has no snapshots")
        vdir = self._vdir(v)
        if not os.path.isdir(vdir):
            raise FileNotFoundError(
                f"version {v} of {self.path} does not exist (vacuumed?)"
            )
        return self.spark.read.parquet(vdir)

    def upsert(
        self,
        changes: DataFrame,
        key_col: str,
        seq_col: str,
        op_col: str = "op",
    ) -> SnapshotInfo:
        """MERGE a change batch against the current snapshot into a new
        version (copy-on-write; the apply_changes algebra is the same one
        the in-place ``lake_upsert`` uses)."""
        from pgferry_spark.operators.incremental import apply_changes

        merged = apply_changes(self.read(), changes, key_col, seq_col, op_col)
        return self._commit(merged, "upsert")

    def history(self) -> list[SnapshotInfo]:
        """All retained snapshots, oldest first (the commit log)."""
        out = []
        for d in sorted(os.listdir(self.path)):
            mp = os.path.join(self.path, d, "_meta.json")
            if d.startswith("v") and os.path.isfile(mp):
                with open(mp) as f:
                    m = json.load(f)
                out.append(
                    SnapshotInfo(m["version"], m["rows"], m["op"], m["committed_at"])
                )
        return out

    def diff(
        self,
        key_cols: list[str],
        value_cols: list[str],
        from_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """Content diff between two snapshots (``to_version`` defaults to
        current): per-status counts via the validation layer's hash diff —
        'what changed between version N and now' as one query, the audit
        trail the snapshot log exists to answer."""
        from pgferry_spark.plans.validation import content_diff

        return content_diff(
            self.read(version=from_version),
            self.read(version=to_version),
            key_cols,
            value_cols,
        )

    def compact(self, target_bytes: int) -> SnapshotInfo:
        """OPTIMIZE: rewrite the current snapshot's files into bins of
        roughly ``target_bytes`` and commit the result as a new
        row-identical version (``op='compact'``) — the executor for
        :func:`~pgferry_spark.operators.curate.compaction_plan`.

        The manifest is the snapshot's file listing (one row per part
        file — METADATA, never data); the planner assigns ordered
        next-fit bins preserving file order, so a clustered write's key
        ranges stay contiguous per output file; each bin then rewrites
        as one job reading exactly its input files. Copy-on-write: the
        pre-compaction version remains time-travelable until
        :meth:`vacuum`, and the pointer flips only after every bin has
        written — a crash mid-compact leaves the table on the old
        version with only an orphaned (never-pointed-at) vdir to clean.

        The per-bin loop is driver-side over bin COUNT (bounded by
        table_bytes / target_bytes); on a real cluster the bins are
        independent jobs a scheduler can submit concurrently. Each bin
        coalesces to a single output file by construction.

        Sibling: :func:`~pgferry_spark.sources.layout.compact_parquet`
        compacts a bare parquet DIRECTORY in place via one
        repartition (no versioning, order not preserved); this method
        is the versioned, order-preserving variant for tables whose
        layout (:meth:`optimize`) must survive compaction."""
        import glob

        from ..operators.curate import compaction_plan

        import shutil

        cur = self.current_version()
        if cur is None:
            raise FileNotFoundError(f"lake table {self.path} has no snapshots")
        vdir = self._vdir(cur)
        files = self._ordered_files(vdir)
        manifest = self.spark.createDataFrame(
            [(i, f, os.path.getsize(f)) for i, f in enumerate(files)],
            "file_id int, path string, bytes long",
        )
        plan = compaction_plan(manifest, "bytes", "file_id", int(target_bytes))
        bins: dict[int, list[str]] = {}
        for r in plan.collect():  # file-level metadata, bounded
            bins.setdefault(r.bin, []).append(r.path)
        nvdir = self._vdir(cur + 1)
        # a crashed earlier compact may have left a partially-written,
        # never-pointed-at nvdir; appending into it would silently
        # duplicate rows — clear it so the retry starts clean
        if os.path.isdir(nvdir):
            shutil.rmtree(nvdir)
        order: list[str] = []
        for b in sorted(bins):
            before = set(os.listdir(nvdir)) if os.path.isdir(nvdir) else set()
            (
                self.spark.read.parquet(*bins[b])
                .coalesce(1)
                .write.mode("append")
                .parquet(nvdir)
            )
            order.extend(
                sorted(
                    f
                    for f in set(os.listdir(nvdir)) - before
                    if f.startswith("part-")
                )
            )
        # append-job part names carry random UUIDs, so lexicographic
        # order does NOT reflect bin (key-range) order — record the true
        # order so a LATER compact's manifest preserves the clustering
        with open(os.path.join(nvdir, "_file_order.json"), "w") as f:
            json.dump(order, f)
        return self._finalize(cur + 1, "compact")

    def _ordered_files(self, vdir: str) -> list[str]:
        """Part files of a version dir in KEY order: the recorded
        ``_file_order.json`` when present (compact outputs, whose
        part-file UUID names do not sort by key range), else
        lexicographic (single-job writers emit part-00000..N in
        partition order, which IS key order for range/sort writes)."""
        import glob

        order_file = os.path.join(vdir, "_file_order.json")
        if os.path.exists(order_file):
            with open(order_file) as f:
                return [os.path.join(vdir, name) for name in json.load(f)]
        return sorted(glob.glob(os.path.join(vdir, "part-*")))

    def optimize(
        self,
        col_a: str,
        col_b: str,
        bits: int = 16,
        n_files: int = 16,
    ) -> SnapshotInfo:
        """OPTIMIZE ZORDER: commit a new row-identical version
        range-clustered on the Morton key of ``(col_a, col_b)`` —
        :func:`~pgferry_spark.sources.layout.zorder_key` under the lake
        table's copy-on-write commit protocol (``op='zorder'``).

        ``repartitionByRange`` on the interleaved key gives the
        ``n_files`` output files DISJOINT key ranges and the
        within-file sort tightens row-group min/max stats, so 2-D box
        predicates prune files at planning time and row groups at read
        time. One shuffle (the range partitioner samples the key).
        ``n_files`` also fixes the file count, so this IS a compaction;
        later incremental appends re-fragment, after which
        :meth:`compact` re-bins WITHOUT destroying this clustering
        (its bin packing is order-preserving by design)."""
        from .layout import zorder_key

        keyed = self.read().withColumn(
            "__zkey", zorder_key(F.col(col_a), F.col(col_b), bits)
        )
        clustered = (
            keyed.repartitionByRange(int(n_files), "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
        return self._commit(clustered, "zorder")

    def maybe_compact(
        self, max_files: int, target_bytes: int
    ) -> SnapshotInfo | None:
        """Threshold-triggered :meth:`compact` — the maintenance hook a
        streaming writer calls after each commit: count the current
        snapshot's part files (driver-side listing, metadata only) and
        rewrite only when fragmentation exceeds ``max_files``. Returns
        the new snapshot info, or None when no compaction ran. This is
        how a `stream_to_laketable` pipeline keeps its read side
        one-task-per-target-bytes healthy without a separate scheduled
        OPTIMIZE job."""
        import glob

        cur = self.current_version()
        if cur is None:
            return None
        n = len(glob.glob(os.path.join(self._vdir(cur), "part-*")))
        if n <= max_files:
            return None
        return self.compact(target_bytes)

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Delete snapshots older than the newest ``keep_last``; never the
        current pointer target. Returns removed version numbers."""
        import shutil

        keep_last = max(1, int(keep_last))
        cur = self.current_version()
        versions = [s.version for s in self.history()]
        removable = [
            v for v in versions[:-keep_last] if v != cur
        ]
        for v in removable:
            shutil.rmtree(self._vdir(v))
        return removable
