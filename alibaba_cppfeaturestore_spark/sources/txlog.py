"""Minimal transaction-logged parquet table — Delta-protocol-shaped.

The reference persists its lake tables as Delta with idempotent writes
(``data_processing/batch_processing/batch_process_Bronze_to_Silver.py:317``,
``.mode("ignore")``); delta-spark is not installable in this container
(re-verified every round), so ``sources/readers.py`` falls back to plain
parquet. This module closes the SEMANTIC gap instead of the dependency
gap: an ordered JSON commit log over immutable parquet data files, giving

- **atomic commits** — a commit is one ``O_CREAT|O_EXCL`` file create of
  ``_txlog/<version>.json``; readers either see the whole commit or none
  of it, and two concurrent writers racing for the same version lose
  deterministically (optimistic concurrency, same as Delta's protocol);
- **write modes** — ``append`` / ``overwrite`` / ``ignore`` (the
  reference's mode: first write wins, later writes are no-ops) /
  ``error``;
- **snapshot-isolated reads** — a read resolves the live file set from
  the log, never from directory listing, so concurrent appends can't
  tear a scan;
- **time travel** — ``read(spark, version=N)`` reconstructs any
  historical snapshot.

Scale notes (the reason Delta exists at 100 TB, reproduced here): the
reader lists ONE small log directory and then opens exactly the data
files named by the manifest — no O(files) object-store LIST per query;
data files are immutable, so caches/replicas never invalidate; an
``overwrite`` is a logical pointer swap, leaving old files in place for
readers pinned to older versions (``vacuum`` reclaims groups outside
the retention window, Delta-style). The log grows O(commits); real
Delta checkpoints it every N commits — the hook is ``_live_files``'s
fold, which a checkpoint would seed, noted rather than built since
catalog-scale commit counts here are tiny.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class TxTable:
    """A transaction-logged parquet table rooted at ``path``.

    Layout::

        path/
          _txlog/00000000000000000001.json   # {"mode": ..., "add": [files]}
          part-<uuid>/...parquet             # immutable data file groups
    """

    def __init__(self, path: str):
        self.path = path
        self.log_dir = os.path.join(path, "_txlog")

    # -- log plumbing -------------------------------------------------------

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _read_commit(self, version: int) -> dict:
        with open(os.path.join(self.log_dir, f"{version:020d}.json")) as f:
            return json.load(f)

    def _live_files(self, as_of: int | None = None) -> list[str]:
        """Fold the log into the live file set: ``overwrite`` resets,
        ``append`` extends. A periodic checkpoint would seed this fold
        with a precomputed set (Delta's `_last_checkpoint`); linear here."""
        live: list[str] = []
        for v in self._versions():
            if as_of is not None and v > as_of:
                break
            commit = self._read_commit(v)
            if commit["mode"] == "overwrite":
                live = list(commit["add"])
            else:
                live.extend(commit["add"])
        return live

    # -- writes -------------------------------------------------------------

    def commit(self, df: DataFrame, mode: str = "append") -> int | None:
        """Write ``df`` as a new immutable file group, then publish it
        with one atomic log-file create. Returns the committed version,
        or None for a skipped ``ignore`` write.

        ``ignore`` short-circuits BEFORE writing data (the reference's
        idempotent-load semantics: if the table exists, the load already
        happened). The data write lands in an unreferenced directory
        until the log create succeeds, so a crash mid-write leaves
        garbage files but never a torn table."""
        if mode not in ("append", "overwrite", "ignore", "error"):
            raise ValueError(f"unknown mode: {mode}")
        existing = self.latest_version()
        if mode == "ignore" and existing is not None:
            return None
        if mode == "error" and existing is not None:
            raise FileExistsError(f"TxTable at {self.path} already has commits")

        group = f"part-{uuid.uuid4().hex}"
        data_path = os.path.join(self.path, group)
        df.write.mode("error").parquet(data_path)

        os.makedirs(self.log_dir, exist_ok=True)
        version = (existing if existing is not None else -1) + 1
        record = {
            "mode": "overwrite" if mode == "overwrite" else "append",
            "add": [group],
        }
        # O_EXCL create = the atomic commit point; a concurrent writer
        # that claimed this version first makes this raise (caller may
        # re-resolve and retry — optimistic concurrency).
        fd = os.open(
            os.path.join(self.log_dir, f"{version:020d}.json"),
            os.O_CREAT | os.O_EXCL | os.O_WRONLY,
        )
        with os.fdopen(fd, "w") as f:
            json.dump(record, f)
        return version

    # -- reads --------------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read as of ``version`` (default: latest). The file
        set comes from the log — concurrent commits after the fold
        cannot affect this scan."""
        files = self._live_files(as_of=version)
        if not files:
            raise FileNotFoundError(f"TxTable at {self.path} is empty")
        return spark.read.parquet(*[os.path.join(self.path, g) for g in files])

    def history(self) -> list[dict]:
        """Commit history (newest last): version, mode, file groups."""
        return [
            {"version": v, **self._read_commit(v)} for v in self._versions()
        ]

    def commit_idempotent(
        self, df: DataFrame, app_id: str, txn_version: int, mode: str = "append"
    ) -> int | None:
        """Transactionally idempotent commit — Delta's ``txnAppId`` /
        ``txnVersion`` pattern, the piece that makes ``foreachBatch``
        sinks exactly-once: the commit record carries (app_id,
        txn_version), and a commit whose version is ≤ the highest
        already recorded for that app is SKIPPED (returns None). A
        replayed micro-batch (restart re-delivering epoch N after a
        crash between sink write and checkpoint advance) therefore
        lands exactly once; pass the ``foreachBatch`` ``epoch_id`` as
        ``txn_version``."""
        latest = self.last_txn_version(app_id)
        if latest is not None and txn_version <= latest:
            return None
        v = self.commit(df, mode)
        if v is None:
            return None
        # annotate the just-published commit record with the txn marker;
        # the log file is the commit point and already exists, so this
        # rewrite is metadata-only and single-writer (we hold version v)
        path = os.path.join(self.log_dir, f"{v:020d}.json")
        record = self._read_commit(v)
        record["txn"] = {"app_id": app_id, "version": txn_version}
        with open(path, "w") as f:
            json.dump(record, f)
        return v

    def last_txn_version(self, app_id: str) -> int | None:
        """Highest committed ``txn_version`` for ``app_id`` (None if the
        app never committed)."""
        best = None
        for v in self._versions():
            txn = self._read_commit(v).get("txn")
            if txn and txn["app_id"] == app_id:
                best = txn["version"] if best is None else max(best, txn["version"])
        return best

    def vacuum(self, retain_last: int = 1) -> list[str]:
        """Delete data-file groups unreferenced by the live sets of the
        last ``retain_last`` versions (Delta ``VACUUM``). Returns the
        removed group names. Time travel to versions older than the
        retained window stops working — the same contract as Delta's
        retention period; immutable groups still referenced by ANY
        retained version are kept, so concurrent readers of retained
        snapshots are never broken. Also collects orphans (data written
        by a crashed, never-published commit)."""
        import shutil

        referenced: set[str] = set()
        for v in self._versions()[-retain_last:]:
            referenced.update(self._live_files(as_of=v))
        removed = []
        for g in os.listdir(self.path):
            if g.startswith("part-") and g not in referenced:
                shutil.rmtree(os.path.join(self.path, g))
                removed.append(g)
        return sorted(removed)

    def optimize(
        self,
        spark: SparkSession,
        sort_by: list[str] | None = None,
        num_files: int = 1,
    ) -> int:
        """OPTIMIZE: rewrite the current snapshot's (possibly many,
        small) file groups into ``num_files`` compacted files —
        optionally ``sortWithinPartitions`` on ``sort_by`` so min/max
        footer stats prune reads (bin-packing + clustering, the Delta
        OPTIMIZE / ZORDER verb for this table format). Data is
        byte-identical to the pre-OPTIMIZE snapshot (it commits as an
        ``overwrite`` of the same rows); old file groups stay
        addressable for time travel until ``vacuum``."""
        current = self.read(spark)
        compacted = current.repartition(num_files)
        if sort_by:
            compacted = compacted.sortWithinPartitions(*sort_by)
        return self.commit(compacted, mode="overwrite")

    def merge_upsert(
        self,
        source: DataFrame,
        keys: list[str],
        delete_col: str | None = None,
    ) -> int:
        """Delta ``MERGE INTO`` semantics against the latest snapshot:
        a source row UPDATES the target row with its key (whole-row
        replace), INSERTS if the key is absent, and DELETES it when
        ``delete_col`` (a boolean column on the source, dropped from the
        output) is true. Commits the merged state as a new ``overwrite``
        version — old snapshots stay time-travelable, exactly like
        Delta's MERGE producing a new table version.

        Plan shape: one anti join (target keys surviving untouched) +
        one filter + union — no full-outer row matching, because the
        update rule is whole-row replace (the common CDC-apply case).
        At scale both sides shuffle on ``keys`` once; with the target
        bucketed on keys the anti join is exchange-free."""
        from pyspark.sql import functions as F

        spark = source.sparkSession
        target = self.read(spark)
        survivors = target.join(source.select(*keys), keys, "left_anti")
        incoming = source
        if delete_col is not None:
            incoming = incoming.filter(~F.col(delete_col)).drop(delete_col)
        merged = survivors.unionByName(incoming)
        return self.commit(merged, "overwrite")


def table_changes(
    table: "TxTable",
    spark: SparkSession,
    from_version: int,
    to_version: int,
    keys: list[str],
) -> DataFrame:
    """Change-data-feed between two committed versions — Delta's
    ``table_changes`` re-expressed over the transaction log: time-travel
    both versions and key-diff them (``operators/diff.py::snapshot_diff``
    → one row per insert/update/delete with an ``op`` column and
    old_/new_ value pairs).
    Reads only the LIVE FILES of the two manifests, never the log's
    full history."""
    from ..operators.diff import snapshot_diff

    old = table.read(spark, version=from_version)
    new = table.read(spark, version=to_version)
    return snapshot_diff(old, new, keys)
