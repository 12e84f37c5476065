"""Iceberg-style table emulation: Parquet data + atomic JSON snapshot log.

The runtime image has no Iceberg jar (SURVEY.md §7), so snapshot semantics
are emulated over plain Parquet with a manifest log, keeping the API
drop-in replaceable by a real Iceberg catalog:

* each ``append``/``overwrite`` commit writes data files under a unique
  directory, then atomically publishes a snapshot JSON (write-temp +
  rename) listing the live data directories, the parent snapshot, commit
  metadata, and user-supplied properties (e.g. processed-cell watermarks);
* readers resolve the latest (or any historical) snapshot and read exactly
  its file set — stale/partial writer directories are invisible until
  published (the reference's durability role of the external spill file,
  src/osm_node_storage.erl:33-91, upgraded to job-level resumability per
  the north rule);
* ``resume token``: jobs store arbitrary progress metadata per commit and
  read it back after a crash to skip completed work (see
  plans/checkpoint.py).

Atomicity note: os.rename within one directory is atomic on POSIX; on a
real deployment this maps to an Iceberg catalog swap.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class IceLiteTable:
    """A snapshot-logged parquet table rooted at ``path``."""

    def __init__(self, path: str | Path):
        self.root = Path(path)
        self.snap_dir = self.root / "snapshots"
        self.data_dir = self.root / "data"

    # ---------------- snapshot log ----------------

    def _snapshot_files(self) -> list[Path]:
        if not self.snap_dir.exists():
            return []
        return sorted(self.snap_dir.glob("snap-*.json"))

    def snapshots(self) -> list[dict[str, Any]]:
        return [json.loads(p.read_text()) for p in self._snapshot_files()]

    def current_snapshot(self) -> dict[str, Any] | None:
        files = self._snapshot_files()
        return json.loads(files[-1].read_text()) if files else None

    def _publish(self, snap: dict[str, Any]) -> dict[str, Any]:
        self.snap_dir.mkdir(parents=True, exist_ok=True)
        # continue from the last LIVE sequence, not the live file count —
        # expire_snapshots archives old logs, so count would collide with
        # archived names (and break the monotone commit order)
        files = self._snapshot_files()
        seq = (int(files[-1].stem.split("-")[1]) + 1) if files else 0
        snap["sequence"] = seq
        snap["snapshot_id"] = f"{seq:08d}-{uuid.uuid4().hex[:8]}"
        tmp = self.snap_dir / f".tmp-{uuid.uuid4().hex}.json"
        tmp.write_text(json.dumps(snap, indent=1, sort_keys=True))
        os.rename(tmp, self.snap_dir / f"snap-{seq:08d}.json")
        return snap

    # ---------------- writes ----------------

    def _write_data(self, df: DataFrame) -> str:
        d = f"d-{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(str(self.data_dir / d))
        return d

    def append(self, df: DataFrame, properties: dict[str, Any] | None = None) -> dict[str, Any]:
        cur = self.current_snapshot()
        dirs = list(cur["data_dirs"]) if cur else []
        dirs.append(self._write_data(df))
        return self._publish(
            {
                "operation": "append",
                "parent": cur["snapshot_id"] if cur else None,
                "data_dirs": dirs,
                "committed_at": time.time(),
                "properties": properties or {},
            }
        )

    def overwrite(self, df: DataFrame, properties: dict[str, Any] | None = None) -> dict[str, Any]:
        cur = self.current_snapshot()
        return self._publish(
            {
                "operation": "overwrite",
                "parent": cur["snapshot_id"] if cur else None,
                "data_dirs": [self._write_data(df)],
                "committed_at": time.time(),
                "properties": properties or {},
            }
        )

    def compact(
        self, spark: SparkSession, target_partitions: int | None = None,
        properties: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Rewrite the current snapshot's data dirs into ONE directory and
        publish a ``compact`` snapshot over it.

        The small-file antidote for append-heavy tables (one dir per
        streaming epoch): N epoch dirs collapse to one parquet directory
        with ``target_partitions`` files (default: Spark decides), so scan
        task counts stop growing with epoch history.  Old dirs stay on
        disk for time travel until ``expire_snapshots``.
        """
        cur = self.current_snapshot()
        if cur is None:
            raise FileNotFoundError(f"no snapshots in {self.root}")
        df = self.read(spark)
        if target_partitions is not None:
            df = df.coalesce(int(target_partitions))
        return self._publish(
            {
                "operation": "compact",
                "parent": cur["snapshot_id"],
                "data_dirs": [self._write_data(df)],
                "committed_at": time.time(),
                "properties": {**(cur.get("properties") or {}), **(properties or {})},
            }
        )

    def expire_snapshots(self, keep_last: int = 1, archive: bool = True) -> int:
        """Expire snapshot logs older than the last ``keep_last`` and delete
        any data dirs no surviving snapshot references.  Returns the number
        of data dirs removed.  (The Iceberg maintenance analog; time travel
        only reaches surviving snapshots afterwards.)

        ``archive=True`` (default) moves the expired snapshot JSONs to
        ``snapshots/archive/`` instead of unlinking them: the DATA (the
        disk cost) is reclaimed either way, while per-commit operational
        metadata (epoch tags, the streaming 'affected' counters) stays
        inspectable via ``snapshot_history()`` at a few hundred bytes per
        commit — the stand-in for the metrics sink a real deployment would
        ship those properties to."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        files = self._snapshot_files()
        if len(files) <= keep_last:
            return 0
        keep, drop = files[-keep_last:], files[:-keep_last]
        live = {
            d for p in keep for d in json.loads(p.read_text())["data_dirs"]
        }
        removed = 0
        arch = self.snap_dir / "archive"
        for p in drop:
            for d in json.loads(p.read_text())["data_dirs"]:
                path = self.data_dir / d
                if d not in live and path.exists():
                    shutil.rmtree(path)
                    removed += 1
            if archive:
                arch.mkdir(parents=True, exist_ok=True)
                os.rename(p, arch / p.name)
            else:
                p.unlink()
        return removed

    def snapshot_history(self) -> list[dict[str, Any]]:
        """All snapshot metadata in commit order, INCLUDING archived
        (expired) snapshots — for metrics/audit; only ``snapshots()``
        entries are readable."""
        arch = self.snap_dir / "archive"
        files = sorted(arch.glob("snap-*.json")) if arch.exists() else []
        return [json.loads(p.read_text()) for p in files] + self.snapshots()

    # ---------------- reads ----------------

    def read(self, spark: SparkSession, snapshot_id: str | None = None) -> DataFrame:
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"no snapshots in {self.root}")
        if snapshot_id is None:
            snap = snaps[-1]
        else:
            matching = [s for s in snaps if s["snapshot_id"] == snapshot_id]
            if not matching:
                raise KeyError(f"snapshot {snapshot_id} not found in {self.root}")
            snap = matching[0]
        paths = [str(self.data_dir / d) for d in snap["data_dirs"]]
        return spark.read.parquet(*paths)

    def exists(self) -> bool:
        return bool(self._snapshot_files())
