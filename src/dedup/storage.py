"""Atomic-snapshot table store.

Production target is Iceberg (`df.writeTo(tbl)` + snapshot commits); the
sandbox has no Iceberg runtime jar, so this module provides the documented
fallback (SURVEY.md section 7 hard-parts): parquet directories with an atomic
CURRENT-pointer commit. The semantics mirror Iceberg's:

- a write lands in a fresh snapshot directory, then a single atomic
  `os.replace` of the CURRENT pointer publishes it (no torn reads),
- readers always resolve CURRENT first — they see the old snapshot until the
  pointer flips (snapshot isolation),
- snapshots are immutable; re-running a stage produces a new snapshot and the
  pointer flip is last-writer-wins, which is safe because stages are
  deterministic functions of (input snapshot, config) — the batch analogue of
  the reference's CAS takeover being unnecessary when recompute is idempotent
  (reference: ProcessRepo.scala:84-89; SURVEY.md section 2.1 R9 mapping).

The store is the single storage interface, so swapping in real Iceberg is a
one-module change.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _table_dir(self, name: str) -> Path:
        return self.root / name

    def _pointer(self, name: str) -> Path:
        return self._table_dir(name) / "CURRENT"

    # -- commit protocol ---------------------------------------------------

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> str:
        """Write `df` as a new immutable snapshot and atomically publish it.

        Returns the snapshot id. Analogue of the reference's markAsCompleted
        phase-2 commit (MeteorProcessRepo.scala:46-73): data first, pointer
        (completion record) last.
        """
        tdir = self._table_dir(name)
        tdir.mkdir(parents=True, exist_ok=True)
        snap_id = f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        snap_dir = tdir / snap_id
        df.write.mode("errorifexists").parquet(str(snap_dir))
        self._publish(name, snap_id)
        return snap_id

    def write_pandas(self, pdf, name: str) -> str:
        """Snapshot-commit a pandas DataFrame (small control tables)."""
        tdir = self._table_dir(name)
        tdir.mkdir(parents=True, exist_ok=True)
        snap_id = f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        snap_dir = tdir / snap_id
        snap_dir.mkdir()
        pdf.to_parquet(snap_dir / "part-0.parquet", index=False)
        self._publish(name, snap_id)
        return snap_id

    def _publish(self, name: str, snap_id: str) -> None:
        ptr = self._pointer(name)
        tmp = ptr.with_suffix(f".tmp-{uuid.uuid4().hex[:8]}")
        tmp.write_text(json.dumps({"snapshot": snap_id, "ts": time.time()}))
        os.replace(tmp, ptr)  # atomic on POSIX

    # -- reads -------------------------------------------------------------

    def current_snapshot(self, name: str) -> str | None:
        ptr = self._pointer(name)
        if not ptr.exists():
            return None
        return json.loads(ptr.read_text())["snapshot"]

    def exists(self, name: str) -> bool:
        return self.current_snapshot(name) is not None

    def path(self, name: str) -> str:
        snap = self.current_snapshot(name)
        if snap is None:
            raise FileNotFoundError(f"table {name!r} has no committed snapshot")
        return str(self._table_dir(name) / snap)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def read_pandas(self, name: str):
        import pandas as pd

        p = Path(self.path(name))
        parts = sorted(p.glob("*.parquet"))
        return pd.concat([pd.read_parquet(f) for f in parts], ignore_index=True)

    def drop(self, name: str) -> None:
        """Remove the CURRENT pointer (snapshots kept — time-travel style)."""
        ptr = self._pointer(name)
        if ptr.exists():
            ptr.unlink()
