"""SQLite-backed key/value checkpoint storage (dbstorage analog).

Reference: extension/storage/dbstorage/client.go:20-26 — one table
``(key TEXT PRIMARY KEY, value BLOB)`` with get/set/delete prepared
statements and batched operations in a transaction.  Same contract
here over the stdlib ``sqlite3`` (single file, no server): components
persist small state blobs (offsets, shard manifests) under string keys
and survive process restarts.

Scale shape: this is DRIVER-side metadata storage (kilobytes per
shard), exactly like the reference extension — never on the data path.
On a multi-node cluster the file lives with the driver (or any shared
filesystem); worker tasks do not touch it.  WAL mode keeps concurrent
reader processes safe; a single writer (the driver loop) is the
intended pattern, as in the reference's file-locked sqlite.
"""

from __future__ import annotations

import json
import sqlite3
from typing import Any


class DbStorage:
    """Get/Set/Delete/Batch over one sqlite file, dbstorage-shaped."""

    def __init__(self, path: str, table: str = "checkpoints"):
        if not table.replace("_", "").isalnum():
            raise ValueError(f"invalid table name: {table!r}")
        self._table = table
        self._db = sqlite3.connect(path)
        self._db.execute("pragma journal_mode=WAL")
        # client.go createTableSqlite
        self._db.execute(
            f"create table if not exists {table} "
            "(key text primary key, value blob)")
        self._db.commit()

    def get(self, key: str) -> bytes | None:
        row = self._db.execute(
            f"select value from {self._table} where key=?", (key,)
        ).fetchone()
        return None if row is None else row[0]

    def set(self, key: str, value: bytes) -> None:
        self._db.execute(
            f"insert into {self._table}(key, value) values(?, ?) "
            "on conflict(key) do update set value=excluded.value",
            (key, value))
        self._db.commit()

    def delete(self, key: str) -> None:
        self._db.execute(
            f"delete from {self._table} where key=?", (key,))
        self._db.commit()

    def batch(self, ops: list[tuple[str, str, bytes | None]]) -> list:
        """Apply ``(op, key, value)`` tuples in ONE transaction
        (storage.Batch semantics): op in {"get", "set", "delete"}.
        Returns the list of results (bytes|None for gets, None else)."""
        out: list = []
        with self._db:  # transaction
            for op, key, value in ops:
                if op == "get":
                    row = self._db.execute(
                        f"select value from {self._table} where key=?",
                        (key,)).fetchone()
                    out.append(None if row is None else row[0])
                elif op == "set":
                    self._db.execute(
                        f"insert into {self._table}(key, value) "
                        "values(?, ?) on conflict(key) do update set "
                        "value=excluded.value", (key, value))
                    out.append(None)
                elif op == "delete":
                    self._db.execute(
                        f"delete from {self._table} where key=?", (key,))
                    out.append(None)
                else:
                    raise ValueError(f"unknown op: {op!r}")
        return out

    # -- JSON convenience for manifest-sized state ----------------------
    def get_json(self, key: str) -> Any | None:
        raw = self.get(key)
        if raw is None:
            return None
        try:
            return json.loads(raw)
        except ValueError:
            return None

    def set_json(self, key: str, value: Any) -> None:
        self.set(key, json.dumps(value).encode("utf-8"))

    def keys(self) -> list[str]:
        return [r[0] for r in self._db.execute(
            f"select key from {self._table} order by key")]

    def close(self) -> None:
        self._db.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
