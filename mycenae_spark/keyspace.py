"""Keyspace management (SURVEY.md §1.1; upstream ``lib/keyspace``).

Mycenae's keyspace is a Cassandra keyspace with replication settings and a
TTL, created over REST; every point belongs to one via the ``ksid`` tag.
Spark-native mapping: a keyspace is a lake namespace —
``<lake>/ksid=<name>/date=YYYY-MM-DD/...`` — plus a config record.  TTL
enforcement becomes a *partition-drop maintenance job*: deleting expired
``date=`` directories is a metadata-only operation, never a data rewrite
(SCALING.md §1); the reference gets the same effect from Cassandra cell TTL.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict, dataclass
from datetime import date, timedelta


@dataclass
class Keyspace:
    name: str
    ttl_days: int = 90
    replication: int = 3  # advisory on a DFS; kept for API parity
    datacenter: str = "dc1"
    contact: str = ""


class KeyspaceManager:
    """CRUD over keyspace configs + the TTL maintenance job.

    Configs live in one JSON file beside the lake (a real deployment puts
    this in a catalog table; the surface is what matters for parity:
    create / list / get / update-ttl / drop / apply-ttl)."""

    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir
        self._cfg_path = os.path.join(lake_dir, "_keyspaces.json")

    # -- config CRUD ------------------------------------------------------

    def _load(self) -> dict[str, dict]:
        if not os.path.exists(self._cfg_path):
            return {}
        with open(self._cfg_path) as f:
            return json.load(f)

    def _save(self, cfg: dict[str, dict]) -> None:
        os.makedirs(self.lake_dir, exist_ok=True)
        with open(self._cfg_path, "w") as f:
            json.dump(cfg, f, indent=2, sort_keys=True)

    def create(self, ks: Keyspace) -> None:
        cfg = self._load()
        if ks.name in cfg:
            raise ValueError(f"keyspace exists: {ks.name}")
        cfg[ks.name] = asdict(ks)
        self._save(cfg)

    def list(self) -> list[str]:
        return sorted(self._load())

    def get(self, name: str) -> Keyspace:
        cfg = self._load()
        if name not in cfg:
            raise KeyError(name)
        return Keyspace(**cfg[name])

    def update_ttl(self, name: str, ttl_days: int) -> None:
        cfg = self._load()
        if name not in cfg:
            raise KeyError(name)
        cfg[name]["ttl_days"] = ttl_days
        self._save(cfg)

    def drop(self, name: str) -> None:
        cfg = self._load()
        cfg.pop(name, None)
        self._save(cfg)
        path = os.path.join(self.lake_dir, f"ksid={name}")
        if os.path.exists(path):
            from mycenae_spark.maintenance import retain_path
            from mycenae_spark.streaming import commitlog

            # same snapshot-visibility contract as apply_ttl: log first,
            # then move the partition into the retention area (grace
            # window for pinned snapshot readers; gc_retained reclaims)
            seq = commitlog.append(
                self.lake_dir,
                {"kind": "partition-drop", "partitions": [f"ksid={name}"]},
            )
            dst = retain_path(self.lake_dir, seq, f"ksid={name}")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(path, dst)

    # -- TTL maintenance --------------------------------------------------

    def expired_partitions(self, name: str, today: date) -> list[str]:
        """date= directories older than the keyspace TTL."""
        ks = self.get(name)
        cutoff = today - timedelta(days=ks.ttl_days)
        root = os.path.join(self.lake_dir, f"ksid={name}")
        if not os.path.isdir(root):
            return []
        out = []
        for entry in sorted(os.listdir(root)):
            if not entry.startswith("date="):
                continue
            try:
                d = date.fromisoformat(entry.split("=", 1)[1])
            except ValueError:
                continue
            if d < cutoff:
                out.append(os.path.join(root, entry))
        return out

    def apply_ttl(self, name: str, today: date | None = None) -> list[str]:
        """Drop expired partitions; returns the paths removed.  Pure
        directory moves — cost independent of partition size.

        The drop is recorded in the commit log (``partition-drop``) so
        log-gated snapshot readers (streaming/snapshot.py) remove the
        partitions' files from the visible set at this exact position —
        without the entry, every later snapshot read would reference the
        dropped files and fail.  The partitions themselves move to
        ``_retained/<seq>/`` (grace window): snapshot reads pinned before
        the drop keep resolving until ``maintenance.gc_retained`` reclaims
        the bytes.  No CAS: the TTL horizon is days while append
        timestamps are near-now, so a batch racing the drop into an
        *expired* partition is already outside the data contract (its
        points were due for deletion the moment they landed)."""
        dropped = self.expired_partitions(name, today or date.today())
        if dropped:
            from mycenae_spark.maintenance import retain_path
            from mycenae_spark.streaming import commitlog

            seq = commitlog.append(
                self.lake_dir,
                {
                    "kind": "partition-drop",
                    "partitions": [
                        os.path.relpath(p, self.lake_dir) for p in dropped
                    ],
                },
            )
            for path in dropped:
                dst = retain_path(
                    self.lake_dir, seq, os.path.relpath(path, self.lake_dir)
                )
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.move(path, dst)
        return dropped
