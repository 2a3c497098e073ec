"""Resumable per-stage checkpoints: Parquet tables + a JSON manifest.

The north rule requires per-partition checkpoint/lineage/metrics tables so
any stage is resumable mid-run. No Iceberg runtime jar ships in this
sandbox (verified in SURVEY §7), so the layout is "Iceberg-shaped":
one directory per stage table with

    <root>/<stage>/data/            partitioned parquet
    <root>/<stage>/manifest.json    config hash, upstream hashes, row count,
                                    schema, written timestamp

A stage is *resumed* (read, not recomputed) when its manifest exists and
its ``config_hash`` + ``upstream`` chain match the current run — the same
validity rule Iceberg snapshots give via snapshot lineage. Writes go to a
temp dir and are atomically renamed, so a killed run never leaves a
half-written stage that passes validation.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from datasketches_spark.config import DedupConfig


def config_hash(cfg: DedupConfig, extra: dict | None = None) -> str:
    payload = {"cfg": asdict(cfg), "extra": extra or {}}
    return hashlib.sha256(json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str, cfg: DedupConfig,
                 run_id: str = "run", enabled: bool = True):
        self.spark = spark
        self.root = root
        self.cfg = cfg
        self.cfg_hash = config_hash(cfg)
        self.run_id = run_id
        self.enabled = enabled
        self.lineage: list[dict] = []
        if enabled:
            os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- stages

    def _paths(self, stage: str) -> tuple[str, str]:
        d = os.path.join(self.root, stage)
        return os.path.join(d, "data"), os.path.join(d, "manifest.json")

    def is_valid(self, stage: str, upstream: list[str]) -> bool:
        _, mpath = self._paths(stage)
        if not os.path.exists(mpath):
            return False
        with open(mpath) as f:
            m = json.load(f)
        return m.get("config_hash") == self.cfg_hash and m.get("upstream") == upstream

    def stage(self, name: str, compute: Callable[[], DataFrame],
              upstream: list[str] | None = None,
              partition_by: list[str] | None = None,
              min_partitions: int | None = None) -> DataFrame:
        """Run (or resume) a stage. The returned DataFrame always reads from
        the checkpointed parquet, so downstream plans never re-execute
        upstream stages."""
        upstream = upstream or []
        t0 = time.time()
        if not self.enabled:
            df = compute()
            self.lineage.append({"stage": name, "resumed": False, "checkpointed": False})
            return df
        dpath, mpath = self._paths(name)
        if self.is_valid(name, upstream):
            self.lineage.append({"stage": name, "resumed": True})
            return self.spark.read.parquet(dpath)
        df = compute()
        if min_partitions:
            # AQE coalesces small shuffle outputs to very few partitions;
            # a checkpoint that feeds a compute-heavy downstream stage must
            # keep enough files for that stage's parallelism
            df = df.repartition(min_partitions)
        tmp = dpath + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        out = self.spark.read.parquet(tmp)
        n_rows = out.count()
        manifest = {
            "stage": name,
            "config_hash": self.cfg_hash,
            "upstream": upstream,
            "run_id": self.run_id,
            "n_rows": n_rows,
            "schema": out.schema.jsonValue(),
            "written_at": time.time(),
        }
        shutil.rmtree(dpath, ignore_errors=True)
        os.makedirs(os.path.dirname(dpath), exist_ok=True)
        os.rename(tmp, dpath)
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.rename(mpath + ".tmp", mpath)
        entry = {"stage": name, "resumed": False, "n_rows": n_rows,
                 "wall_sec": round(time.time() - t0, 2)}
        self.lineage.append(entry)
        if os.environ.get("DEDUP_PROFILE"):
            print(f"[stage {name}] {entry['wall_sec']}s rows={n_rows}", flush=True)
        return self.spark.read.parquet(dpath)

    # ------------------------------------------------------------ metrics

    def write_metrics(self, metrics: dict) -> None:
        if not self.enabled:
            return
        path = os.path.join(self.root, "metrics.json")
        record = {"run_id": self.run_id, "config_hash": self.cfg_hash,
                  "written_at": time.time(), "lineage": self.lineage, **metrics}
        with open(path, "w") as f:
            json.dump(record, f, indent=2, default=str)
