"""Per-superstep checkpointing with lineage + metrics (north rule).

Each superstep of an iterative algorithm can persist its score shards
as parquet under ``<dir>/<algo>/iter=K/`` together with a manifest
entry ``<dir>/<algo>/manifest/iter_K.json`` recording
(iteration, delta, rows, wall-time, extra metrics). Shard writes are
idempotent (overwrite by iteration directory) and the manifest file is
written *after* the shard, so the latest complete iteration is simply
the max K with a manifest entry — a killed job resumes mid-iteration
by reloading that shard (SURVEY.md §7 risk notes).

This doubles as lineage truncation: reading the shard back gives the
driver loop a fresh plan root, keeping plan depth O(1) across ~100
iterations instead of O(iters).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class CheckpointManager:
    def __init__(self, base_dir: str, algo: str):
        self.dir = os.path.join(base_dir, algo)
        self.manifest_dir = os.path.join(self.dir, "manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def shard_path(self, iteration: int) -> str:
        return os.path.join(self.dir, f"iter={iteration}")

    def _manifest_path(self, iteration: int) -> str:
        return os.path.join(self.manifest_dir, f"iter_{iteration:06d}.json")

    def save(self, iteration: int, df: DataFrame, metrics: dict) -> DataFrame:
        """Write shard + manifest; return the reloaded (lineage-free)
        DataFrame."""
        path = self.shard_path(iteration)
        t0 = time.time()
        df.write.mode("overwrite").parquet(path)
        entry = {
            "iteration": iteration,
            "checkpoint_write_sec": time.time() - t0,
            **metrics,
        }
        tmp = self._manifest_path(iteration) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, self._manifest_path(iteration))
        return df.sparkSession.read.parquet(path)

    def iterations(self) -> list[int]:
        out = []
        for name in os.listdir(self.manifest_dir):
            if name.startswith("iter_") and name.endswith(".json"):
                out.append(int(name[5:-5]))
        return sorted(out)

    def latest(self) -> int | None:
        its = self.iterations()
        return its[-1] if its else None

    def load(self, spark: SparkSession, iteration: int) -> DataFrame:
        return spark.read.parquet(self.shard_path(iteration))

    def manifest(self, iteration: int) -> dict:
        with open(self._manifest_path(iteration)) as f:
            return json.load(f)
