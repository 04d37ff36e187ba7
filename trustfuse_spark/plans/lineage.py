"""Checkpoint / lineage / resume (north_rule: resumable from checkpoint with
per-partition lineage + metrics).

Stage boundaries are table writes: locally parquet under a run directory;
on a cluster the same calls write Iceberg snapshots (writeTo(...).append()).
Each completed stage appends a lineage record with per-partition row counts
and wall time; `resume` replays the pipeline skipping stages whose output
table + lineage record already exist — mid-run kill -> rerun picks up after
the last complete stage, byte-identical outputs (generators and operators
are deterministic; SURVEY §5.3.4).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageRun:
    run_id: str
    root: str
    spark: SparkSession
    stages_done: list[str] = field(default_factory=list)

    def _stage_path(self, stage: str) -> str:
        return os.path.join(self.root, self.run_id, stage)

    def _lineage_path(self) -> str:
        return os.path.join(self.root, self.run_id, "_lineage")

    def is_done(self, stage: str) -> bool:
        """Done = output table committed AND its lineage record exists. A
        kill between the parquet commit and the lineage append must re-run
        the stage (mode=overwrite makes that idempotent) — _SUCCESS alone
        would resume a stage with no lineage record."""
        return os.path.exists(
            os.path.join(self._stage_path(stage), "_SUCCESS")
        ) and os.path.exists(
            os.path.join(self._lineage_path(), f"{stage}.json")
        )

    def materialize(self, stage: str, df_fn, partition_by: tuple[str, ...] = ()) -> DataFrame:
        """Run df_fn() -> DataFrame unless the stage output already exists;
        either way return the stage's table (reading back from storage, so
        downstream lineage starts at the table boundary — the resume point).
        """
        path = self._stage_path(stage)
        if not self.is_done(stage):
            t0 = time.perf_counter()
            df = df_fn()
            # per-partition metrics captured in the same pass as the write
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(path)
            wall_ms = int((time.perf_counter() - t0) * 1000)
            out = self.spark.read.parquet(path)
            # file-level lineage: rows per WRITTEN file (input_file_name of
            # the read-back scan), not spark_partition_id of the read split —
            # the read planner may coalesce/split files differently
            parts = (
                out.groupBy(F.input_file_name().alias("file"))
                .count()
                .collect()
            )
            self._append_lineage(
                stage,
                wall_ms,
                rows=sum(r["count"] for r in parts),
                partitions=[
                    (os.path.relpath(r["file"].removeprefix("file://"), path), r["count"])
                    for r in parts
                ],
            )
        self.stages_done.append(stage)
        return self.spark.read.parquet(path)

    def _append_lineage(self, stage: str, wall_ms: int, rows: int, partitions) -> None:
        os.makedirs(self._lineage_path(), exist_ok=True)
        rec = {
            "run_id": self.run_id,
            "stage": stage,
            "rows": rows,
            "wall_ms": wall_ms,
            "partitions": [{"file": p, "rows": n} for p, n in partitions],
            "ts": time.time(),
        }
        with open(
            os.path.join(self._lineage_path(), f"{stage}.json"), "w"
        ) as fh:
            json.dump(rec, fh)

    def lineage(self) -> list[dict]:
        path = self._lineage_path()
        if not os.path.isdir(path):
            return []
        out = []
        for name in sorted(os.listdir(path)):
            with open(os.path.join(path, name)) as fh:
                out.append(json.load(fh))
        return out


def run_resumable_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    run_id: str,
    model: str = "crh",
    **fuse_kwargs,
) -> tuple[DataFrame, StageRun]:
    """The SURVEY §7.1 stage chain with a table boundary per stage.

    Stages: claims -> truth (+weights) -> triples. Killing the process after
    stage k and re-invoking with the same run_id skips stages < k.
    """
    from trustfuse_spark.plans.pipeline import docs_to_claims, fuse, truth_to_triples

    run = StageRun(run_id=run_id, root=root, spark=spark)

    claims = run.materialize(
        "claims",
        lambda: docs_to_claims(docs).select(
            "bucket_id", "source", "entity", "attr",
            "value_str", "value_num", "claim_type",
        ),
        partition_by=("bucket_id",),
    )

    def _fuse_truth():
        res = fuse(claims, model=model, **fuse_kwargs)
        # stash weights alongside (second table in the same stage)
        res.weights.write.mode("overwrite").parquet(
            os.path.join(root, run_id, "weights")
        )
        return res.truth

    truth = run.materialize("truth", _fuse_truth, partition_by=("bucket_id",))
    triples = run.materialize("triples", lambda: truth_to_triples(truth))
    return triples, run
