"""Checkpoint-recovery restart: the property that makes Structured
Streaming production-grade — source offsets live in the checkpoint, so
a stopped query restarted with the same checkpointLocation resumes
AFTER everything it already processed (no reprocessing), picks up new
input, and an idempotent per-batch sink yields end-to-end
exactly-once. The in-repo streaming queries use ephemeral sinks (test
vantage); this pins the recovery contract itself.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from bigdatafinalproject_spark.catalog import ensure_session_defaults
from bigdatafinalproject_spark.streaming.events import _raw_schema_and_norm

SRC = "/root/testdata/sf0.001/events.parquet"
SF_DIR = "/root/testdata/sf0.001"


def test_checkpoint_restart_resumes_exactly_once(spark, tmp_path):
    ensure_session_defaults(spark)
    src = pq.read_table(SRC)
    half = src.num_rows // 2
    indir = tmp_path / "in"
    indir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    batches_seen: list[int] = []

    def run_once() -> None:
        schema, _ = _raw_schema_and_norm(SF_DIR)
        stream = (
            spark.readStream.format("parquet").schema(schema).load(str(indir))
        )

        def write_batch(bdf, bid: int) -> None:
            batches_seen.append(bid)
            # idempotent: a replayed batch overwrites its own directory
            bdf.write.mode("overwrite").parquet(f"{sink}/batch={bid}")

        q = (
            stream.writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(write_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # phase 1: half the input, first run
    pq.write_table(src.slice(0, half), indir / "a.parquet")
    run_once()
    assert spark.read.parquet(sink).drop("batch").count() == half

    # phase 2: new file appears while the query is DOWN; restart with the
    # same checkpoint must process only the new file
    pq.write_table(src.slice(half), indir / "b.parquet")
    first_run_batches = list(batches_seen)
    run_once()
    total = spark.read.parquet(sink).drop("batch").count()
    assert total == src.num_rows, f"expected exactly-once total, got {total}"
    # restart continued the batch sequence instead of replaying batch 0
    new_batches = batches_seen[len(first_run_batches):]
    assert new_batches, "restart processed nothing"
    assert min(new_batches) > max(first_run_batches), (
        f"restart replayed old batches: {batches_seen}"
    )
