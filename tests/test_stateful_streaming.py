"""applyInPandasWithState per-host progress: state persists across
micro-batches and resumes from the streaming checkpoint."""

import json
import shutil
import tempfile

from od_database_spark.streaming import stateful as ST


def _write_batch(d, fname, hosts):
    with open(f"{d}/{fname}", "w") as f:
        for h in hosts:
            f.write(json.dumps({"host": h, "url": f"http://{h}/x/"}) + "\n")


def _drain(spark, src, ckpt, got):
    stream = (
        spark.readStream.schema("host string, url string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = ST.host_progress_stream(stream)

    def sink(batch_df, _epoch):
        got.extend(batch_df.collect())

    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_host_progress_state_across_batches(spark):
    d = tempfile.mkdtemp(prefix="oddb_state_")
    try:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        import os

        os.makedirs(src)
        # two files -> two micro-batches (maxFilesPerTrigger=1)
        _write_batch(src, "b0.json", ["a.example"] * 3 + ["b.example"])
        _write_batch(src, "b1.json", ["a.example"] * 2)
        got = []
        _drain(spark, src, ckpt, got)
        by = {}
        for r in got:  # last emission per host wins (update mode)
            by[r["host"]] = r
        assert by["a.example"]["urls_total"] == 5
        assert by["a.example"]["batches_seen"] == 2
        assert by["b.example"]["urls_total"] == 1

        # resume from the checkpoint: only the NEW file is processed, state
        # carries the old totals forward
        _write_batch(src, "b2.json", ["a.example", "b.example", "b.example"])
        got2 = []
        _drain(spark, src, ckpt, got2)
        by2 = {r["host"]: r for r in got2}
        assert set(by2) == {"a.example", "b.example"}
        assert by2["a.example"]["urls_total"] == 6
        assert by2["a.example"]["batch_urls"] == 1
        assert by2["b.example"]["urls_total"] == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)
