"""Streaming front-end tests (file stream -> foreachBatch routing)."""

import shutil
import tempfile

from pyspark.sql import functions as F

from logjuicer_spark import gen, pipeline, streaming
from logjuicer_spark.schemas import TURNS


def test_score_stream(spark):
    baseline_rows, target_rows, expected = gen.generate_corpus(
        n_baseline_convs=3, n_target_convs=4, turns_per_conv=25, seed=5
    )
    baseline = gen.to_spark_df(spark, baseline_rows)
    model_df = pipeline.train_model(spark, baseline)

    in_dir = tempfile.mkdtemp(prefix="stream_in_")
    out_dir = tempfile.mkdtemp(prefix="stream_out_")
    gen.to_spark_df(spark, target_rows).write.mode("overwrite").parquet(in_dir)

    stream = spark.readStream.schema(TURNS).parquet(in_dir)
    q = streaming.score_stream(spark, stream, model_df, out_dir)
    q.awaitTermination(300)

    routed = spark.read.parquet(f"{out_dir}/routed")
    got = {
        (r.conv_id, r.turn_idx)
        for r in routed.filter(F.col("route") == "anomaly").collect()
    }
    want = {(c, t) for c, t, _ in expected}
    # batch-scoped dedup: every injected anomaly has a unique token-set, so
    # the streaming result matches the batch result exactly here
    assert got == want
    assert routed.count() == len(target_rows)

    # windowed aggregate over the routed sink (batch DF exercises the same
    # expression tree the streaming variant uses)
    agg = (
        spark.read.parquet(f"{out_dir}/routed")
        .filter(F.col("route") == "anomaly")
        .groupBy(F.window("ts", "5 minutes"), "tool")
        .agg(F.count(F.lit(1)).alias("anomaly_count"))
    )
    assert agg.agg(F.sum("anomaly_count")).collect()[0][0] == len(want)
    shutil.rmtree(in_dir, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)


def test_stateful_route_across_batches(spark):
    import time
    from logjuicer_spark import model as M
    from logjuicer_spark.streaming import stateful_route

    baseline_rows, _, _ = gen.generate_corpus(
        n_baseline_convs=3, n_target_convs=1, turns_per_conv=25, seed=6
    )
    model_df = pipeline.train_model(spark, gen.to_spark_df(spark, baseline_rows))
    bc = M.broadcast_indexes(spark, M.collect_indexes(model_df))

    in_dir = tempfile.mkdtemp(prefix="sstream_in_")
    ckpt = tempfile.mkdtemp(prefix="sstream_ck_")

    def turn(i, text):
        return {"conv_id": "cX", "turn_idx": i, "role": "tool", "text": text,
                "tool": "bash", "ts": None}

    # batch 1: normal lines then an anomaly whose after-context is cut off
    batch1 = [
        turn(1, "cache lookup for bucket amber returned 3 entries with hit ratio stable behaviour"),
        turn(2, "writing scratch file /tmp/build-9f3a2b1c/output.log with 55 bytes payload done"),
        turn(3, "FATAL disk corruption detected on volume omegastream sector unreadable halting"),
        turn(4, "configuration reload finished successfully revision abcd1234 applied across 3 workers smoothly"),
    ]
    gen.to_spark_df(spark, batch1).write.parquet(f"{in_dir}/b1")

    from logjuicer_spark.schemas import TURNS
    stream = spark.readStream.schema(TURNS).parquet(f"{in_dir}/*")
    q = (
        stateful_route(stream, bc)
        .writeStream.format("memory")
        .queryName("sanoms")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    assert spark.sql("select * from sanoms").count() == 0  # after-ctx pending

    # batch 2: the after-context completes across the batch boundary
    batch2 = [
        turn(5, "scheduler assigned task copper onto node compute-3 with affinity score 9 points"),
        turn(6, "cache lookup for bucket maroon returned 9 entries with hit ratio stable behaviour"),
    ]
    gen.to_spark_df(spark, batch2).write.parquet(f"{in_dir}/b2")
    # the file source lists the input dir asynchronously; under host load a
    # single processAllAvailable can return before the b2 listing lands, so
    # poll briefly (the data itself is deterministic)
    rows = []
    deadline = time.time() + 60
    while time.time() < deadline:
        q.processAllAvailable()
        rows = spark.sql("select * from sanoms").collect()
        if rows:
            break
        time.sleep(0.5)
    q.stop()
    assert len(rows) == 1
    a = rows[0]
    assert a.turn_idx == 3 and "FATAL disk corruption" in a.text
    assert len(a.before) == 2  # the two tail lines from batch 1
    # after-context spans the batch boundary: line 4 (batch1) + lines 5,6 (batch2)
    assert len(a.after) == 3
    assert a.after[0].startswith("configuration reload")
    assert a.after[1].startswith("scheduler assigned")
    assert a.after[2].startswith("cache lookup")
    shutil.rmtree(in_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_stateful_route_quiescence_flush(spark):
    """An anomaly still collecting after-context at the stream tail must be
    emitted (with partial context) once the conversation has been idle for
    the processing-time timeout — not lost forever (round-3 fix). No
    successor data is ever written: the timeout alone flushes it."""
    import time

    from logjuicer_spark import model as M
    from logjuicer_spark.streaming import stateful_route

    baseline_rows, _, _ = gen.generate_corpus(
        n_baseline_convs=3, n_target_convs=1, turns_per_conv=25, seed=6
    )
    model_df = pipeline.train_model(spark, gen.to_spark_df(spark, baseline_rows))
    bc = M.broadcast_indexes(spark, M.collect_indexes(model_df))

    in_dir = tempfile.mkdtemp(prefix="squiesce_in_")
    ckpt = tempfile.mkdtemp(prefix="squiesce_ck_")

    def turn(conv, i, text):
        return {"conv_id": conv, "turn_idx": i, "role": "tool", "text": text,
                "tool": "bash", "ts": None}

    # conv cT ends ON an anomaly: its after-context never completes
    batch1 = [
        turn("cT", 1, "cache lookup for bucket amber returned 3 entries with hit ratio stable behaviour"),
        turn("cT", 2, "FATAL disk corruption detected on volume omegastream sector unreadable halting"),
    ]
    gen.to_spark_df(spark, batch1).write.parquet(f"{in_dir}/b1")
    stream = spark.readStream.schema(TURNS).parquet(f"{in_dir}/*")
    q = (
        stateful_route(stream, bc, flush_timeout_ms=1)
        .writeStream.format("memory")
        .queryName("squiesce")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql("select * from squiesce").collect()
            if rows:
                break
            time.sleep(0.5)
        assert len(rows) == 1
        a = rows[0]
        assert a.conv_id == "cT" and a.turn_idx == 2
        assert "FATAL disk corruption" in a.text
        assert len(a.before) == 1 and len(a.after) == 0  # partial, as flushed
        # the state was removed on flush: no duplicate emission afterwards
        time.sleep(2)
        assert spark.sql("select * from squiesce").count() == 1
    finally:
        q.stop()


def test_stateful_route_multichunk_group_order(spark):
    """round-4 review: a group's micro-batch spanning multiple Arrow
    chunks must be sorted GLOBALLY before the walk — per-chunk sorting
    processes turns out of order across chunk boundaries. Forced here via
    a 2-row Arrow batch cap and a shuffled input file order."""
    import time
    from logjuicer_spark import model as M
    from logjuicer_spark.streaming import stateful_route
    from logjuicer_spark.schemas import TURNS

    baseline_rows, _, _ = gen.generate_corpus(
        n_baseline_convs=3, n_target_convs=1, turns_per_conv=25, seed=6
    )
    model_df = pipeline.train_model(spark, gen.to_spark_df(spark, baseline_rows))
    bc = M.broadcast_indexes(spark, M.collect_indexes(model_df))

    in_dir = tempfile.mkdtemp(prefix="sstream_mc_")
    ckpt = tempfile.mkdtemp(prefix="sstream_mc_ck_")

    def turn(i, text):
        return {"conv_id": "cM", "turn_idx": i, "role": "tool", "text": text,
                "tool": "bash", "ts": None}

    lines = {
        1: "cache lookup for bucket amber returned 3 entries with hit ratio stable behaviour",
        2: "writing scratch file /tmp/build-9f3a2b1c/output.log with 55 bytes payload done",
        3: "FATAL disk corruption detected on volume omegastream sector unreadable halting",
        4: "configuration reload finished successfully revision abcd1234 applied across 3 workers smoothly",
        5: "scheduler assigned task copper onto node compute-3 with affinity score 9 points",
        6: "cache lookup for bucket maroon returned 9 entries with hit ratio stable behaviour",
    }
    # shuffled write order so chunk boundaries do not coincide with turn order
    order = [5, 2, 6, 3, 1, 4]
    gen.to_spark_df(spark, [turn(i, lines[i]) for i in order]).coalesce(1).write.parquet(
        f"{in_dir}/b1"
    )

    old_cap = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(TURNS).parquet(f"{in_dir}/*")
        q = (
            stateful_route(stream, bc)
            .writeStream.format("memory")
            .queryName("sanoms_mc")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        rows = []
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql("select * from sanoms_mc").collect()
            if rows:
                break
            time.sleep(0.5)
        q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_cap)
    assert len(rows) == 1
    a = rows[0]
    assert a.turn_idx == 3 and "FATAL disk corruption" in a.text
    assert a.before == [lines[1], lines[2]]
    assert a.after == [lines[4], lines[5], lines[6]]
    shutil.rmtree(in_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
