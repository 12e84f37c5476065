"""applyInPandasWithState sessionization: state must carry ACROSS
microbatches (same session continued, new session after the gap)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_sessionize_stream_state_across_batches(spark, tmp_path):
    from osm_cut_spark.streaming.stateful import sessionize_stream

    src = str(tmp_path / "events_in")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # batch 1: user 1 two events 10min apart (1 session); user 2 one event
    _write_events(spark, src, [(1, ts(0)), (1, ts(10)), (2, ts(0))])

    stream = (
        spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r.user_id: (r.n_sessions, r.n_events)
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
        assert first[1] == (1, 2) and first[2] == (1, 1)

        # batch 2: user 1 continues the session (+20 min) THEN opens a new
        # one (+90 min) — continuity across microbatches is the point
        _write_events(spark, src, [(1, ts(30)), (1, ts(120)), (2, ts(5))])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sess_out").collect()
        # memory sink in update mode appends one row per group per batch;
        # the final state is the row with the highest n_events per user
        final = {}
        for r in rows:
            if r.user_id not in final or r.n_events > final[r.user_id][1]:
                final[r.user_id] = (r.n_sessions, r.n_events)
        assert final[1] == (2, 4)  # ts(30) same session; ts(120) new one
        assert final[2] == (1, 2)  # ts(5) continues user 2's session
    finally:
        q.stop()
