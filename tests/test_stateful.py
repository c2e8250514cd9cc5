"""Custom stateful streaming sessionization vs the batch lag/gap oracle.

Events arrive in TWO micro-batches (maxFilesPerTrigger=1); sessions that
span the batch boundary must merge through the state store. After the
bounded run, emitted (closed) sessions must equal the batch definition
minus each user's final (still-open) session.
"""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pycuda_raster_spark.streaming.stateful import sessionize_stateful

EVENTS_DDL = "event_id long, ts timestamp, user_id long, value double"


def _batch_sessions(spark, df, gap_minutes=30):
    df.createOrReplaceTempView("ev_all")
    return spark.sql(f"""
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events
        FROM (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id)
                                 > INTERVAL {gap_minutes} MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM ev_all
            ) g
        ) s GROUP BY user_id, sid
    """)


def test_stateful_sessionize_across_microbatches(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def ev(u, minutes):
        nonlocal eid
        rows.append((eid, base + dt.timedelta(minutes=minutes), u, 1.0))
        eid += 1

    # user 1: session A (0, 10, 20), session B (120, 125), session C (300)
    for m in (0, 10, 20, 120, 125, 300):
        ev(1, m)
    # user 2: one long session spanning the batch split (55, 70, 85)
    for m in (55, 70, 85):
        ev(2, m)
    # user 3: single event (open session, never emitted)
    ev(3, 40)

    df = spark.createDataFrame(rows, EVENTS_DDL)
    src = str(tmp_path / "ev")
    # two files split MID-SESSION for users 1 and 2
    df.filter(F.col("event_id") < 5).coalesce(1).write.mode("append").parquet(src)
    df.filter(F.col("event_id") >= 5).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(T._parse_datatype_string(EVENTS_DDL))
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stateful(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("sessions_out").collect()
    }

    batch = _batch_sessions(spark, df).collect()
    # drop each user's final session (still open in the state store)
    last_start = {}
    for r in batch:
        if r.user_id not in last_start or r.session_start > last_start[r.user_id]:
            last_start[r.user_id] = r.session_start
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch
        if r.session_start != last_start[r.user_id]
    }
    assert want, "test must exercise closed sessions"
    assert got == want
    # the cross-batch session of user 2 must NOT appear (it merged and
    # stayed open) — i.e. no session for user 2 was closed
    assert not any(u == 2 for u, *_ in got)
