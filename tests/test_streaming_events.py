"""Event-stream analytics: windowed aggregation (batch==stream),
sessionization, and watermark late-data semantics with engineered
late arrivals across micro-batches."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from org_rdkit_lucene_spark.streaming.events import (
    EVENTS_SCHEMA,
    sessionize,
    stream_windowed_event_counts,
    windowed_event_counts,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, minutes, user, etype, value):
    return (eid, T0 + dt.timedelta(minutes=minutes), user, etype, float(value), "{}")


@pytest.fixture(scope="module")
def events_pdf():
    rows = [
        _ev(0, 1, 1, "click", 1.0),
        _ev(1, 5, 1, "view", 2.0),
        _ev(2, 61, 1, "click", 4.0),    # next hour window
        _ev(3, 10, 2, "click", 8.0),
        _ev(4, 50, 2, "view", 16.0),    # 40min gap -> new session for user 2
        _ev(5, 62, 2, "click", 32.0),
        _ev(6, 200, 1, "view", 64.0),   # far-future event
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    # micro-second timestamps: Spark's parquet reader rejects TIMESTAMP(NANOS)
    return pdf.astype({"ts": "datetime64[us]"})


def test_windowed_counts_batch(spark, events_pdf):
    ev = spark.createDataFrame(events_pdf, schema=EVENTS_SCHEMA)
    out = windowed_event_counts(ev, "1 hour").toPandas()
    h0_click = out[(out.window_start == T0) & (out.event_type == "click")].iloc[0]
    assert h0_click.n_events == 2 and h0_click.sum_value_q == 900  # 1.0 + 8.0
    h1 = out[out.window_start == T0 + dt.timedelta(hours=1)]
    assert h1.n_events.sum() == 2  # minutes 61, 62; minute 50 is hour-0
    assert len(out[out.window_start == T0 + dt.timedelta(hours=3)]) == 1


def test_stream_equals_batch(spark, events_pdf, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    events_pdf.to_parquet(src / "a.parquet", index=False)
    got = (
        stream_windowed_event_counts(spark, str(src), "1 hour", query_name="evt_b")
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    ev = spark.createDataFrame(events_pdf, schema=EVENTS_SCHEMA)
    want = (
        windowed_event_counts(ev, "1 hour")
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_sessionize_gap_semantics(spark, events_pdf):
    ev = spark.createDataFrame(events_pdf, schema=EVENTS_SCHEMA)
    out = sessionize(ev, "30 minutes").toPandas().sort_values(
        ["user_id", "session_start"]
    )
    u1 = out[out.user_id == 1]
    u2 = out[out.user_id == 2]
    # user 1: (1,5) | (61) | (200) — gaps 56 and 139 min break sessions
    assert len(u1) == 3
    assert list(u1.n_events) == [2, 1, 1]
    assert u1.iloc[0].sum_value_q == 300
    # user 2: (10) | (50, 62) — 40min gap breaks; 12min does not
    assert len(u2) == 2
    assert list(u2.n_events) == [1, 2]
    assert u2.iloc[1].sum_value_q == 4800


def test_watermark_drops_late_events(spark, events_pdf, tmp_path):
    """Append mode + watermark: an event older than the advanced
    watermark is DROPPED. Spark filters late events with the PREVIOUS
    batch's watermark (eviction uses the current one — SPARK-40925
    two-watermark semantics), so the drop is observable from the second
    batch after the watermark advanced: file1 advances event time,
    file2 commits that watermark, file3 carries the too-late row."""
    import os as _os
    import time as _time

    src = tmp_path / "late"
    src.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    now = _time.time()
    events_pdf.to_parquet(src / "b1.parquet", index=False)  # wm → 200min-10min
    _os.utime(src / "b1.parquet", (now - 240, now - 240))
    benign = pd.DataFrame(
        [_ev(8, 201, 2, "view", 1.0)], columns=cols
    ).astype({"ts": "datetime64[us]"})
    benign.to_parquet(src / "b2.parquet", index=False)
    _os.utime(src / "b2.parquet", (now - 120, now - 120))
    late = pd.DataFrame(
        [_ev(7, 2, 1, "late", 99.0)],  # hour-0, far behind the watermark
        columns=cols,
    ).astype({"ts": "datetime64[us]"})
    late.to_parquet(src / "b3.parquet", index=False)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
    )
    agg = windowed_event_counts(stream, "1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("evt_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("evt_late").toPandas()
    # the late 'late' event must not appear anywhere
    assert "late" not in set(out.event_type)
    # finalized windows (hour 0, hour 1) were emitted by the advancing watermark
    assert (out.window_start == T0).any()


def test_stream_dedup_removes_redelivered_events(spark, tmp_path):
    """Engineered at-least-once redelivery (x3): the stateful streaming
    dedup must recover exactly the original event set."""
    import pandas as pd

    from org_rdkit_lucene_spark.streaming.events import stream_dedup_events

    pdf = pd.DataFrame({
        "event_id": range(40),
        "ts": pd.date_range("2024-01-01", periods=40, freq="min").astype("datetime64[us]"),
        "user_id": [i % 5 for i in range(40)],
        "event_type": ["click" if i % 2 else "view" for i in range(40)],
        "value": [round(i * 0.25, 2) for i in range(40)],
        "props": ["{}"] * 40,
    })
    src = tmp_path / "ev"
    src.mkdir()
    pdf.to_parquet(src / "events.parquet", index=False)
    out = stream_dedup_events(
        spark, str(src / "events.parquet"), query_name="evd_test", dup_factor=3
    ).toPandas().sort_values("event_id").reset_index(drop=True)
    assert len(out) == 40
    assert out["event_id"].tolist() == list(range(40))
    assert out["value_q"].tolist() == [int(i * 25) for i in range(40)]


def test_running_totals_stateful_across_batches(spark, tmp_path):
    """applyInPandasWithState: state must survive micro-batch
    boundaries — a user spanning 3 batches emits 3 monotone rows and
    the final one equals the plain groupBy."""
    import pandas as pd

    from org_rdkit_lucene_spark.streaming.events import stream_running_user_totals

    src = tmp_path / "ev"
    src.mkdir()
    for b in range(3):
        pdf = pd.DataFrame({
            "event_id": range(b * 20, b * 20 + 20),
            "ts": pd.date_range(f"2024-01-0{b + 1}", periods=20, freq="min").astype("datetime64[us]"),
            "user_id": [i % 4 for i in range(20)],
            "event_type": ["view"] * 20,
            "value": [1.5] * 20,
            "props": ["{}"] * 20,
        })
        pdf.to_parquet(src / f"b{b}.parquet", index=False)

    out = stream_running_user_totals(
        spark, str(src), query_name="evr_test", max_files_per_trigger=1
    ).toPandas()
    u0 = out[out.user_id == 0].sort_values("emit_seq")
    assert u0["emit_seq"].tolist() == [1, 2, 3]  # one emission per batch
    assert u0["n_events"].tolist() == [5, 10, 15]  # cumulative, monotone
    assert u0["sum_value_q"].tolist() == [750, 1500, 2250]
    final = (
        out.sort_values("emit_seq").groupby("user_id").last().reset_index()
    )
    assert final["n_events"].tolist() == [15, 15, 15, 15]


def test_stream_attribution_join_equals_batch(spark):
    """The watermarked stream-stream interval join on a bounded input
    must equal the batch interval join exactly (pair set + exact
    microsecond deltas), and every delta must be within the horizon."""
    from org_rdkit_lucene_spark.streaming.events import (
        attribution_join,
        stream_attribution_join,
    )

    events_file = "/root/testdata/sf0.001/events.parquet"
    batch_events = spark.read.parquet(events_file)
    want = (
        attribution_join(batch_events, horizon="1 hour")
        .toPandas()
        .sort_values(["signup_id", "purchase_id"])
        .reset_index(drop=True)
    )
    got = (
        stream_attribution_join(spark, events_file, horizon="1 hour",
                                query_name="ev_attrib_t")
        .toPandas()
        .sort_values(["signup_id", "purchase_id"])
        .reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)
    assert (want["delta_us"] >= 0).all()
    assert (want["delta_us"] <= 3_600_000_000).all()
