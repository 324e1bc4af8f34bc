"""ES ML anomaly-detection analog: bucketed detectors + robust
baseline scoring.  Planted-spike recovery, dense zero-fill semantics,
numpy cross-check of the scoring spec, mean detector."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators.anomaly import (
    anomaly_detect,
)

BASE = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def spiky_events(spark):
    """14 days of hourly events, ~6/hour, with hour 100 spiked to 60
    events and hour 200 silent (0 events)."""
    rows = []
    eid = 0
    for h in range(14 * 24):
        n = 6 + (h * 7 + 3) % 3  # 6..8, deterministic
        if h == 100:
            n = 60
        elif h == 200:
            n = 0
        for i in range(n):
            ts = BASE + dt.timedelta(hours=h, minutes=(i * 7) % 60)
            rows.append((eid, ts, "click", float(i)))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).cache()


def test_spike_is_top_anomaly(spiky_events):
    got = anomaly_detect(spiky_events, detector="count",
                         bucket_span_s=3600).toPandas()
    top = got.iloc[0]
    spike_epoch = int((BASE + dt.timedelta(hours=100)
                       - dt.datetime(1970, 1, 1)).total_seconds())
    assert int(top.bucket_start) == spike_epoch
    assert top.metric_r6 == 60.0
    assert top.record_score_r6 > 99.9


def test_silent_bucket_zero_filled_and_anomalous(spiky_events):
    got = anomaly_detect(spiky_events, detector="count",
                         bucket_span_s=3600).toPandas()
    silent_epoch = int((BASE + dt.timedelta(hours=200)
                        - dt.datetime(1970, 1, 1)).total_seconds())
    row = got[got.bucket_start == silent_epoch]
    assert len(row) == 1, "empty bucket must be dense-filled"
    assert row.metric_r6.iloc[0] == 0.0
    # 0 vs typical ~7 is a strong anomaly
    assert row.record_score_r6.iloc[0] > 99.0
    # total buckets = full hourly range
    assert len(got) == 14 * 24


def test_scores_match_numpy_spec(spiky_events):
    got = (anomaly_detect(spiky_events, detector="count",
                          bucket_span_s=3600)
           .toPandas().sort_values("bucket_start")
           .reset_index(drop=True))
    x = got.metric_r6.to_numpy(dtype=float)
    med = np.median(x)
    mad = np.median(np.abs(x - med))
    z = np.abs(x - med) / (1.4826 * mad + 1e-9)
    want = 100.0 * (1.0 - np.exp(-(z * z) / 2.0))
    np.testing.assert_allclose(
        got.record_score_r6.to_numpy(), want, atol=2e-6
    )
    assert (got.typical_r6 == med).all()


def test_mean_detector_with_by_field(spark):
    rows = []
    for h in range(48):
        for et in ("a", "b"):
            v = 10.0 if et == "a" else 50.0
            if et == "b" and h == 30:
                v = 500.0  # spike only in series b
            rows.append((h, BASE + dt.timedelta(hours=h), et, v))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = anomaly_detect(df, detector="mean", field="value",
                         by_field="event_type",
                         bucket_span_s=3600).toPandas()
    top = got.iloc[0]
    assert top.event_type == "b"
    assert top.metric_r6 == 500.0
    # series a is perfectly flat -> all scores ~0
    a = got[got.event_type == "a"]
    assert (a.record_score_r6 < 1e-6).all()


def test_min_score_threshold(spiky_events):
    got = anomaly_detect(spiky_events, detector="count",
                         bucket_span_s=3600, min_score=75.0).toPandas()
    assert (got.record_score_r6 >= 75.0).all()
    assert len(got) >= 2  # the spike and the silence at least


def test_bad_args(spiky_events):
    with pytest.raises(ValueError):
        anomaly_detect(spiky_events, detector="median")
    with pytest.raises(ValueError):
        anomaly_detect(spiky_events, detector="sum")
