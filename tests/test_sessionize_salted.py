"""Salted two-phase sessionize: value parity with the single-phase operator
and the SQL window-function oracle on a corpus with one hot user."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def hot_dir(tmp_path_factory):
    """Events table where user 7 owns ~80% of events, with inter-event gaps
    straddling both the 30-min session gap and the 6-hour phase-1 window
    boundary (sessions that span windows MUST merge in phase 2)."""
    rng = np.random.RandomState(5)
    rows = []
    eid = 0
    base = np.datetime64("2025-03-01T00:00:00", "us")
    # hot user: long timeline, gaps drawn to cross window boundaries
    t = base
    for _ in range(4000):
        step_min = int(rng.choice([1, 5, 20, 45, 90, 60 * 7], p=[0.35, 0.25, 0.2, 0.1, 0.05, 0.05]))
        t = t + np.timedelta64(step_min * 60, "s")
        rows.append((7, eid, t))
        eid += 1
    # cold users
    for u in range(20, 60):
        t = base + np.timedelta64(int(rng.randint(0, 10**6)), "s")
        for _ in range(25):
            t = t + np.timedelta64(int(rng.choice([2, 10, 40, 70])) * 60, "s")
            rows.append((u, eid, t))
            eid += 1
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    d = tmp_path_factory.mktemp("hotevents")
    df.to_parquet(d / "events.parquet", index=False)
    return str(d)


def test_salted_matches_single_phase(ray_session, hot_dir):
    from nlp_series_relation_extraction_ray.pipelines.relational import (
        events_sessionize,
        events_sessionize_salted,
    )

    a = (
        events_sessionize(hot_dir)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    b = (
        events_sessionize_salted(hot_dir)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        a.astype("int64"), b[a.columns].astype("int64")
    )


def test_salted_matches_sql_oracle(ray_session, hot_dir):
    import duckdb

    from nlp_series_relation_extraction_ray.pipelines.relational import (
        SESSIONIZE_SQL,
        events_sessionize_salted,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{hot_dir}/events.parquet')"
    )
    want = con.execute(SESSIONIZE_SQL).df().sort_values(
        "user_id").reset_index(drop=True)
    got = (
        events_sessionize_salted(hot_dir)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns].astype("int64"), want.astype("int64")
    )
