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


def test_events_attribution_asof_semantics(ray_session, tmp_path):
    """Hand-built stream pinning the as-of contract: latest prior view
    wins, view-less purchases drop, same-ts ordering breaks by event_id."""
    from nlp_series_relation_extraction_ray.pipelines.relational import (
        events_attribution,
    )

    t0 = np.datetime64("2025-06-01T00:00:00", "us")
    m = np.timedelta64(60, "s")
    rows = [
        # user 1: view(0) .. view(1) .. purchase(2) -> attributes to 1
        (1, 0, t0 + 0 * m, "view"),
        (1, 1, t0 + 5 * m, "view"),
        (1, 2, t0 + 9 * m, "purchase"),
        # user 1: purchase(3) after -> still latest view is 1
        (1, 3, t0 + 30 * m, "purchase"),
        # user 2: purchase(4) with NO prior view -> dropped;
        # view(5) AFTER it must not attribute backwards
        (2, 4, t0 + 2 * m, "purchase"),
        (2, 5, t0 + 4 * m, "view"),
        (2, 6, t0 + 6 * m, "purchase"),  # -> 5
        # user 3: view(7) at the SAME ts as purchase(8): event_id order
        # makes the view count as prior
        (3, 7, t0 + 10 * m, "view"),
        (3, 8, t0 + 10 * m, "purchase"),
        # noise types are ignored
        (1, 9, t0 + 8 * m, "click"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "event_type"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df["value"] = 1.0
    df.to_parquet(tmp_path / "events.parquet", index=False)

    got = events_attribution(str(tmp_path)).to_pandas().sort_values(
        "event_id"
    ).reset_index(drop=True)
    want = pd.DataFrame(
        {
            "event_id": [2, 3, 6, 8],
            "user_id": [1, 1, 2, 3],
            "view_event_id": [1, 1, 5, 7],
            "lag_ms": [4 * 60_000, 25 * 60_000, 2 * 60_000, 0],
        }
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_events_window_counts_semantics(ray_session, tmp_path):
    """Hand-built stream pinning tumbling-window boundaries: events on an
    exact hour boundary open the NEXT window; cents are fixed-point."""
    from nlp_series_relation_extraction_ray.pipelines.relational import (
        events_window_counts,
    )

    t0 = np.datetime64("2025-06-01T10:00:00", "us")
    m = np.timedelta64(60, "s")
    rows = [
        ("view", t0 + 0 * m, 1.005),     # 10:00 window (boundary row)
        ("view", t0 + 59 * m, 2.0),      # 10:00 window (last minute)
        ("view", t0 + 60 * m, 3.0),      # 10:59:59.999.. -> no: 11:00 window
        ("click", t0 + 5 * m, 0.994),    # 10:00 window, other type
    ]
    df = pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet", index=False)

    got = (
        events_window_counts(str(tmp_path))
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "event_type": ["click", "view", "view"],
            "window_start": pd.to_datetime(
                ["2025-06-01 10:00", "2025-06-01 10:00", "2025-06-01 11:00"]
            ),
            "n_events": [1, 2, 1],
            # cents() is double arithmetic bit-for-bit with the DuckDB
            # oracle: 1.005 stores as 1.00499...  so floor(100.4999..+0.5)
            # = 100 (not decimal round-half-up); floor(0.994*100+0.5)=99
            "value_cents": [99, 100 + 200, 300],
        }
    )
    got["window_start"] = got["window_start"].astype("datetime64[ns]")
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_custs_no_urgent_order_semantics(ray_session, tmp_path):
    """Anti-join contract: a single urgent order anywhere excludes the
    customer; every customer present in orders otherwise appears with its
    full order count."""
    from nlp_series_relation_extraction_ray.pipelines.relational import (
        custs_no_urgent_order,
    )

    rows = [
        (1, "5-LOW"), (1, "3-MEDIUM"),               # kept, n_orders=2
        (2, "5-LOW"), (2, "1-URGENT"), (2, "2-HIGH"),  # excluded
        (3, "1-URGENT"),                             # excluded
        (4, "4-NOT SPECIFIED"),                      # kept, n_orders=1
    ]
    df = pd.DataFrame(rows, columns=["o_custkey", "o_orderpriority"])
    df.to_parquet(tmp_path / "orders.parquet", index=False)

    got = (
        custs_no_urgent_order(str(tmp_path))
        .to_pandas()
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )
    want = pd.DataFrame({"o_custkey": [1, 4], "n_orders": [2, 1]})
    pd.testing.assert_frame_equal(got[want.columns].astype("int64"), want)


def test_events_hopping_counts_semantics(ray_session, tmp_path):
    """Every event contributes to EXACTLY 4 overlapping 1-hour windows at
    15-min hops, and each window's count equals the events inside
    [start, start+1h)."""
    from nlp_series_relation_extraction_ray.pipelines.relational import (
        events_hopping_counts,
    )

    t0 = np.datetime64("2025-06-01T10:07:00", "us")
    rows = [
        ("view", t0),                                   # 10:07
        ("view", t0 + np.timedelta64(10, "m")),         # 10:17
    ]
    df = pd.DataFrame(rows, columns=["event_type", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet", index=False)

    got = (
        events_hopping_counts(str(tmp_path))
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # each event in exactly 4 windows -> total count mass 8
    assert int(got["n_events"].sum()) == 8
    # 10:07 -> windows 09:15..10:00; 10:17 -> 09:30..10:15
    want = {
        "2025-06-01 09:15": 1,
        "2025-06-01 09:30": 2,
        "2025-06-01 09:45": 2,
        "2025-06-01 10:00": 2,
        "2025-06-01 10:15": 1,
    }
    got_map = {
        str(pd.Timestamp(w))[:16]: int(n)
        for w, n in zip(got["window_start"], got["n_events"])
    }
    assert got_map == {k[:16]: v for k, v in want.items()}


def test_q5_same_nation_join_semantics(ray_session, tmp_path):
    """Q5 contract: revenue counts ONLY when customer and supplier share a
    nation inside the region, and only date-window orders qualify."""
    from nlp_series_relation_extraction_ray.pipelines.relational import (
        q5_local_supplier_revenue,
    )

    pd.DataFrame(
        {"r_regionkey": [0, 1], "r_name": ["ASIA", "EUROPE"]}
    ).to_parquet(tmp_path / "region.parquet", index=False)
    pd.DataFrame(
        {
            "n_nationkey": [10, 11, 20],
            "n_name": ["CHINA", "JAPAN", "FRANCE"],
            "n_regionkey": [0, 0, 1],
        }
    ).to_parquet(tmp_path / "nation.parquet", index=False)
    pd.DataFrame(
        {"s_suppkey": [1, 2, 3], "s_nationkey": [10, 11, 20]}
    ).to_parquet(tmp_path / "supplier.parquet", index=False)
    pd.DataFrame(
        {"c_custkey": [100, 101, 102], "c_nationkey": [10, 11, 20]}
    ).to_parquet(tmp_path / "customer.parquet", index=False)
    pd.DataFrame(
        {
            "o_orderkey": [1000, 1001, 1002],
            "o_custkey": [100, 100, 101],
            "o_orderdate": pd.to_datetime(
                ["1996-06-01", "1995-06-01", "1996-06-01"]  # 1001 out of window
            ),
        }
    ).to_parquet(tmp_path / "orders.parquet", index=False)
    pd.DataFrame(
        {
            # order 1000 (cust CHINA): supp1=CHINA counts, supp2=JAPAN
            # mismatched nation, supp3=FRANCE outside region;
            # order 1001 in-window=False; order 1002 (cust JAPAN): supp2 counts
            "l_orderkey": [1000, 1000, 1000, 1001, 1002],
            "l_suppkey": [1, 2, 3, 1, 2],
            "l_extendedprice": [10.0, 20.0, 30.0, 40.0, 5.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0, 0.2],
        }
    ).to_parquet(tmp_path / "lineitem.parquet", index=False)

    got = (
        q5_local_supplier_revenue(str(tmp_path))
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "n_name": ["CHINA", "JAPAN"],
            "revenue_cents": [1000, 400],  # 10.00 ; 5.0*0.8=4.00
        }
    )
    got["revenue_cents"] = got["revenue_cents"].astype("int64")
    pd.testing.assert_frame_equal(got[want.columns], want)
