

def test_decayed_trending_hand_weights(spark):
    from datetime import datetime

    from node_etl_spark.functions.profile import decayed_trending

    # newest day weighs 1, one day old 1/2, two days old 1/4
    rows = [
        ("a", datetime(2024, 1, 3, 10), 8.0),   # w=1
        ("a", datetime(2024, 1, 2, 9), 8.0),    # w=.5
        ("b", datetime(2024, 1, 1, 23), 4.0),   # w=.25
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = {r.event_type: r for r in decayed_trending(df).collect()}
    assert out["a"].n_events == 2
    assert abs(out["a"].decayed_count - 1.5) < 1e-9
    assert abs(out["a"].decayed_value - 12.0) < 1e-9
    assert abs(out["b"].decayed_count - 0.25) < 1e-9
    assert abs(out["b"].decayed_value - 1.0) < 1e-9


def test_decayed_trending_clamps_ancient_events(spark):
    from datetime import datetime

    from node_etl_spark.functions.profile import decayed_trending

    rows = [
        ("a", datetime(2024, 1, 1), 1.0),
        ("a", datetime(1824, 1, 1), 1e6),  # ~73k days old: weight 0
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    (r,) = decayed_trending(df).collect()
    # the ancient event contributes 2^-62 ~ 2e-19, below the decimal
    # grid -> exactly the fresh event's weight survives
    assert r.n_events == 2
    assert abs(r.decayed_count - 1.0) < 1e-11
