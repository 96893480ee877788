from node_etl_spark.functions.agreement import cohen_kappa
from pyspark.sql import functions as F


def test_cohen_kappa_hand_computed(spark):
    # classic 2x2: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "la string, lb string")
    r = cohen_kappa(df, "la", "lb").collect()[0]
    # po = 35/50; pe = (25*30 + 25*20) / 2500 = 0.5
    assert r.n_items == 50
    assert r.po == 0.7 and r.pe == 0.5
    assert abs(r.kappa - round((0.7 - 0.5) / 0.5, 6)) < 1e-9


def test_cohen_kappa_excludes_nulls_and_groups(spark):
    df = spark.createDataFrame(
        [("g1", 1, 1), ("g1", 1, None), ("g1", 2, 2), ("g2", 1, 2)],
        "g string, la int, lb int",
    )
    out = {r.g: r for r in
           cohen_kappa(df, "la", "lb", group_cols=("g",)).collect()}
    assert out["g1"].n_items == 2      # null-label row dropped
    assert out["g1"].po == 1.0
    assert out["g2"].po == 0.0
    # g2: raters never use a common label -> pe = 0, kappa = po = 0
    assert out["g2"].pe == 0.0 and out["g2"].kappa == 0.0


def test_cohen_kappa_constant_raters_degenerate(spark):
    df = spark.createDataFrame(
        [("a", "a")] * 4, "la string, lb string"
    )
    r = cohen_kappa(df, "la", "lb").collect()[0]
    assert r.po == 1.0 and r.pe == 1.0 and r.kappa == 0.0
