import math

from node_etl_spark.functions.linkage import FSField, fs_link_pairs


FIELDS = [
    FSField("f1", "f1", "f1", 0.95),
    FSField("f2", "f2", "f2", 0.9),
]


def test_fs_weights_hand_computed(spark):
    # 4 records in one block: ids 1,2 agree on both fields; 3 agrees
    # with them on f1 only; 4 agrees on nothing
    df = spark.createDataFrame(
        [(1, "a", "x", 0), (2, "a", "x", 0), (3, "a", "y", 0),
         (4, "b", "z", 0)],
        "rid2 bigint, f1 string, f2 string, blk int",
    )
    out = {(r.id1, r.id2): r for r in fs_link_pairs(
        df, FIELDS, ("blk",), "rid2", lower=-100.0, upper=4.0
    ).collect()}
    # u1 = (3^2 + 1) / 16 = 0.625 ; u2 = (4 + 1 + 1) / 16 = 0.375
    wa1, wd1 = math.log(0.95 / 0.625), math.log(0.05 / 0.375)
    wa2, wd2 = math.log(0.9 / 0.375), math.log(0.1 / 0.625)
    assert abs(out[(1, 2)].weight - round(wa1 + wa2, 6)) < 1e-9
    assert abs(out[(1, 3)].weight - round(wa1 + wd2, 6)) < 1e-9
    assert abs(out[(3, 4)].weight - round(wd1 + wd2, 6)) < 1e-9
    assert out[(1, 2)].decision == "possible"  # 1.29 < upper=4
    assert len(out) == 6  # all within-block pairs emitted at lower=-100


def test_fs_blocking_and_threshold(spark):
    # identical fields across different blocks must never pair; the
    # lower threshold drops the non-match mass
    df = spark.createDataFrame(
        [(1, "a", "x", 0), (2, "a", "x", 1), (3, "q", "r", 0)],
        "rid2 bigint, f1 string, f2 string, blk int",
    )
    rows = fs_link_pairs(df, FIELDS, ("blk",), "rid2", lower=0.0).collect()
    # (1,2) cross-block: absent; (1,3) disagrees on all: below lower
    assert rows == []
