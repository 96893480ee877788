"""Deterministic splits / stratified sampling (functions/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from node_etl_spark.functions.sampling import (
    BUCKETS,
    hash_bucket,
    hash_split,
    stratified_sample,
)
from node_etl_spark.tables import table

SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_hash_bucket_range_and_determinism(spark):
    df = spark.range(1000).select(hash_bucket(F.col("id")).alias("b"))
    stats = df.agg(
        F.min("b").alias("lo"), F.max("b").alias("hi"), F.count("*").alias("n")
    ).first()
    assert 0 <= stats["lo"] and stats["hi"] < BUCKETS
    a = df.collect()
    b = spark.range(1000).select(hash_bucket(F.col("id")).alias("b")).collect()
    assert a == b


def test_hash_split_total_and_rough_proportions(spark):
    df = hash_split(spark.range(10_000), "id", SPLITS)
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 10_000
    assert abs(counts["train"] / 10_000 - 0.8) < 0.02
    assert abs(counts["val"] / 10_000 - 0.1) < 0.02
    assert abs(counts["test"] / 10_000 - 0.1) < 0.02


def test_hash_split_stable_under_append(spark):
    # assignment of an id never changes when the table grows
    small = {r["id"]: r["split"] for r in hash_split(spark.range(100), "id", SPLITS).collect()}
    big = {r["id"]: r["split"] for r in hash_split(spark.range(1000), "id", SPLITS).collect()}
    assert all(big[i] == s for i, s in small.items())


def test_hash_split_bad_weights(spark):
    with pytest.raises(ValueError):
        hash_split(spark.range(10), "id", {"a": 0.5, "b": 0.6})


def test_stratified_sample_exact_counts(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = stratified_sample(docs, ["lang"], 3, "doc_id")
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(3, sizes[lang])
    # membership is deterministic
    ids1 = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, ["lang"], 3, "doc_id").select("doc_id").collect()
    )
    assert ids1 == ids2
