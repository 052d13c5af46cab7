"""Normalization fold semantics on crafted strings — each step pinned."""

from __future__ import annotations

from pyspark.sql import functions as F

from amadeus_spark.functions.normalize import normalize_text


def _norm(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(normalize_text(F.col("text")).alias("n")).collect()[0]["n"]


def test_quote_dash_ellipsis_folds(spark):
    assert _norm(spark, "“hi” ‘x’ a—b c–d e…") == '"hi" \'x\' a-b c-d e...'


def test_space_and_invisible_folds(spark):
    assert _norm(spark, "a b​c﻿d") == "a bcd"
    assert _norm(spark, "a \t  b") == "a b"
    assert _norm(spark, "line1  \n\n  line2") == "line1\nline2"


def test_control_strip_keeps_newline(spark):
    assert _norm(spark, "x\x07y\x01z\nw") == "xyz\nw"


def test_idempotent(spark):
    noisy = "“a” —  b…\nc"
    once = _norm(spark, noisy)
    assert _norm(spark, once) == once


def test_mojibake_detection(spark):
    from amadeus_spark.functions.normalize import mojibake_flag

    df = spark.createDataFrame(
        [(1, "clean text"), (2, "cafÃ© bad"), (3, "itâ€™s broken")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["m"]
        for r in df.select(
            "doc_id", mojibake_flag(F.col("text")).alias("m")
        ).collect()
    }
    assert got == {1: False, 2: True, 3: True}
