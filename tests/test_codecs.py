"""Codec round-trip laws — mirror of the reference MeteorCodecSuite.scala:16-40
(decode(encode(a)) == a for String/Int/Long/Boolean/UUID/Instant/Unit/Option),
plus the column-expression forms against the scalar forms."""

from __future__ import annotations

import uuid
from datetime import datetime, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup import codecs as C


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_string_roundtrip(s):
    assert C.string_codec.decode(C.string_codec.encode(s)) == s


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_long_roundtrip(v):
    assert C.long_codec.decode(C.long_codec.encode(v)) == v


@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
@settings(max_examples=100, deadline=None)
def test_int_roundtrip(v):
    assert C.int_codec.decode(C.int_codec.encode(v)) == v


@given(st.booleans())
@settings(max_examples=10, deadline=None)
def test_bool_roundtrip(v):
    assert C.bool_codec.decode(C.bool_codec.encode(v)) == v


@given(st.floats(allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_double_roundtrip(v):
    assert C.double_codec.decode(C.double_codec.encode(v)) == v


@given(st.uuids())
@settings(max_examples=100, deadline=None)
def test_uuid_roundtrip(v):
    assert C.uuid_codec.decode(C.uuid_codec.encode(v)) == v


@given(st.datetimes(
    min_value=datetime(1971, 1, 1), max_value=datetime(2200, 1, 1),
    timezones=st.just(timezone.utc),
))
@settings(max_examples=100, deadline=None)
def test_instant_roundtrip(v):
    assert C.instant_codec.decode(C.instant_codec.encode(v)) == v


def test_unit_encodes_as_nul():
    assert C.unit_codec.encode(None) == "unit:\x00"
    assert C.unit_codec.decode("unit:\x00") is None


@given(st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)))
@settings(max_examples=100, deadline=None)
def test_option_roundtrip(v):
    oc = C.option(C.long_codec)
    assert oc.decode(oc.encode(v)) == v


def test_wrong_codec_rejected():
    enc = C.long_codec.encode(7)
    with pytest.raises(C.CodecError):
        C.string_codec.decode(enc)
    with pytest.raises(C.CodecError):
        C.string_codec.decode("untagged payload")


def test_column_forms_match_scalar_forms(spark):
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    u = uuid.uuid4()
    ts = datetime(2024, 5, 6, 7, 8, 9, 123456, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [("abc", 42, True, 2.5, str(u), ts)],
        "s string, l long, b boolean, d double, u string, t timestamp",
    )
    row = df.select(
        C.string_codec.encode_col(F.col("s")).alias("es"),
        C.long_codec.encode_col(F.col("l")).alias("el"),
        C.bool_codec.encode_col(F.col("b")).alias("eb"),
        C.uuid_codec.encode_col(F.col("u")).alias("eu"),
        C.instant_codec.encode_col(F.col("t")).alias("et"),
    ).collect()[0]
    assert row["es"] == C.string_codec.encode("abc")
    assert row["el"] == C.long_codec.encode(42)
    assert row["eb"] == C.bool_codec.encode(True)
    assert row["eu"] == C.uuid_codec.encode(u)
    assert C.instant_codec.decode(row["et"]) == ts

    back = df.select(
        C.long_codec.decode_col(
            C.long_codec.encode_col(F.col("l"))
        ).alias("l2"),
        C.instant_codec.decode_col(
            C.instant_codec.encode_col(F.col("t"))
        ).alias("t2"),
    ).collect()[0]
    assert back["l2"] == 42
    assert back["t2"].replace(tzinfo=timezone.utc) == ts
