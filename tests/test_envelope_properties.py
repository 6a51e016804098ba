"""Property-based tests (hypothesis) for the envelope codec: arbitrary
content must survive typed-row -> envelope -> JSON wire -> envelope ->
typed-row, including unicode, quotes, newlines, and NULLs -- the inputs
that break hand-rolled codecs (the reference's consumer silently drops
malformed and mismatched payloads)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from change_data_capture_service_spark.streaming import envelope as env

# printable-ish unicode incl. quotes/backslashes/newlines; no surrogates
text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=40,
)
row_strategy = st.tuples(
    st.integers(min_value=0, max_value=2**40),
    st.one_of(st.none(), text_strategy),
    st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31 - 1)),
)


@settings(max_examples=20, deadline=None)
@given(rows=st.lists(row_strategy, min_size=1, max_size=8, unique_by=lambda r: r[0]))
def test_envelope_wire_roundtrip_arbitrary_content(spark_global, rows):
    spark = spark_global
    df = spark.createDataFrame(rows, "id long, name string, score int")
    enc = env.encode(
        df,
        op="insert",
        schema_name="public",
        table_name="t",
        pk_cols=["id"],
        lsn=F.col("id"),
        ts=F.lit("2024-01-01 00:00:00").cast("timestamp"),
    )
    back = env.from_json_value(env.to_json_value(enc))
    dec = env.decode_payload(back, df.schema)
    got = {(r["id"], r["name"], r["score"]) for r in dec.collect()}
    want = {(i, n, s) for i, n, s in rows}
    assert got == want


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
