"""Property tests: the JSON payload codec must be lossless for
arbitrary text — commas, quotes, newlines, unicode — the whole class
of inputs that corrupted the reference's unquoted CSV (SURVEY.md
§1.4.1)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_big_data_analytics_spark.sources import kafka

# valid (non-surrogate) unicode, including the CSV/JSON troublemakers
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),
    max_size=80,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_json_codec_roundtrip_arbitrary_text(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id bigint, payload string")
    back = kafka.decode_payload(
        kafka.encode_payload(df, key_col="id"), "id bigint, payload string"
    )
    got = {(r.id, r.payload) for r in back.collect()}
    assert got == set(rows)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            TEXT,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_json_codec_roundtrip_mixed_types(spark, rows):
    data = [(i, n, v, t) for i, (n, v, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "id bigint, n bigint, x double, s string")
    schema = "id bigint, n bigint, x double, s string"
    back = kafka.decode_payload(kafka.encode_payload(df), schema)
    got = sorted(back.collect(), key=lambda r: r.id)
    for r, (i, n, x, s) in zip(got, data):
        assert (r.id, r.n, r.s) == (i, n, s)
        assert r.x == x  # double survives JSON text round trip exactly
