"""Property tests for the pure-python Avro container codec (no Spark —
the byte-level encode/decode itself, the part Spark plumbing rides on).
Hypothesis drives the full supported type surface through round-trips:
64-bit integer extremes (zigzag varints), unicode strings (length-
prefixed UTF-8), NaN/inf doubles (IEEE bit patterns), arbitrary bytes,
null/None unions, and both codecs."""

from __future__ import annotations

import io
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from census_asc5_data_pipeline_spark.sources.avro_io import (
    _field_plan,
    _read_container,
    _read_header,
    _read_long,
    _write_container,
    _write_long,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "i", "type": ["null", "int"]},
        {"name": "d", "type": ["null", "double"]},
        {"name": "s", "type": ["null", "string"]},
        {"name": "b", "type": ["null", "boolean"]},
        {"name": "raw", "type": ["null", "bytes"]},
    ],
}

ROW = st.tuples(
    I64,
    st.none() | st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.none() | st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.none() | st.text(max_size=80),
    st.none() | st.booleans(),
    st.none() | st.binary(max_size=64),
)


@given(I64)
def test_zigzag_varint_roundtrip(n):
    buf = bytearray()
    _write_long(buf, n)
    got, pos = _read_long(bytes(buf), 0)
    assert got == n and pos == len(buf)


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b


@settings(max_examples=60, deadline=None)
@given(st.lists(ROW, max_size=25), st.sampled_from(["null", "deflate"]))
def test_container_roundtrip(rows, codec):
    import os
    import tempfile
    import uuid

    d = tempfile.mkdtemp(prefix="avro_prop_")
    path = os.path.join(d, f"{uuid.uuid4().hex}.avro")
    with open(path, "wb") as fh:
        n = _write_container(fh, SCHEMA, [rows], codec)
    assert n == len(rows)
    schema, got = _read_container(path)
    assert _field_plan(schema) == _field_plan(SCHEMA)
    assert len(got) == len(rows)
    for want_row, got_row in zip(rows, got):
        for w, g in zip(want_row, got_row):
            assert _eq(w, g), (want_row, got_row)


def test_header_parse_and_magic(tmp_path):
    import os

    path = os.path.join(str(tmp_path), "x.avro")
    with open(path, "wb") as fh:
        _write_container(fh, SCHEMA, [[(1, None, None, "x", True, b"")]], "null")
    with open(path, "rb") as fh:
        schema, codec, sync = _read_header(fh)
    assert codec == "null" and len(sync) == 16
    assert [f["name"] for f in schema["fields"]] == ["k", "i", "d", "s", "b", "raw"]
    # a corrupted magic must be rejected loudly
    import pytest

    blob = open(path, "rb").read()
    bad = os.path.join(str(tmp_path), "bad.avro")
    open(bad, "wb").write(b"XXXX" + blob[4:])
    with pytest.raises(ValueError, match="not an Avro"):
        with open(bad, "rb") as fh:
            _read_header(fh)
