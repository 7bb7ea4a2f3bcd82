"""Property fuzzing for the session-5 interchange formats: arbitrary
tables roundtrip through Avro (both decode paths agreeing) and Delta
(append sequences equal to concat).  No Ray needed — the codec cores are
pure functions."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from monocator_ray.sources.avro import (
    _decode_block_sequential,
    _decode_block_vectorized,
    _encode_block,
    _write_ocf,
    parse_avro_file,
)

# scalar value strategies per supported Avro type
_INT64 = st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1))
_STR = st.one_of(st.none(), st.text(max_size=40))
_BIN = st.one_of(st.none(), st.binary(max_size=40))
_DBL = st.one_of(st.none(), st.floats(allow_nan=False, width=64))
_BOOL = st.one_of(st.none(), st.booleans())
_TS = st.one_of(st.none(), st.integers(-(2**50), 2**50))


@st.composite
def avro_tables(draw):
    n = draw(st.integers(min_value=0, max_value=30))
    cols = {}
    if draw(st.booleans()):
        cols["i"] = pa.array(draw(st.lists(_INT64, min_size=n, max_size=n)),
                             pa.int64())
    if draw(st.booleans()):
        cols["s"] = pa.array(draw(st.lists(_STR, min_size=n, max_size=n)),
                             pa.string())
    if draw(st.booleans()):
        cols["b"] = pa.array(draw(st.lists(_BIN, min_size=n, max_size=n)),
                             pa.binary())
    if draw(st.booleans()):
        cols["d"] = pa.array(draw(st.lists(_DBL, min_size=n, max_size=n)),
                             pa.float64())
    if draw(st.booleans()):
        cols["o"] = pa.array(draw(st.lists(_BOOL, min_size=n, max_size=n)),
                             pa.bool_())
    if not cols:  # at least one column
        cols["ts"] = pa.array(draw(st.lists(_TS, min_size=n, max_size=n)),
                              pa.timestamp("us"))
    return pa.table(cols)


@settings(max_examples=120, deadline=None)
@given(avro_tables(), st.sampled_from(["null", "deflate"]))
def test_avro_roundtrip_property(t, codec):
    body, starts, schema = _encode_block(t)
    data = _write_ocf(body, t.num_rows, schema, codec, starts)
    assert parse_avro_file(data).equals(t)
    data_noidx = _write_ocf(body, t.num_rows, schema, codec, None)
    assert parse_avro_file(data_noidx).equals(t)


@settings(max_examples=120, deadline=None)
@given(avro_tables())
def test_avro_vectorized_equals_sequential_property(t):
    if t.num_rows == 0:
        return
    body, starts, schema = _encode_block(t)
    vec = _decode_block_vectorized(
        np.frombuffer(body, np.uint8), starts, schema)
    seq = _decode_block_sequential(body, t.num_rows, schema)
    assert vec.cast(seq.schema).equals(seq)


@settings(max_examples=80, deadline=None)
@given(avro_tables(), st.data())
def test_avro_truncation_never_silently_wrong(t, data):
    """Truncating a file strictly inside its data region either raises or
    (never) returns a full parse — a truncated stream must not yield a
    silently-short or corrupt table with the original row count."""
    if t.num_rows == 0:
        return
    body, starts, schema = _encode_block(t)
    full = _write_ocf(body, t.num_rows, schema, "null", None)
    header_len = len(full) - len(body) - 16  # header+sync before the block
    cut = data.draw(st.integers(min_value=header_len + 1,
                                max_value=len(full) - 1))
    try:
        out = parse_avro_file(full[:cut])
    except Exception:
        return  # rejection is the correct outcome
    # if it parsed, the sync marker must have validated a COMPLETE block —
    # impossible for a cut strictly inside the file
    raise AssertionError(
        f"truncated file parsed to {out.num_rows} rows without error")
