"""Avro OCF sink/source (sources/avro.py): spec-corner pins (zigzag,
varints, sync markers, reversed unions, multi-block), vectorized ==
sequential cross-check, Ray-level export/read roundtrip, and the
foreign-file fallback path."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from monocator_ray.sources.avro import (
    _INDEX_META_KEY,
    _decode_block_sequential,
    _decode_block_vectorized,
    _encode_block,
    _varint_gather,
    _varint_lens,
    _write_ocf,
    _zigzag_decode,
    _zigzag_encode,
    parse_avro_file,
)


def _mixed_table() -> pa.Table:
    return pa.table(
        {
            "a": pa.array([1, -1, 0, 2**62, -(2**62), None], pa.int64()),
            "s": pa.array(["", "héllo", None, "x" * 300, "y", "z"]),
            "d": pa.array([0.0, -1.5, 3.25, None, float("inf"), 2.0]),
            "ts": pa.array([0, 1, 2, None, 4, 5], pa.timestamp("us")),
            "b": pa.array([True, False, None, True, False, True]),
            "raw": pa.array([b"\x00\x80", b"", None, b"abc", b"\xff", b"q"],
                            pa.binary()),
            "f32": pa.array([1.5, None, -2.0, 0.0, 3.0, 4.0], pa.float32()),
            "i32": pa.array([1, 2, None, -5, 7, 8], pa.int32()),
        }
    )


# ------------------------------------------------------------ spec corners --


def test_zigzag_spec_pins():
    # Avro spec: 0->0, -1->1, 1->2, -2->3, 2->4 (the table in the spec)
    v = np.array([0, -1, 1, -2, 2, -(2**63), 2**63 - 1], np.int64)
    zz = _zigzag_encode(v)
    assert zz[:5].tolist() == [0, 1, 2, 3, 4]
    assert (_zigzag_decode(zz) == v).all()


def test_varint_lens_and_gather_roundtrip():
    zz = np.array([0, 127, 128, 2**14 - 1, 2**14, 2**63, 2**64 - 1], np.uint64)
    lens = _varint_lens(zz)
    assert lens.tolist() == [1, 1, 2, 2, 3, 10, 10]
    # scatter then gather back at the same positions
    starts = np.concatenate(([np.int64(0)], np.cumsum(lens)[:-1]))
    out = np.zeros(int(lens.sum()), np.uint8)
    from monocator_ray.sources.avro import _varint_scatter

    _varint_scatter(out, starts, zz, lens)
    got, glens = _varint_gather(out, starts)
    assert (got == zz).all() and (glens == lens).all()
    # byte-level pin: 128 encodes as 80 01 per the spec's varint examples
    i = starts[2]
    assert out[i] == 0x80 and out[i + 1] == 0x01


def test_roundtrip_all_types_all_paths():
    t = _mixed_table()
    body, starts, schema = _encode_block(t)
    for codec in ("null", "deflate"):
        for idx in (starts, None):
            data = _write_ocf(body, t.num_rows, schema, codec, idx)
            assert parse_avro_file(data).equals(t)


def test_vectorized_equals_sequential():
    t = _mixed_table()
    body, starts, schema = _encode_block(t)
    vec = _decode_block_vectorized(np.frombuffer(body, np.uint8), starts, schema)
    seq = _decode_block_sequential(body, t.num_rows, schema)
    # sequential path types everything directly from the Avro schema
    assert vec.cast(seq.schema).equals(seq)


def test_union_only_when_nulls_present():
    t = pa.table({"a": pa.array([5, 6], pa.int64()), "s": pa.array(["p", "q"])})
    body, starts, schema = _encode_block(t)
    assert all(not isinstance(f["type"], list) for f in schema["fields"])
    data = _write_ocf(body, 2, schema, "deflate", starts)
    assert parse_avro_file(data).equals(t)


def test_empty_block():
    t = _mixed_table().slice(0, 0)
    body, starts, schema = _encode_block(t)
    data = _write_ocf(body, 0, schema, "deflate", starts)
    assert parse_avro_file(data).num_rows == 0


def test_nested_types_rejected():
    t = pa.table({"l": pa.array([[1, 2]], pa.list_(pa.int64()))})
    with pytest.raises(TypeError, match="Avro-unsupported"):
        _encode_block(t)


# ------------------------------------------------- foreign / hostile files --


def _wv(buf: bytearray, v: int) -> None:
    zz = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    while True:
        b = zz & 0x7F
        zz >>= 7
        if zz:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _foreign_file(schema_json: bytes, blocks: list[tuple[int, bytes]]) -> bytes:
    """Hand-assemble an OCF the way a third-party writer would: null codec,
    no index key, multiple data blocks."""
    out = bytearray(b"Obj\x01")
    _wv(out, 2)
    for k, v in ((b"avro.schema", schema_json), (b"avro.codec", b"null")):
        _wv(out, len(k)); out += k
        _wv(out, len(v)); out += v
    out.append(0)
    sync = bytes(range(16))
    out += sync
    for cnt, body in blocks:
        _wv(out, cnt)
        _wv(out, len(body))
        out += body
        out += sync
    return bytes(out)


def test_foreign_multiblock_and_reversed_union():
    # schema with the union written ["long","null"] (value branch FIRST —
    # the order our writer never emits) across two data blocks
    sch = (b'{"type":"record","name":"R","fields":['
           b'{"name":"v","type":["long","null"]},'
           b'{"name":"s","type":"string"}]}')
    b1 = bytearray()
    _wv(b1, 0); _wv(b1, 7)            # branch 0 = long, value 7
    _wv(b1, 2); b1 += b"hi"           # "hi"
    b2 = bytearray()
    _wv(b2, 1)                        # branch 1 = null
    _wv(b2, 3); b2 += b"bye"
    data = _foreign_file(sch, [(1, bytes(b1)), (1, bytes(b2))])
    t = parse_avro_file(data)
    assert t.column("v").to_pylist() == [7, None]
    assert t.column("s").to_pylist() == ["hi", "bye"]


def test_sync_marker_mismatch_rejected():
    t = pa.table({"a": pa.array([1], pa.int64())})
    body, starts, schema = _encode_block(t)
    data = bytearray(_write_ocf(body, 1, schema, "null", None))
    data[-1] ^= 0xFF  # corrupt the trailing sync
    with pytest.raises(ValueError, match="sync marker"):
        parse_avro_file(bytes(data))


def test_stale_index_falls_back_to_sequential():
    # an index whose length disagrees with the block count must be ignored
    t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    body, starts, schema = _encode_block(t)
    bad = np.array([0], np.int64)  # wrong length
    data = _write_ocf(body, 3, schema, "null", bad)
    assert parse_avro_file(data).equals(t)


def test_double_wire_format_is_ieee_le():
    t = pa.table({"d": pa.array([1.5], pa.float64())})
    body, starts, schema = _encode_block(t)
    assert body == struct.pack("<d", 1.5)


def test_index_meta_is_packed_u8_offsets():
    t = _mixed_table()
    body, starts, schema = _encode_block(t)
    data = _write_ocf(body, t.num_rows, schema, "null", starts)
    from monocator_ray.sources.avro import _read_header

    meta, _, _ = _read_header(memoryview(data))
    got = np.frombuffer(zlib.decompress(meta[_INDEX_META_KEY.encode()]), "<u8")
    assert (got == starts.astype(np.uint64)).all()


# ------------------------------------------------------------- Ray surface --


def test_export_read_avro_ray(tmp_path, ray_session):
    import pandas as pd
    import ray.data as rd

    from monocator_ray.stages.grouped import collect_arrow
    from monocator_ray.sources.avro import export_avro, read_avro_dir

    t = _mixed_table()
    ds = rd.from_arrow(t).repartition(3)
    manifest = export_avro(ds, str(tmp_path / "av")).materialize()
    assert sum(r["n_records"] for r in manifest.take_all()) == t.num_rows
    back = read_avro_dir(str(tmp_path / "av"), schema=t.schema)
    got = collect_arrow(back).cast(t.schema)
    # value-exact comparison independent of block order
    a = got.to_pandas().sort_values("a", na_position="last").reset_index(drop=True)
    b = t.to_pandas().sort_values("a", na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_foreign_nested_record_array_map():
    """Nested types decode on the sequential path: a record field, an
    array of longs with a multi-block run, and a string->long map."""
    sch = (b'{"type":"record","name":"R","fields":['
           b'{"name":"who","type":{"type":"record","name":"W","fields":['
           b'{"name":"name","type":"string"},'
           b'{"name":"age","type":["null","long"]}]}},'
           b'{"name":"xs","type":{"type":"array","items":"long"}},'
           b'{"name":"kv","type":{"type":"map","values":"long"}}]}')
    b1 = bytearray()
    _wv(b1, 3); b1 += b"bob"          # who.name
    _wv(b1, 1); _wv(b1, 42)           # who.age = union branch 1 (long), 42
    _wv(b1, 2); _wv(b1, 7); _wv(b1, 8)  # xs block of 2
    _wv(b1, 1); _wv(b1, 9)            # xs second block of 1
    _wv(b1, 0)                        # xs end
    _wv(b1, 1)                        # kv block of 1
    _wv(b1, 1); b1 += b"k"            # key "k"
    _wv(b1, 5)                        # value 5
    _wv(b1, 0)                        # kv end
    data = _foreign_file(sch, [(1, bytes(b1))])
    t = parse_avro_file(data)
    row = t.to_pylist()[0]
    assert row["who"] == {"name": "bob", "age": 42}
    assert row["xs"] == [7, 8, 9]
    assert dict(row["kv"]) == {"k": 5}


def test_nested_self_indexed_falls_back_to_sequential():
    """A self-indexed file whose schema nests must NOT take the lockstep
    path (which is flat-only) — parse_avro_file detects and falls back."""
    sch_doc = {"type": "record", "name": "R", "fields": [
        {"name": "who", "type": {"type": "record", "name": "W", "fields": [
            {"name": "name", "type": "string"}]}}]}
    b1 = bytearray()
    _wv(b1, 2); b1 += b"zz"
    body = bytes(b1)
    starts = np.array([0], np.int64)
    data = _write_ocf(body, 1, sch_doc, "null", starts)
    t = parse_avro_file(data)
    assert t.to_pylist() == [{"who": {"name": "zz"}}]
