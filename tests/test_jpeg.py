"""Baseline JPEG codec tests (stages/jpegcodec.py).

The codec is lossy, so roundtrips assert bounded error instead of byte
identity; the DC-only (uniform image) case IS exact by construction, which
pins the marker plumbing + Huffman + quantization chain analytically.
"""

import numpy as np
import pytest

from monocator_ray.stages.jpegcodec import (
    UNZIGZAG, ZIGZAG, decode_jpeg, encode_jpeg, _build_codes, _build_peek_table,
)


def _smooth(h, w, seed=3):
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.clip(yy * 3 + 20, 0, 255)
    g = np.clip(xx * 2 + 40, 0, 255)
    b = np.clip(yy + xx + 30, 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_zigzag_is_a_permutation_and_matches_spec_corners():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert np.array_equal(ZIGZAG[UNZIGZAG], np.arange(64))
    # T.81 figure A.6 first entries: 0, (0,1)=1, (1,0)=8, (2,0)=16, (1,1)=9, (0,2)=2
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-1] == 63


def test_huffman_codes_are_canonical_and_prefix_free():
    bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    vals = list(range(12))
    codes = _build_codes(bits, vals)
    assert len(codes) == 12
    # prefix-freedom: no code is a prefix of another
    as_bits = {format(c, f"0{ln}b") for c, ln in codes.values()}
    for a in as_bits:
        for b in as_bits:
            if a != b:
                assert not b.startswith(a)
    # the peek table agrees with the explicit codes
    peek = _build_peek_table(bits, vals)
    for sym, (c, ln) in codes.items():
        entry = int(peek[c << (16 - ln)])
        assert entry == (sym << 5) | ln


def test_uniform_image_is_exact():
    # constant block -> DC only -> quant/dequant of a single coefficient;
    # with q=95 the DC step is small enough to reconstruct the value exactly
    for val in (0, 60, 128, 130, 255):
        img = np.full((16, 24, 3), val, np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - int(val)).max() <= 1


def test_smooth_roundtrip_all_subsamplings():
    img = _smooth(40, 56)
    for ss, bound in [("444", 3), ("422", 4), ("420", 6)]:
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=ss))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= bound, (ss, err.max())


def test_odd_dimensions_not_multiple_of_mcu():
    img = _smooth(37, 51)
    for ss in ("444", "420"):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=ss))
        assert out.shape == img.shape


def test_grayscale_single_component():
    yy = np.mgrid[0:40, 0:56][0]
    g = np.clip(yy * 4 + 10, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == g.shape and out.ndim == 2
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 2


def test_noise_survives_all_huffman_paths():
    # random noise at q=100 exercises long codes, ZRL runs and big DC swings
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (48, 64, 3), np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4
    # checkerboard = maximal AC energy in the highest frequency
    cb = (np.indices((32, 32)).sum(0) % 2 * 255).astype(np.uint8)
    cb3 = np.stack([cb] * 3, -1)
    assert np.array_equal(decode_jpeg(encode_jpeg(cb3, quality=100)), cb3)


def test_restart_markers_do_not_change_the_decode():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (45, 61, 3), np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=80, subsample="420"))
    for ri in (1, 2, 5):
        with_rst = decode_jpeg(
            encode_jpeg(img, quality=80, subsample="420", restart_interval=ri)
        )
        assert np.array_equal(base, with_rst)


def test_quality_monotonicity():
    img = _smooth(48, 48)
    sizes, errs = [], []
    for q in (95, 75, 40, 10):
        d = encode_jpeg(img, quality=q)
        sizes.append(len(d))
        errs.append(np.abs(decode_jpeg(d).astype(int) - img.astype(int)).mean())
    assert sizes == sorted(sizes, reverse=True)  # lower quality -> smaller file
    assert errs == sorted(errs)  # and more error


def test_invalid_scans_and_garbage_are_rejected_cleanly():
    img = _smooth(16, 16)
    data = bytearray(encode_jpeg(img, quality=90))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # flip SOF0 -> SOF2: the baseline scan header
    # (Ss=0, Se=63) is INVALID for a progressive DC scan (T.81 G.1.1.1.1)
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(data))
    data[sof + 1] = 0xC3  # lossless stays gated
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0rest")  # truncated APP0


def test_purecodec_dispatch_and_synth_mix():
    from monocator_ray.stages.media import PureCodec, synth_media_table

    c = PureCodec()
    img = _smooth(24, 24)
    blob = encode_jpeg(img, quality=90)
    assert c.sniff(blob) == "image/jpeg"
    out = c.decode_image(blob)
    assert out.shape == img.shape
    # the synth media mix now rotates a JPEG variant and it decodes
    tbl = synth_media_table(48)
    mimes = tbl["mime"].to_pylist()
    assert "image/jpeg" in mimes
    i = mimes.index("image/jpeg")
    decoded = c.decode_image(tbl["payload"][i].as_py())
    assert decoded.shape == (tbl["height"][i].as_py(), tbl["width"][i].as_py(), 3)


def test_fill_bytes_gray_sampling_and_cmyk_gate():
    """Code-review r3-closing pins: (a) 0xFF fill bytes before a marker are
    legal (T.81 B.1.1.2); (b) a grayscale JPEG declaring 2x2 sampling on
    its sole component decodes non-interleaved (T.81 A.2) identically to
    the 1x1 declaration; (c) 4-component (CMYK) is gated, not mis-decoded."""
    import struct

    img = _smooth(24, 24)
    d = encode_jpeg(img, quality=90)
    sof = d.find(b"\xff\xc0")
    with_fill = d[:sof] + b"\xff\xff\xff" + d[sof:]
    assert np.array_equal(decode_jpeg(with_fill), decode_jpeg(d))

    g = np.clip(np.mgrid[0:24, 0:24][0] * 5, 0, 255).astype(np.uint8)
    dg = bytearray(encode_jpeg(g, quality=90))
    sofg = bytes(dg).find(b"\xff\xc0")
    samp_off = sofg + 2 + 2 + 1 + 4 + 1 + 1
    assert dg[samp_off] == 0x11
    dg[samp_off] = 0x22
    assert np.array_equal(decode_jpeg(bytes(dg)), decode_jpeg(encode_jpeg(g, quality=90)))

    d4 = bytearray(d)
    d4[sof + 2 + 2 + 1 + 4] = 4  # ncomp -> 4 (CMYK shape)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(d4))


def test_progressive_roundtrip_matches_baseline():
    """decode(progressive(x)) == decode(baseline(x)) bit-for-bit: both
    codings carry the same quantized coefficients, so any difference is a
    scan-decode bug.  Covers all subsamplings, odd dims (padded MCU grids
    with clamped edge blocks), and grayscale (non-interleaved DC)."""
    import numpy as np

    from monocator_ray.stages.jpegcodec import encode_progressive_jpeg

    rng = np.random.RandomState(11)
    cases = [
        ((24, 32), "444"), ((17, 23), "444"),
        ((24, 32), "422"), ((19, 21), "422"),
        ((32, 32), "420"), ((18, 27), "420"),
    ]
    for (hh, ww), sub in cases:
        img = rng.randint(0, 256, (hh, ww, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=85, subsample=sub))
        prog = decode_jpeg(encode_progressive_jpeg(img, quality=85, subsample=sub))
        assert np.array_equal(base, prog), (hh, ww, sub)
    g = rng.randint(0, 256, (21, 13)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, quality=85)),
        decode_jpeg(encode_progressive_jpeg(g, quality=85)),
    )


def test_progressive_eobrun_spans_blocks():
    """A near-flat image makes almost every AC block empty -> long EOBn
    runs spanning many blocks (and refinement correction bits riding the
    run); the stream must still decode identically to baseline."""
    import numpy as np

    from monocator_ray.stages.jpegcodec import encode_progressive_jpeg

    img = np.full((64, 64, 3), 128, np.uint8)
    img[10, 10] = [200, 40, 90]  # one feature in a sea of EOB runs
    blob = encode_progressive_jpeg(img, quality=50)
    assert b"\xff\xc2" in blob  # really progressive
    assert np.array_equal(decode_jpeg(blob),
                          decode_jpeg(encode_jpeg(img, quality=50)))


def test_progressive_with_restart_markers():
    """DRI applies per scan in progressive mode: DC predictors and EOB
    runs reset at every RSTn; decode must still match baseline."""
    import numpy as np

    from monocator_ray.stages.jpegcodec import encode_progressive_jpeg

    rng = np.random.RandomState(12)
    img = rng.randint(0, 256, (40, 48, 3)).astype(np.uint8)
    blob = encode_progressive_jpeg(img, quality=80, restart_interval=3)
    assert b"\xff\xd0" in blob  # restart markers present
    assert np.array_equal(decode_jpeg(blob),
                          decode_jpeg(encode_jpeg(img, quality=80)))


def test_progressive_scan_header_validation():
    """Spec-corner pins for T.81 G.1.1.1.1 scan-header rules."""
    import struct as _st

    import numpy as np

    from monocator_ray.stages.jpegcodec import encode_progressive_jpeg

    img = np.zeros((16, 16, 3), np.uint8)
    blob = bytearray(encode_progressive_jpeg(img, quality=85))
    sos = blob.find(b"\xff\xda")
    (ln,) = _st.unpack_from(">H", blob, sos + 2)
    # first scan is interleaved DC (3 comps): corrupt Ss to 1 -> an AC scan
    # with ns=3 must be rejected
    blob[sos + 2 + ln - 3] = 1
    with pytest.raises(ValueError, match="single-component"):
        decode_jpeg(bytes(blob))


def test_noninterleaved_scans_decode_identically_to_interleaved():
    """T.81 A.2: one SOS per component carries the SAME quantized
    coefficients as the interleaved scan (padding blocks are simply never
    coded), so the decoded pixels must be bit-identical — for every
    sampling layout, and with restart markers inside each scan (the DC
    predictor and RST modulo counter reset per scan, E.2.4)."""
    rng = np.random.default_rng(7)
    for shape, sub in [((24, 33, 3), "444"), ((24, 33, 3), "420"),
                       ((17, 21, 3), "422")]:
        x = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(x, quality=70, subsample=sub))
        noni = encode_jpeg(x, quality=70, subsample=sub, interleave=False)
        assert noni.count(b"\xff\xda") == 3  # three single-component scans
        assert np.array_equal(base, decode_jpeg(noni)), (shape, sub)
        noni_r = encode_jpeg(x, quality=70, subsample=sub,
                             interleave=False, restart_interval=3)
        assert np.array_equal(base, decode_jpeg(noni_r)), (shape, sub, "rst")


def test_16bit_dqt_transcode_is_identical_and_sof1_roundtrips():
    """Pq=1 DQT layout (T.81 B.2.4.1): widening an 8-bit stream's tables
    to 16-bit (same values) must not change a single pixel; a genuinely
    16-bit encode (quality=2, force_baseline=False -> entries ~3000) must
    emit SOF1 + Pq=1 and still roundtrip a smooth ramp closely."""
    import struct

    rng = np.random.default_rng(11)
    x = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    e8 = encode_jpeg(x, quality=85)

    def widen_dqt(data: bytes) -> bytes:
        out = bytearray(data[:2])
        pos = 2
        while pos < len(data):
            marker = data[pos + 1]
            if marker in (0xD9, 0xDA):
                out += data[pos:]
                break
            (seglen,) = struct.unpack_from(">H", data, pos + 2)
            seg = data[pos:pos + 2 + seglen]
            if marker == 0xDB:
                body = seg[4:]
                nb = bytearray()
                i = 0
                while i < len(body):
                    nb.append(0x10 | (body[i] & 0x0F))
                    for v in body[i + 1:i + 65]:
                        nb += struct.pack(">H", v)
                    i += 65
                seg = b"\xff\xdb" + struct.pack(">H", 2 + len(nb)) + bytes(nb)
            out += seg
            pos += 2 + seglen
        return bytes(out)

    assert np.array_equal(decode_jpeg(e8), decode_jpeg(widen_dqt(e8)))

    ramp = np.tile(np.linspace(0, 255, 40, dtype=np.uint8)[None, :, None],
                   (32, 1, 3))
    b = encode_jpeg(ramp, quality=2, force_baseline=False)
    assert b"\xff\xc1" in b and b"\xff\xc0" not in b  # SOF1, not SOF0
    # DQT precision nibble is set on every table
    i = b.find(b"\xff\xdb")
    assert b[i + 4] >> 4 == 1
    d = decode_jpeg(b)
    assert d.shape == ramp.shape
    assert int(np.abs(d.astype(int) - ramp.astype(int)).max()) < 64


def test_partially_interleaved_scans_decode_identically():
    """VERDICT r4 #6 — the last sequential T.81 gate removed: 1 < Ns < Nf
    scans (A.2.3: MCUs walk the FRAME grid carrying only the scan's
    components) carry the SAME quantized coefficients as one interleaved
    scan, so decode must be bit-identical across every scan grouping,
    sampling layout, and with restart markers."""
    rng = np.random.default_rng(11)
    for shape, sub in [((24, 33, 3), "444"), ((24, 33, 3), "420"),
                       ((17, 21, 3), "422")]:
        x = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(x, quality=70, subsample=sub))
        for groups in ([[0, 1], [2]], [[0], [1, 2]], [[1, 2], [0]]):
            part = encode_jpeg(x, quality=70, subsample=sub,
                               scan_groups=groups)
            assert part.count(b"\xff\xda") == 2
            assert np.array_equal(base, decode_jpeg(part)), (shape, sub, groups)
        part_r = encode_jpeg(x, quality=70, subsample=sub,
                             scan_groups=[[0, 1], [2]], restart_interval=3)
        assert np.array_equal(base, decode_jpeg(part_r)), (shape, sub, "rst")


def test_scan_groups_must_cover_components_exactly():
    x = _smooth(16, 16)
    with pytest.raises(ValueError, match="scan_groups"):
        encode_jpeg(x, quality=85, scan_groups=[[0, 1]])
    with pytest.raises(ValueError, match="scan_groups"):
        encode_jpeg(x, quality=85, scan_groups=[[0, 1], [2], [2]])
