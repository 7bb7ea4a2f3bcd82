"""Unit tests mirroring the reference's named test cases (SURVEY.md §5.1:
PageFetcherTest / VatScraperTest at /root/reference/src/mock-servers.MD) plus
the cuckoo filter, robots parser, dedup sketches and ANN kernels."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from monocator_ray.hashing import hash_str64
from monocator_ray.sources.synth import make_vat
from monocator_ray.stages.ann import BruteForceTopK, global_topk, table_to_matrix
from monocator_ray.stages.dedup import (
    MinHasher,
    hamming64,
    jaccard,
    minhash_signature,
    shingle_hashes,
    simhash64,
    _perm_params,
)
from monocator_ray.stages.fetch import truncate_body
from monocator_ray.stages.textstats import LangId, token_count
from monocator_ray.stages.vat import extract_vat_numbers
from monocator_ray.state.cuckoo import CuckooFilter
from monocator_ray.state.robots import RobotsRules, parse_robots


# ---- VAT: reference cases verbatim (mock-servers.MD:14-20) ----
class TestVat:
    def test_vat_found(self):
        vat = make_vat(12345)  # valid by construction
        assert extract_vat_numbers(f"Contact us. VAT: {vat} thanks") == [
            "BE" + vat.replace("BE ", "").replace(".", "")
        ]

    def test_wrong_checksum_rejected(self):
        bad = make_vat(12345, valid=False)
        assert extract_vat_numbers(f"VAT: {bad}") == []

    def test_wrong_format_rejected(self):
        # too few digits / malformed separators never match the candidate re
        assert extract_vat_numbers("VAT: BE 0123.456") == []
        assert extract_vat_numbers("VAT: 12.34.56") == []

    def test_no_vat_on_page(self):
        assert extract_vat_numbers("no numbers here at all") == []

    def test_multiple_first_appearance_order_and_dedup(self):
        v1, v2 = make_vat(1), make_vat(2)
        text = f"{v2} then {v1} then {v2} again"
        got = extract_vat_numbers(text)
        assert len(got) == 2
        assert got[0] == "BE" + v2.replace("BE ", "").replace(".", "")

    def test_leading_digit_1_accepted(self):
        # Belgian enterprise numbers may start with 1 (ADVICE r1): build a
        # valid 1xxxxxxxcc by computing the mod-97 check over the 8-digit
        # prefix
        first8 = 10234567
        chk = 97 - (first8 % 97)
        digits = f"{first8:08d}{chk:02d}"
        s = f"BE {digits[:4]}.{digits[4:7]}.{digits[7:]}"
        assert extract_vat_numbers(f"VAT: {s}") == ["BE" + digits]

    def test_digit_run_boundaries(self):
        # a valid-checksum candidate embedded in a longer digit run must NOT
        # match (unanchored false positive, ADVICE r1)
        v = make_vat(77)  # "BE 0xxx.xxx.xcc"
        digits = v.replace("BE ", "").replace(".", "")  # 10 digits, valid
        assert extract_vat_numbers(f"order id 9{digits}") == []
        assert extract_vat_numbers(f"order id {digits}9") == []
        # but the bare 10-digit run with clean boundaries still matches
        assert extract_vat_numbers(f"vat {digits} here") == ["BE" + digits]


# ---- max-body truncation without Content-Length (mock-servers.MD:4) ----
def test_truncate_body_no_content_length():
    chunks = [b"a" * 1000, b"b" * 1000, b"c" * 1000]
    body, truncated = truncate_body(iter(chunks), max_bytes=2500)
    assert len(body) == 2500 and truncated
    body2, t2 = truncate_body(iter([b"x" * 100]), max_bytes=2500)
    assert body2 == b"x" * 100 and not t2
    body3, t3 = truncate_body(iter([b"y" * 2500, b"z"]), max_bytes=2500)
    assert len(body3) == 2500 and t3


# ---- robots ----
def test_parse_robots():
    r = parse_robots(
        """
        # comment
        User-agent: googlebot
        Disallow: /google-only

        User-agent: *
        Disallow: /private
        Allow: /private/ok
        Crawl-delay: 2.5
        """
    )
    assert r.disallow == ["/private"]
    assert r.allow == ["/private/ok"]
    assert r.crawl_delay_ms == 2500
    assert r.allowed("/public")
    assert not r.allowed("/private/x")
    assert r.allowed("/private/ok/x")


def test_robots_empty_allows_all():
    r = RobotsRules()
    assert r.allowed("/anything")


# ---- cuckoo filter ----
def test_cuckoo_no_false_negatives():
    f = CuckooFilter(5000)
    rng = np.random.RandomState(3)
    items = rng.randint(0, 1 << 63, size=4000).astype(np.uint64)
    f.insert_batch(items)
    assert f.healthy
    assert f.contains_batch(items).all()  # no false negatives
    other = rng.randint(0, 1 << 63, size=4000).astype(np.uint64)
    fp_rate = f.contains_batch(other).mean()
    assert fp_rate < 0.05  # 16-bit fingerprints -> tiny fp rate


# ---- vectorized seen-set (A1 scale path) ----
def test_seen_set_matches_python_set_oracle():
    """add_new/contains vs a scalar set with first-wins in-batch dedup,
    across many batches (forces geometric big/small folds)."""
    from monocator_ray.state.seen import SeenSet

    s = SeenSet()
    oracle: set[int] = set()
    rng = np.random.RandomState(7)
    for _ in range(30):
        batch = rng.randint(0, 5000, size=rng.randint(0, 400)).astype(np.uint64)
        want = np.zeros(len(batch), dtype=bool)
        for i, h in enumerate(batch.tolist()):
            if h not in oracle:
                want[i] = True
                oracle.add(h)
        got = s.add_new(batch)
        assert (got == want).all()
        probe = rng.randint(0, 6000, size=100).astype(np.uint64)
        assert (s.contains(probe) == np.array([int(p) in oracle for p in probe])).all()
    assert len(s) == len(oracle)
    assert s.to_sorted().tolist() == sorted(oracle)
    # checkpoint roundtrip
    from monocator_ray.state.seen import SeenSet as S2

    r = S2.from_sorted(s.to_sorted())
    assert len(r) == len(oracle)
    probe = rng.randint(0, 6000, size=500).astype(np.uint64)
    assert (r.contains(probe) == s.contains(probe)).all()


def test_seen_set_with_cuckoo_prefilter_matches_oracle():
    """Same oracle with the SPEC's cuckoo front-end active, including the
    overflow fallback (a deliberately tiny filter flips unhealthy and the
    exact store silently takes over)."""
    from monocator_ray.state.seen import SeenSet

    for cap in (1 << 16, 64):  # roomy filter; tiny filter that overflows
        s = SeenSet()
        f = CuckooFilter(cap)
        oracle: set[int] = set()
        rng = np.random.RandomState(11)
        for _ in range(20):
            batch = rng.randint(0, 3000, size=rng.randint(0, 300)).astype(np.uint64)
            want = np.zeros(len(batch), dtype=bool)
            for i, h in enumerate(batch.tolist()):
                if h not in oracle:
                    want[i] = True
                    oracle.add(h)
            got = s.add_new(batch, prefilter=f)
            assert (got == want).all()
        assert len(s) == len(oracle)
        if cap == 64:
            assert not f.healthy  # the tiny filter actually overflowed


# ---- minhash / jaccard ----
def test_minhash_estimates_jaccard():
    a = shingle_hashes("the quick brown fox jumps over the lazy dog " * 5, k=3)
    b = shingle_hashes("the quick brown fox leaps over the lazy dog " * 5, k=3)
    true_j = jaccard(a, b)
    pa_, pb_ = _perm_params(256)
    sa = minhash_signature(a, pa_, pb_)
    sb = minhash_signature(b, pa_, pb_)
    est = (sa == sb).mean()
    assert abs(est - true_j) < 0.15
    assert (minhash_signature(a, pa_, pb_) == sa).all()  # deterministic


def test_simhash_similar_texts_close():
    t1 = "ray data is a scalable data processing library " * 10
    t2 = "ray data is a scalable data processing framework " * 10
    t3 = "completely different words about gardening and tulips bloom " * 10
    h1, h2, h3 = (np.array([simhash64(t)], dtype=np.uint64) for t in (t1, t2, t3))
    assert hamming64(h1, h2)[0] < hamming64(h1, h3)[0]
    assert hamming64(h1, h1)[0] == 0


def test_simhash_edge_inputs():
    """Empty / whitespace-only / single-word docs hash deterministically."""
    assert simhash64("") == 0
    assert simhash64("   \t  ") == 0
    assert simhash64("one") == simhash64("one")
    assert simhash64("Mixed CASE") == simhash64("mixed case")


# ---- ANN brute force ----
def test_brute_force_topk_matches_numpy():
    rng = np.random.RandomState(5)
    emb = rng.normal(size=(200, 16)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(200), pa.int64()),
            "embedding": pa.array([e.tolist() for e in emb], pa.list_(pa.float32())),
        }
    )
    q = emb[:3]
    bf = BruteForceTopK(q, k=5)
    local = bf(tbl)
    out = global_topk(local, 5).to_pandas()
    # naive reference
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = qn @ en.T
    for qi in range(3):
        want = set(np.argsort(-sims[qi])[:5].tolist())
        got = set(out[out["query_id"] == qi]["vec_id"].tolist())
        assert got == want
    # query 0's nearest neighbour is itself
    assert out[(out["query_id"] == 0) & (out["rank"] == 0)]["vec_id"].iloc[0] == 0


def test_table_to_matrix_roundtrip():
    m = np.arange(12, dtype=np.float32).reshape(3, 4)
    tbl = pa.table({"embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32()))})
    assert (table_to_matrix(tbl) == m).all()


# ---- IVF ANN recall + connected components ----
def test_ivf_recall_vs_brute_force():
    from monocator_ray.stages.ann import IvfIndex, _normalize

    rng = np.random.RandomState(7)
    base = rng.normal(size=(500, 16)).astype(np.float32)
    idx = IvfIndex.train(base, nlist=8)
    q = base[:5]
    probes = idx.probe_lists(q, nprobe=4)
    assign = idx.assign(base)
    bn = _normalize(base)
    qn = _normalize(q)
    hits = 0
    for qi in range(5):
        true_top = set(np.argsort(-(qn[qi] @ bn.T))[:5].tolist())
        mask = np.isin(assign, probes[qi])
        cand = np.nonzero(mask)[0]
        sims = bn[cand] @ qn[qi]
        got = set(cand[np.argsort(-sims)[:5]].tolist())
        hits += len(true_top & got)
    assert hits / 25 >= 0.6  # nprobe=4 of 8 lists -> decent recall
    # determinism
    assert (IvfIndex.train(base, nlist=8).centroids == idx.centroids).all()


def test_connected_components():
    from monocator_ray.stages.dedup import connected_components

    labels = connected_components([(1, 2), (2, 3), (10, 11), (5, 5)])
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == 10
    assert labels[5] == 5
    assert connected_components([]) == {}


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_matches_union_find():
    import ray.data as rd

    from monocator_ray.shipping import ensure_shipped
    from monocator_ray.stages.dedup import connected_components, label_propagation_components

    ensure_shipped()
    rng = np.random.RandomState(21)
    pairs = [tuple(sorted(p)) for p in rng.randint(0, 40, size=(60, 2)).tolist()]
    want = connected_components(pairs)
    ds = rd.from_items([{"doc_a": a, "doc_b": b} for a, b in pairs])
    import os

    os.environ["MONOCATOR_FORCE_LABELPROP"] = "1"  # pin the DISTRIBUTED path
    try:
        got = label_propagation_components(ds).to_pandas()
    finally:
        del os.environ["MONOCATOR_FORCE_LABELPROP"]
    got_map = dict(zip(got["doc_id"], got["cluster"]))
    assert got_map == want
    # the adaptive small path must agree exactly
    small = label_propagation_components(ds).to_pandas()
    assert dict(zip(small["doc_id"], small["cluster"])) == want


# ---- text stats ----
def test_token_count_matches_sql_semantics():
    s = pd.Series(["a b  c", "", "   ", "one", None, " x\ty \n z "])
    assert token_count(s).tolist() == [3, 0, 0, 1, 0, 3]


def test_langid_deterministic():
    li = LangId()
    assert li.detect("the cat and the dog in the house") == "en"
    assert li.detect("le chat et le chien est pour la maison") == "fr"
    assert li.detect("de kat en de hond van het huis met een niet") == "nl"
    assert li.detect("xyzzy plugh") == "und"


# ---- media codecs (real pure-numpy BMP/PPM/WAV; compressed gated) ----
def test_bmp_roundtrip_and_resize():
    from monocator_ray.stages.media import decode_bmp, encode_bmp, resize_nearest

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(13, 17, 3), dtype=np.uint8)  # odd width -> row padding
    assert (decode_bmp(encode_bmp(img)) == img).all()
    small = resize_nearest(img, 8, 6)
    assert small.shape == (6, 8, 3)
    assert (resize_nearest(img, 17, 13) == img).all()  # identity resize


def test_ppm_decode():
    from monocator_ray.stages.media import decode_ppm

    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, size=(4, 5, 3), dtype=np.uint8)
    data = b"P6\n# a comment\n5 4\n255\n" + img.tobytes()
    assert (decode_ppm(data) == img).all()


def test_wav_roundtrip_and_features():
    from monocator_ray.stages.media import PureCodec, decode_wav, encode_wav

    rate = 8000
    t = np.arange(800)
    samples = (np.sin(2 * np.pi * 440 * t / rate) * 16000).astype(np.int16)
    got, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate and len(got) == len(samples)
    assert np.allclose(got, samples / 32768.0, atol=1e-4)
    f = PureCodec().audio_features(got, rate)
    assert abs(f[0] - 100.0) < 1e-3  # 800 samples @ 8kHz = 100 ms
    assert 0.3 < f[2] < 0.5  # sine RMS ~ 0.49 * amplitude(0.49)


def test_y4m_roundtrip_and_frame_sampling():
    import numpy as np

    from monocator_ray.stages.media import (
        PureCodec, VideoFrameSampler, decode_y4m, encode_y4m, sample_frames,
        synth_media_table,
    )

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, size=(6, 10, 14, 3), dtype=np.uint8)
    blob = encode_y4m(frames, fps=(30, 1))
    back, fps = decode_y4m(blob)
    assert fps == (30, 1)
    assert np.array_equal(back, frames)  # exact roundtrip
    # sampling: deterministic evenly spaced, first frame always included
    s = sample_frames(frames, 3)
    assert s.shape == (3, 10, 14, 3)
    assert np.array_equal(s[0], frames[0]) and np.array_equal(s[1], frames[2])
    # subsampled chroma decodes for real: C420 planes upsample by sample
    # duplication (each chroma sample covers a 2x2 block)
    import pytest as _pytest

    y = np.arange(16, dtype=np.uint8).reshape(4, 4)
    cb = np.array([[10, 20], [30, 40]], np.uint8)
    cr = np.array([[50, 60], [70, 80]], np.uint8)
    blob420 = (b"YUV4MPEG2 W4 H4 F25:1 C420\nFRAME\n"
               + y.tobytes() + cb.tobytes() + cr.tobytes())
    f420, fps420 = decode_y4m(blob420)
    assert f420.shape == (1, 4, 4, 3) and fps420 == (25, 1)
    assert np.array_equal(f420[0, :, :, 0], y)
    assert np.array_equal(f420[0, :, :, 1], cb.repeat(2, 1).repeat(2, 0))
    assert np.array_equal(f420[0, :, :, 2], cr.repeat(2, 1).repeat(2, 0))
    # C422: half width, full height
    f422, _ = decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C422\nFRAME\n"
                         + y.tobytes() + bytes(range(8)) + bytes(range(8)))
    assert f422.shape == (1, 4, 4, 3)
    assert np.array_equal(f422[0, :, :, 1],
                          np.arange(8, dtype=np.uint8).reshape(4, 2).repeat(2, 1))
    # mono: neutral chroma
    fmono, _ = decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 Cmono\nFRAME\n" + y.tobytes())
    assert np.array_equal(fmono[0, :, :, 0], y) and (fmono[0, :, :, 1] == 128).all()
    # the 4-plane alpha variant stays gated, not mis-decoded
    with _pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C444alpha\nFRAME\n" + b"\x00" * 64)
    # features: video_features reports dims + frame count
    f = PureCodec().video_features(frames, (30, 1))
    assert f[1] == 14 and f[2] == 10 and f[13] == 6
    # frame sampler explodes video rows into decodable BMP image rows
    tbl = synth_media_table(12)
    out = VideoFrameSampler(k=3)(tbl)
    assert out.num_rows > 0
    assert set(out["kind"].to_pylist()) == {"image"}
    img = PureCodec().decode_image(out["payload"][0].as_py())
    assert img.shape == (12, 16, 3)


def test_compressed_formats_gated():
    import pytest as _pytest

    from monocator_ray.stages.media import PureCodec

    c = PureCodec()
    # baseline JPEG decodes for real since r3; truncated garbage is a parse
    # error, and progressive (SOF2) stays gated — see test_jpeg.py
    assert c.sniff(b"\xff\xd8\xff\xe0rest") == "image/jpeg"
    with _pytest.raises(ValueError):
        c.decode_image(b"\xff\xd8\xff\xe0rest")
    # MP3: the SILENT-payload subset decodes for real (r5 — side info
    # parsed, zero part2_3_length -> exact zero PCM); coded spectral data
    # stays gated (Huffman/synthesis tables unverifiable in-sandbox), and
    # garbage after the ID3 tag is a parse error
    with _pytest.raises(ValueError):
        c.decode_audio(b"ID3\x04\x00\x00\x00\x00\x00\x00rest")
    from monocator_ray.stages.mp4 import synth_mp3 as _smp3

    pcm, rate = c.decode_audio(_smp3(4))
    assert pcm.shape == (4 * 1152, 2) and rate == 44100
    assert not pcm.any()
    # a frame CLAIMING huffman data (nonzero part2_3_length) must gate,
    # not silently emit silence
    fr = bytearray(_smp3(1))
    fr[6] |= 0x08  # first side-info byte after 9-bit main_data_begin run
    with _pytest.raises(NotImplementedError):
        c.decode_audio(bytes(fr))
    # MP4: the container parses for real; a COMPRESSED codec is the gate
    from monocator_ray.stages.mp4 import encode_mp4_stub, synth_mp3

    stub = encode_mp4_stub([b"fake-nal"] * 3, 32, 24, b"avc1")
    assert c.sniff(stub) == "video/mp4"
    with _pytest.raises(NotImplementedError):
        c.decode_video(stub)
    # ...but the metadata layer flows for both gated formats
    meta = c.container_metadata(stub)
    assert (meta["codec"], meta["width"], meta["height"], meta["n_samples"]) == \
        ("avc1", 32, 24, 3)
    m = c.container_metadata(synth_mp3(5))
    assert m["n_samples"] == 5 and m["codec"] == "mp3-cbr"


# ---- media plumbing (real codecs for BMP/WAV rows, fake for video) ----
@pytest.mark.usefixtures("ray_session")
def test_media_pipeline_plumbing():
    import ray.data as rd

    from monocator_ray.shipping import ensure_shipped
    from monocator_ray.stages.media import MediaFeatureExtractor, synth_media_table

    ensure_shipped()
    tbl = synth_media_table(48)
    ds = rd.from_arrow(tbl).map_batches(
        MediaFeatureExtractor, batch_format="pyarrow", batch_size=16, concurrency=2
    )
    out = ds.take_all()
    assert len(out) == 48
    assert all(len(r["feature"]) == 16 for r in out)
    # image and audio rows REALLY decode (BMP/WAV); video falls back to stub
    by_kind = {}
    for r in out:
        by_kind.setdefault(r["kind"], []).append(r)
    assert all(r["decoded"] == 1 for r in by_kind["image"])
    # audio: WAV rows decode for real, and since r5 the synth MP3 rows do
    # too (silent-payload Layer III subset — side info parsed, zero PCM)
    assert all(r["decoded"] == 1 for r in by_kind["audio"])
    # video rows: Y4M/GIF/raw-MP4 payloads decode for real, compressed
    # avc1 containers fall back (with REAL container dims)
    vdec = sorted(r["decoded"] for r in by_kind["video"])
    assert vdec[0] == 0 and vdec[-1] == 1
    for r in by_kind["video"]:
        if not r["decoded"]:  # gated avc1: dims from the real sample table
            assert r["width"] == 32 and r["height"] == 24
    for r in by_kind["video"]:
        if r["decoded"]:
            assert r["width"] == 16 and r["height"] == 12
            assert r["feature"][13] >= 5  # frame count
    # decoded image dims come from the actual BMP header
    img0 = by_kind["image"][0]
    assert img0["width"] > 0 and img0["height"] > 0
    assert img0["feature"][0] == img0["width"] and img0["feature"][1] == img0["height"]
    # determinism: same payload -> same feature
    a = MediaFeatureExtractor()(tbl.slice(0, 4))
    b = MediaFeatureExtractor()(tbl.slice(0, 4))
    assert a.equals(b)


# ---- seeds / visit requests ----
def test_visit_requests_roundtrip(tmp_path):
    from monocator_ray.sources.seeds import (
        default_request,
        host_caps_from_requests,
        requests_to_seed_urls,
    )

    reqs = pa.Table.from_pylist(
        [default_request("example.com"), dict(default_request("other.example"), web_max_pages=3)]
    )
    urls = requests_to_seed_urls(reqs)
    assert urls == ["http://example.com/", "http://other.example/"]
    caps = host_caps_from_requests(reqs)
    assert caps["other.example"] == 3


@pytest.mark.usefixtures("ray_session")
def test_collect_arrow_tolerates_degraded_empty_blocks():
    """Regression pin for the r2 flake class (VERDICT r2 #1 suspect b):
    Ray Data intermittently emits zero-column / degraded-schema empty
    blocks; collect_arrow must drop them losslessly where raw
    concat/to_pandas crashes or degrades dtypes."""
    import pyarrow as pa
    import ray.data as rd

    from monocator_ray.stages.grouped import collect_arrow

    real = pa.table({"doc_id": pa.array([3, 1], pa.int64())})
    zero_col = pa.table({})
    degraded = pa.table({"doc_id": pa.array([], pa.null())})
    ds = rd.from_arrow([zero_col, real, degraded])
    out = collect_arrow(ds)
    assert out.column_names == ["doc_id"]
    assert sorted(out["doc_id"].to_pylist()) == [1, 3]
    assert out.schema.field("doc_id").type == pa.int64()
    # all-empty: the typed empty block's schema survives
    out2 = collect_arrow(rd.from_arrow([zero_col, pa.table({"x": pa.array([], pa.int64())})]))
    assert out2.num_rows == 0 and out2.column_names == ["x"]


def test_png_roundtrip_all_filters_and_color_types():
    """Pure-numpy PNG codec (VERDICT r2 #3): encode with the filter cycle
    (None/Sub/Up/Average/Paeth row by row) and decode back bit-exact, for
    gray / RGB / RGBA; palette decode against hand-built chunks; Adam7 and
    16-bit stay gated."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from monocator_ray.stages.media import (
        PureCodec, _png_chunk, _PNG_SIG, decode_png, encode_png,
    )

    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(13, 17, 3), dtype=np.uint8)
    for cycle in (False, True):
        assert np.array_equal(decode_png(encode_png(rgb, filter_cycle=cycle)), rgb)
    gray = rng.randint(0, 256, size=(9, 7), dtype=np.uint8)
    back = decode_png(encode_png(gray, filter_cycle=True))
    assert np.array_equal(back, np.repeat(gray[:, :, None], 3, axis=2))
    rgba = rng.randint(0, 256, size=(8, 5, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba, filter_cycle=True)), rgba[:, :, :3])

    # palette (color type 3): 4x2 image over a 3-color palette
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2, 1], [2, 2, 0, 1]], np.uint8)
    scan = b"".join(b"\x00" + row.tobytes() for row in idx)
    blob = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", plte.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(scan))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(blob), plte[idx])

    # flipping the interlace byte makes the IDAT stream Adam7-shaped-wrong
    # (r4: Adam7 itself decodes — see test_adam7_interlaced_png_roundtrip);
    # sub-byte depths stay gated (16-bit decodes — test_png_16bit_decode);
    # a depth byte flipped to 16 on an 8-bit stream is a LENGTH error
    bad = bytearray(encode_png(rgb))
    ihdr_off = 8 + 8  # sig + len/type
    bad[ihdr_off + 12] = 1  # interlace byte of IHDR
    with _pytest.raises(ValueError):
        decode_png(bytes(bad))
    bad[ihdr_off + 12] = 0
    bad[ihdr_off + 8] = 16  # depth byte: stream is now half the 16-bit size
    with _pytest.raises(ValueError):
        decode_png(bytes(bad))
    bad[ihdr_off + 8] = 4  # sub-byte depth: gated
    with _pytest.raises(NotImplementedError):
        decode_png(bytes(bad))
    c = PureCodec()
    assert c.sniff(encode_png(rgb)) == "image/png"
    assert np.array_equal(c.decode_image(encode_png(rgb)), rgb)


def test_arrow_text_kernels_match_pandas_reference():
    """VERDICT r2 #7 conversion safety: the Arrow-native text kernels must
    be bit-identical to the r2 pandas reference implementations, including
    on the non-ASCII-whitespace and empty/None edges."""
    import pandas as pd
    import pyarrow as pa

    from monocator_ray.hashing import hash_str64
    from monocator_ray.stages.textstats import (
        _WS_SPLIT, LangId, QualityScorer, fingerprint_arrow, token_count,
        token_count_arrow,
    )

    texts = [
        "a b  c", "", "   ", "one", None, " x\ty \n z ",
        "the cat and dog",      # NBSP joins words (RE2 vs unicode \s)
        "thin space the end",
        "  le chat et le chien  ",
        "de kat en de hond van het huis",
        "THE AND OF to a", "x" * 500,
    ]
    col = pa.array(texts, pa.string())
    s = pd.Series(texts)

    assert token_count_arrow(col).to_pylist() == token_count(s).tolist()

    li = LangId()
    assert li.detect_arrow(col).to_pylist() == [
        li.detect(t or "") for t in texts
    ]

    # fingerprint: same normalization chain, same SipHash
    norm = s.fillna("").str.replace(_WS_SPLIT, " ", regex=True).str.strip(" ")
    want = hash_str64(norm.to_numpy(dtype=object)).astype("uint64")
    assert fingerprint_arrow(col).tolist() == want.tolist()

    # quality: n_stop against a per-row python count
    out = QualityScorer()(pa.table({"text": col}))
    stop = {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"}
    want_stop = [
        sum(1 for w in _WS_SPLIT.split((t or "").lower()) if w in stop)
        for t in texts
    ]
    assert out["n_stop"].to_pylist() == want_stop
    assert out["n_chars"].to_pylist() == [len(t or "") for t in texts]


@pytest.mark.usefixtures("ray_session")
def test_seed_urls_from_file_url_and_domain(tmp_path):
    """code-review r3 #1: a full-URL seed file must seed those exact pages;
    treating the line as a domain mangles it into http://http//... ."""
    from monocator_ray.sources.seeds import seed_urls_from_file

    f = tmp_path / "urls.txt"
    f.write_text("http://example.com/page\nhttps://other.org/x?b=2&a=1\n")
    urls = seed_urls_from_file(str(f))
    assert urls[0] == "http://example.com/page"
    assert all("http//" not in u for u in urls)

    d = tmp_path / "domains.txt"
    d.write_text("example.com\nother.org\n")
    urls2 = seed_urls_from_file(str(d))
    assert "http://example.com/" in urls2[0]


def test_rehearse_rejects_unknown_names():
    """code-review r3 #2: a typo'd --names subset must fail loudly, not
    pass with zero queries run."""
    import pytest as _pytest

    from monocator_ray.pipelines.rehearse import rehearse

    with _pytest.raises(SystemExit, match="unknown query names"):
        rehearse(names=["token_stats_cvs"], quiet=True)


# ---- exact integer-quantized cosine (SQL-oracled ANN baseline) ----
def test_quantize_ints_power_of_two_exact():
    """floor(x*1024) must be reproducible from float32 inputs on any
    IEEE engine: scaling by a power of two only changes the exponent, so
    double(x)*1024 is EXACT and floor is deterministic — including
    negative values and values epsilon-close to integer multiples."""
    import numpy as np

    from monocator_ray.stages.ann import quantize_ints

    x = np.array([-0.3112017, 0.2945560, 1.0, -1.0, 0.0009765625,
                  -0.0009765625, 0.99999994], dtype=np.float32)
    z = quantize_ints(x.reshape(1, -1))[0]
    want = [int(np.floor(float(v) * 1024.0)) for v in x]
    assert z.tolist() == want
    # 2^-10 * 1024 == 1 exactly (no representation error)
    assert z[4] == 1 and z[5] == -1


def test_exact_int_topk_stage_filter_and_self_exclusion():
    """ExactIntTopK batch semantics, Ray-free: label predicate prunes
    BEFORE scoring, the query vector never matches itself, and emitted
    (dot, dd) reproduce the similarity a brute-force recompute gets."""
    import numpy as np
    import pyarrow as pa

    from monocator_ray.stages.ann import ExactIntTopK, quantize_ints

    rng = np.random.RandomState(7)
    m = rng.randn(20, 8).astype(np.float32) * 0.3
    ids = np.arange(20, dtype=np.int64)
    labels = (ids % 2).astype(np.int32)
    Q = quantize_ints(m[:2])
    qq = np.einsum("ij,ij->i", Q, Q)
    stage = ExactIntTopK((ids[:2], Q, qq), k=3, label=0)
    batch = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(r) for r in m], pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    out = stage(batch)
    got_ids = out["vec_id"].to_numpy()
    assert (got_ids % 2 == 0).all()          # label filter applied
    q0 = out.filter(pa.compute.equal(out["query_id"], 0))
    assert 0 not in q0["vec_id"].to_numpy()  # self excluded
    # recompute winner for query 0 by brute force over even ids != 0
    D = quantize_ints(m)
    cand = [i for i in range(20) if i % 2 == 0 and i != 0]
    sims = {i: float(D[i] @ Q[0]) / np.sqrt(float(qq[0]) * float(D[i] @ D[i]))
            for i in cand}
    best = max(sims, key=lambda i: (sims[i], -i))
    assert q0["vec_id"][0].as_py() == best


# ---- GIF codec (real pure-python LZW, public GIF89a spec) ----
def test_gif_roundtrip_small():
    import numpy as np

    from monocator_ray.stages.media import decode_gif, encode_gif

    rng = np.random.RandomState(3)
    img = (rng.randint(0, 6, (12, 16, 3)) * 40).astype(np.uint8)
    data = encode_gif(img)
    assert data[:6] == b"GIF89a" and data[-1:] == b"\x3b"
    out = decode_gif(data)
    assert out.shape == img.shape and (out == img).all()


def test_gif_lzw_table_reset_roundtrip():
    """128x128 of 256-color noise forces the LZW table past 4096 codes —
    the encoder emits a CLEAR reset and the decoder must follow."""
    import numpy as np

    from monocator_ray.stages.media import decode_gif, encode_gif

    rng = np.random.RandomState(11)
    img = np.repeat(rng.randint(0, 256, (128, 128, 1)), 3, axis=2).astype(np.uint8)
    out = decode_gif(encode_gif(img))
    assert (out == img).all()


def test_gif_extensions_skipped_and_interlace_scatters():
    import struct

    import numpy as np
    import pytest as _pytest

    from monocator_ray.stages.media import PureCodec, decode_gif, encode_gif

    img = np.zeros((4, 4, 3), np.uint8)
    img[1, 2] = 200
    data = bytearray(encode_gif(img))
    # splice a GIF89a graphic-control extension before the image descriptor
    desc = data.index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = bytes(data[:desc]) + gce + bytes(data[desc:])
    assert (decode_gif(spliced) == img).all()
    # PureCodec dispatches GIF for real now
    assert PureCodec().sniff(spliced) == "image/gif"
    assert (PureCodec().decode_image(spliced) == img).all()
    # r4: the interlace flag now DEINTERLACES (4-pass row scatter); on a
    # stream whose rows were stored sequentially the flag permutes rows —
    # on this fixture only row 1 is nonzero and it lands on row 2 (pass-4
    # storage slot 2 of [0, 2, 1, 3])
    lidx = spliced.index(b"\x2c")
    flags_at = lidx + 9
    inter = spliced[:flags_at] + bytes([spliced[flags_at] | 0x40]) + spliced[flags_at + 1:]
    got = decode_gif(inter)
    assert (got[2, 2] == 200).all() and (got[1, 2] == 0).all()


def test_gif_subrectangle_frame_painted_at_offset():
    import struct

    import numpy as np

    from monocator_ray.stages.media import decode_gif, encode_gif

    inner = np.full((2, 3, 3), 77, np.uint8)
    data = bytearray(encode_gif(inner))
    # enlarge the logical screen to 5x6 and offset the frame to (2,1):
    # decode must paint the 2x3 frame on black at that offset
    struct.pack_into("<HH", data, 6, 6, 5)  # screen w=6, h=5
    desc = data.index(b"\x2c")
    struct.pack_into("<HH", data, desc + 1, 2, 1)  # frame left=2, top=1
    out = decode_gif(bytes(data))
    assert out.shape == (5, 6, 3)
    assert (out[1:3, 2:5] == 77).all()
    assert out.sum() == 77 * 2 * 3 * 3


def test_skyline_2d_tie_and_duplicate_semantics():
    """Strict-domination skyline: equal-coordinate duplicates BOTH survive,
    same-x points lose to a bigger y, and an interior point dominated only
    by the combination of two others still survives (domination needs one
    point >= on both axes)."""
    import numpy as np

    from monocator_ray.pipelines.relational import _skyline_2d

    n = np.array([5, 5, 5, 3, 3, 1, 4], np.int64)
    t = np.array([9, 9, 2, 7, 7, 10, 8], np.int64)
    # (5,9) x2: duplicates, both kept.  (5,2): same n as (5,9), smaller t ->
    # dominated.  (3,7) x2: dominated by (4,8).  (1,10): undominated (max t).
    # (4,8): undominated ((5,9) has n>4 and t>8 -> wait, (5,9) dominates
    # (4,8): 5>=4, 9>=8, strict on both).  So expected: {(5,9) x2, (1,10)}.
    idx = sorted(_skyline_2d(n, t).tolist())
    pts = sorted((int(n[i]), int(t[i])) for i in idx)
    assert pts == [(1, 10), (5, 9), (5, 9)]

    # all-equal points: everyone survives (nobody strictly dominates)
    idx = _skyline_2d(np.array([2, 2, 2], np.int64), np.array([4, 4, 4], np.int64))
    assert len(idx) == 3

    # staircase: every point on the frontier survives
    idx = _skyline_2d(np.array([1, 2, 3], np.int64), np.array([3, 2, 1], np.int64))
    assert len(idx) == 3


def test_gif_animation_roundtrip_and_composition():
    """Multi-frame encode/decode is exact; sub-rectangle frames composite
    per the 89a disposal + transparency rules; the single-frame decoder
    still reads frame 0 (and skips the NETSCAPE loop extension)."""
    import struct

    import numpy as np

    from monocator_ray.stages.media import (
        PureCodec, decode_gif, decode_gif_frames, encode_gif_frames,
        _lzw_encode_gif,
    )

    rng = np.random.RandomState(5)
    frames = (rng.randint(0, 4, (6, 10, 14, 3)) * 64).astype(np.uint8)
    blob = encode_gif_frames(frames, delay_cs=7)
    back, fps = decode_gif_frames(blob)
    assert np.array_equal(back, frames)
    assert fps == (100, 7)
    assert np.array_equal(decode_gif(blob), frames[0])
    v, fps2 = PureCodec().decode_video(blob)
    assert v.shape == (6, 10, 14, 3) and fps2 == (100, 7)

    # hand-build: 4x4 canvas, frame 0 full red; frame 1 a 2x2 green patch
    # at (1,1) with transparency index 2 punched in one corner and
    # disposal=2 (clear rect to background after display)
    def subblocks(lzw):
        out = bytearray()
        for i in range(0, len(lzw), 255):
            out.append(len(lzw[i:i+255])); out += lzw[i:i+255]
        out.append(0)
        return bytes(out)

    table = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  0, 0, 0])  # r,g,b,black
    hdr = b"GIF89a" + struct.pack("<HH", 4, 4) + bytes([0x81, 0, 0]) + table
    f0 = b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 4) + b"\x00\x02" + \
         subblocks(_lzw_encode_gif(np.zeros(16, np.int64), 2))
    # GCE: disposal=2 (bits 2-4), transparency on, trans idx = 2 (blue)
    gce = b"\x21\xf9\x04" + bytes([(2 << 2) | 1]) + struct.pack("<H", 5) + b"\x02\x00"
    patch = np.array([1, 2, 1, 1], np.int64)  # one transparent pixel
    f1 = b"\x2c" + struct.pack("<HHHH", 1, 1, 2, 2) + b"\x00\x02" + \
         subblocks(_lzw_encode_gif(patch, 2))
    f2 = b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 4) + b"\x00\x02" + \
         subblocks(_lzw_encode_gif(np.zeros(16, np.int64), 2))
    out, fps = decode_gif_frames(hdr + f0 + gce + f1 + f2 + b"\x3b")
    assert out.shape == (3, 4, 4, 3) and fps == (100, 5)
    assert (out[0] == [255, 0, 0]).all()  # full red
    # frame 1: green patch painted except the transparent pixel (red shows)
    assert (out[1][1, 1] == [0, 255, 0]).all()
    assert (out[1][1, 2] == [255, 0, 0]).all()  # transparent -> underlying red
    assert (out[1][2, 1] == [0, 255, 0]).all() and (out[1][2, 2] == [0, 255, 0]).all()
    assert (out[1][0, 0] == [255, 0, 0]).all()  # outside the rect untouched
    # frame 2 painted after disposal-2 cleared the rect; f2 covers fully red
    assert (out[2] == [255, 0, 0]).all()


def test_gif_disposal2_restores_background_color():
    """ADVICE r3 #3: disposal-2 clears the frame rect to the HEADER's
    background color (GCT[bg_index]), not opaque black — parity with
    reference decoders for GIFs that rely on restore-to-background."""
    import struct

    import numpy as np

    from monocator_ray.stages.media import decode_gif_frames, _lzw_encode_gif

    def subblocks(lzw):
        out = bytearray()
        for i in range(0, len(lzw), 255):
            out.append(len(lzw[i:i+255])); out += lzw[i:i+255]
        out.append(0)
        return bytes(out)

    # palette: red, green, blue, black; background index = 2 (blue)
    table = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  0, 0, 0])
    hdr = b"GIF89a" + struct.pack("<HH", 4, 4) + bytes([0x81, 2, 0]) + table
    # frame 0 full red with disposal=2; frame 1 a 1x1 green pixel at (0,0)
    # leaving the rest of the cleared canvas visible
    gce2 = b"\x21\xf9\x04" + bytes([(2 << 2)]) + struct.pack("<H", 5) + b"\x00\x00"
    f0 = b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 4) + b"\x00\x02" + \
         subblocks(_lzw_encode_gif(np.zeros(16, np.int64), 2))
    f1 = b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00\x02" + \
         subblocks(_lzw_encode_gif(np.array([1], np.int64), 2))
    out, _fps = decode_gif_frames(hdr + gce2 + f0 + f1 + b"\x3b")
    assert (out[0] == [255, 0, 0]).all()          # frame 0 displays red
    assert (out[1][0, 0] == [0, 255, 0]).all()    # new pixel green
    assert (out[1][1, 1] == [0, 0, 255]).all()    # cleared rect -> blue bg
    assert (out[1][3, 3] == [0, 0, 255]).all()


def test_adam7_interlaced_png_roundtrip():
    """Adam7 decode (round 4): the 7-pass deinterleave reproduces the
    source exactly, on sizes that exercise empty and 1-wide passes."""
    import numpy as np

    from monocator_ray.stages.media import decode_png, encode_png, encode_png_adam7

    rng = np.random.RandomState(21)
    for hh, ww in [(16, 16), (9, 13), (7, 5), (1, 1), (3, 20), (8, 3)]:
        img = rng.randint(0, 256, (hh, ww, 3)).astype(np.uint8)
        blob = encode_png_adam7(img)
        assert blob[28] == 1  # IHDR interlace byte
        assert np.array_equal(decode_png(blob), img)
        # and equals the non-interlaced coding of the same pixels
        assert np.array_equal(decode_png(blob), decode_png(encode_png(img)))
    g = rng.randint(0, 256, (11, 6)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png_adam7(g)),
                          np.repeat(g[:, :, None], 3, axis=2))


def test_interlaced_gif_roundtrip():
    """Interlaced GIF (round 4): rows stored in the 4-pass order scatter
    back to image order; pinned against the non-interlaced decode of the
    same frame."""
    import struct

    import numpy as np

    from monocator_ray.stages.media import decode_gif, _lzw_encode_gif

    def subblocks(lzw):
        out = bytearray()
        for i in range(0, len(lzw), 255):
            out.append(len(lzw[i:i+255])); out += lzw[i:i+255]
        out.append(0)
        return bytes(out)

    rng = np.random.RandomState(22)
    for hh, ww in [(13, 7), (8, 8), (3, 5), (1, 4)]:
        img_idx = rng.randint(0, 4, (hh, ww))
        table = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  0, 0, 0])
        hdr = b"GIF89a" + struct.pack("<HH", ww, hh) + bytes([0x81, 0, 0]) + table
        # interlaced storage order: passes 0::8, 4::8, 2::4, 1::2
        order = np.concatenate([np.arange(0, hh, 8), np.arange(4, hh, 8),
                                np.arange(2, hh, 4), np.arange(1, hh, 2)])
        stored = img_idx[order].reshape(-1)
        f_i = (b"\x2c" + struct.pack("<HHHH", 0, 0, ww, hh) + bytes([0x40])
               + b"\x02" + subblocks(_lzw_encode_gif(stored, 2)))
        f_n = (b"\x2c" + struct.pack("<HHHH", 0, 0, ww, hh) + b"\x00"
               + b"\x02" + subblocks(_lzw_encode_gif(img_idx.reshape(-1), 2)))
        got_i = decode_gif(hdr + f_i + b"\x3b")
        got_n = decode_gif(hdr + f_n + b"\x3b")
        assert np.array_equal(got_i, got_n), (hh, ww)


def test_ppm_16bit_and_scaled_maxval():
    import numpy as np

    from monocator_ray.stages.media import decode_ppm

    # maxval 65535: 2-byte big-endian samples, exact *255//maxval rescale
    vals = np.array([[[0, 257, 65535], [32768, 514, 1028]]], dtype=np.uint16)
    data = b"P6 2 1 65535\n" + vals.astype(">u2").tobytes()
    got = decode_ppm(data)
    want = (vals.astype(np.int64) * 255 // 65535).astype(np.uint8)
    assert np.array_equal(got, want)
    # sub-8-bit maxval: 1-byte samples rescaled to full range
    data = b"P6 2 1 15\n" + bytes([0, 5, 15, 1, 7, 8])
    got = decode_ppm(data)
    assert got.ravel().tolist() == [v * 255 // 15 for v in [0, 5, 15, 1, 7, 8]]


def test_png_16bit_decode():
    import struct
    import zlib

    import numpy as np

    from monocator_ray.stages.media import _png_chunk, _PNG_SIG, decode_png

    # 16-bit RGB, filter 0 rows: decode takes the high byte
    rng = np.random.RandomState(3)
    px16 = rng.randint(0, 65536, size=(4, 5, 3), dtype=np.uint16)
    raw = b"".join(b"\x00" + row.astype(">u2").tobytes() for row in px16)
    blob = (_PNG_SIG
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 16, 2, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))
    got = decode_png(blob)
    assert np.array_equal(got, (px16 >> 8).astype(np.uint8))
    # 16-bit gray with the Sub filter: PNG filters run on BYTES with
    # bpp = 2 — a Sub-filtered row reconstructs per byte lane
    g16 = np.array([[1000, 2000, 3000, 4000]], dtype=np.uint16)
    row = g16[0].astype(">u2").tobytes()
    rb = np.frombuffer(row, np.uint8).astype(np.int32).reshape(4, 2)
    filtered = np.empty_like(rb)
    filtered[0] = rb[0]
    filtered[1:] = (rb[1:] - rb[:-1]) & 255
    raw = b"\x01" + filtered.astype(np.uint8).tobytes()
    blob = (_PNG_SIG
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 1, 16, 0, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))
    got = decode_png(blob)
    want8 = (g16 >> 8).astype(np.uint8)
    assert np.array_equal(got, np.repeat(want8[:, :, None], 3, axis=2))
    # 16-bit palette is invalid PNG -> stays gated
    import pytest as _pytest

    blob = (_PNG_SIG
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 3, 0, 0, 0))
            + _png_chunk(b"IEND", b""))
    with _pytest.raises(NotImplementedError):
        decode_png(blob)


def test_wav_format_family():
    import struct

    import numpy as np

    from monocator_ray.stages.media import decode_wav

    def wav(fmt, channels, rate, bits, body, fmt_extra=b""):
        fmt_body = struct.pack("<HHIIHH", fmt, channels, rate,
                               rate * channels * bits // 8,
                               channels * bits // 8, bits) + fmt_extra
        return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(body))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
                + b"data" + struct.pack("<I", len(body)) + body)

    # 8-bit unsigned PCM
    got, rate = decode_wav(wav(1, 1, 8000, 8, bytes([0, 128, 255])))
    assert rate == 8000
    assert np.allclose(got, [(0 - 128) / 128, 0.0, (255 - 128) / 128])
    # 24-bit packed PCM incl. negative (sign-extend bit 23)
    vals = [8388607, -8388608, 0, -1]
    body = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    got, _ = decode_wav(wav(1, 1, 44100, 24, body))
    assert np.allclose(got, np.array(vals, np.float32) / 8388608.0)
    # 32-bit int PCM, stereo downmix
    body = np.array([2**31 - 1, 2**31 - 1, -2**31, 2**31 - 1], "<i4").tobytes()
    got, _ = decode_wav(wav(1, 2, 48000, 32, body))
    assert len(got) == 2 and abs(got[0] - 1.0) < 1e-6 and abs(got[1]) < 0.51
    # IEEE float32 / float64
    body = np.array([0.5, -0.25], "<f4").tobytes()
    got, _ = decode_wav(wav(3, 1, 16000, 32, body))
    assert np.allclose(got, [0.5, -0.25])
    body = np.array([0.125], "<f8").tobytes()
    got, _ = decode_wav(wav(3, 1, 16000, 64, body))
    assert np.allclose(got, [0.125])
    # WAVE_FORMAT_EXTENSIBLE wrapping PCM16 (SubFormat leading uint16 = 1)
    sub = struct.pack("<H", 1) + b"\x00\x00" + bytes(12)
    extra = struct.pack("<HHI", 22, 16, 0x4) + sub
    body = np.array([16384, -16384], "<i2").tobytes()
    got, _ = decode_wav(wav(0xFFFE, 1, 22050, 16, body, fmt_extra=extra))
    assert np.allclose(got, [0.5, -0.5])
    # G.711 mu-law / A-law expand bit-identically to the audioop oracle
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")  # audioop deprecated in 3.11
        import audioop

    allb = bytes(range(256))
    got, _ = decode_wav(wav(7, 1, 8000, 8, allb))  # mu-law
    ref = np.frombuffer(audioop.ulaw2lin(allb, 2), "<i2")
    assert np.array_equal((got * 32768.0).astype(np.int16), ref)
    got, _ = decode_wav(wav(6, 1, 8000, 8, allb))  # A-law
    ref = np.frombuffer(audioop.alaw2lin(allb, 2), "<i2")
    assert np.array_equal((got * 32768.0).astype(np.int16), ref)
    # compressed codings stay gated (IMA + MS ADPCM decode — see their
    # tests; GSM / MP3-in-WAV do not)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_wav(wav(0x31, 1, 8000, 0, b"\x00\x00"))  # GSM 6.10
    with _pytest.raises(NotImplementedError):
        decode_wav(wav(0x55, 1, 8000, 0, b"\x00\x00"))  # MP3-in-WAV


def test_ima_adpcm_decode():
    import struct
    import warnings as _warnings

    import numpy as np

    from monocator_ray.stages.media import _ima_adpcm_blocks, decode_wav

    # core recursion pinned to audioop's Intel/DVI ADPCM (same step/index
    # tables and shift-form diff, state seeded (0, 0))
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        import audioop

    rng = np.random.RandomState(5)
    nib = rng.randint(0, 16, size=200).astype(np.uint8)
    packed = bytes((int(nib[2 * i]) << 4) | int(nib[2 * i + 1])
                   for i in range(100))  # audioop: high nibble first
    ref = np.frombuffer(audioop.adpcm2lin(packed, 2, None)[0], "<i2")
    got = _ima_adpcm_blocks(nib[None, :], np.array([0]), np.array([0]))[0, 1:]
    assert np.array_equal(got, ref)

    # full WAV container: mono, one block, header seeds (pred, index)
    def wav_adpcm(channels, rate, block_align, body):
        fmt_body = struct.pack("<HHIIHH", 0x11, channels, rate,
                               rate, block_align, 4) + struct.pack("<HH", 2, 0)
        return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(body))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
                + b"data" + struct.pack("<I", len(body)) + body)

    data_bytes = bytes([0x21, 0x87, 0xFF, 0x00])  # 8 nibbles, low first
    hdr = struct.pack("<hBB", 1000, 20, 0)
    got, rate = decode_wav(wav_adpcm(1, 8000, 8, hdr + data_bytes))
    assert rate == 8000 and len(got) == 9  # seed + 8 nibbles
    nibs = []
    for b in data_bytes:
        nibs += [b & 0x0F, b >> 4]
    want = _ima_adpcm_blocks(np.array([nibs], np.uint8),
                             np.array([1000]), np.array([20]))[0]
    assert np.array_equal((got * 32768.0).astype(np.int16), want)

    # stereo: per-channel 4-byte headers then alternating 4-byte groups
    h0 = struct.pack("<hBB", 500, 10, 0)
    h1 = struct.pack("<hBB", -500, 30, 0)
    g0, g1 = bytes([0x11, 0x22, 0x33, 0x44]), bytes([0x88, 0x99, 0xAA, 0xBB])
    got, _ = decode_wav(wav_adpcm(2, 8000, 16, h0 + h1 + g0 + g1))
    n0 = []
    n1 = []
    for b in g0:
        n0 += [b & 0x0F, b >> 4]
    for b in g1:
        n1 += [b & 0x0F, b >> 4]
    w0 = _ima_adpcm_blocks(np.array([n0], np.uint8), np.array([500]), np.array([10]))[0]
    w1 = _ima_adpcm_blocks(np.array([n1], np.uint8), np.array([-500]), np.array([30]))[0]
    want = (w0.astype(np.float64) + w1.astype(np.float64)) / 2 / 32768.0
    assert np.allclose(got, want.astype(np.float32))


def test_ms_adpcm_decode():
    import struct

    import numpy as np

    from monocator_ray.stages.media import _ms_adpcm_blocks, decode_wav

    # independent scalar reference, clean-room from the published MS
    # ADPCM constants (coef table, adaptation table, >>8 predictor,
    # delta floor 16)
    ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]
    COEF = [(256, 0), (512, -256), (0, 0), (192, 64),
            (240, 0), (460, -208), (392, -232)]

    def ref_decode(nibs, pidx, delta, s1, s2):
        c1, c2 = COEF[pidx]
        out = [s2, s1]
        for code in nibs:
            signed = code - 16 if code >= 8 else code
            pred = (s1 * c1 + s2 * c2) >> 8
            samp = max(-32768, min(32767, pred + signed * delta))
            delta = max(16, (ADAPT[code] * delta) >> 8)
            s2, s1 = s1, samp
            out.append(samp)
        return out

    rng = np.random.RandomState(9)
    nibs = rng.randint(0, 16, size=64).astype(np.uint8)
    for pidx, d0, s1, s2 in [(0, 64, 100, -100), (3, 500, -3000, 2000),
                             (6, 16, 32767, -32768)]:
        got = _ms_adpcm_blocks(nibs[None, :], np.array([pidx]),
                               np.array([d0]), np.array([s1]), np.array([s2]))[0]
        assert got.tolist() == ref_decode(nibs.tolist(), pidx, d0, s1, s2)

    # full WAV container, mono: 7-byte header + high-first nibbles
    def wav_ms(channels, rate, block_align, body):
        fmt_body = (struct.pack("<HHIIHH", 0x02, channels, rate, rate,
                                block_align, 4)
                    + struct.pack("<HHH", 4 + 4 * 7, 500, 7)
                    + b"".join(struct.pack("<hh", a, b) for a, b in COEF))
        return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(body))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
                + b"data" + struct.pack("<I", len(body)) + body)

    hdr = (struct.pack("<B", 1) + struct.pack("<h", 300)
           + struct.pack("<h", 1000) + struct.pack("<h", -2000))
    body_nibs = bytes([0x12, 0xF3, 0x08, 0x7C])
    got, rate = decode_wav(wav_ms(1, 22050, 7 + 4, hdr + body_nibs))
    assert rate == 22050 and len(got) == 2 + 8
    nib_seq = []
    for b in body_nibs:
        nib_seq += [b >> 4, b & 0x0F]
    want = ref_decode(nib_seq, 1, 300, 1000, -2000)
    assert np.array_equal((got * 32768.0).astype(np.int16),
                          np.array(want, np.int16))

    # stereo: interleaved per-channel headers and alternating nibbles
    hdr2 = (struct.pack("<BB", 0, 2) + struct.pack("<hh", 200, 400)
            + struct.pack("<hh", 800, -800) + struct.pack("<hh", -1600, 1600))
    body2 = bytes([0x5A, 0x3C])  # ch0 nibbles: 5,3  ch1 nibbles: A,C
    got, _ = decode_wav(wav_ms(2, 8000, 14 + 2, hdr2 + body2))
    w0 = ref_decode([0x5, 0x3], 0, 200, 800, -1600)
    w1 = ref_decode([0xA, 0xC], 2, 400, -800, 1600)
    want = (np.array(w0, np.float64) + np.array(w1, np.float64)) / 2 / 32768.0
    assert np.allclose(got, want.astype(np.float32))


def test_tiff_decode_family():
    import numpy as np

    from monocator_ray.stages.media import (
        PureCodec, decode_tiff, encode_tiff as _write_tiff,
    )

    rng = np.random.RandomState(13)
    rgb = rng.randint(0, 256, size=(9, 13, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, size=(7, 5), dtype=np.uint8)

    # uncompressed, both byte orders
    for bo in ("<", ">"):
        assert np.array_equal(decode_tiff(_write_tiff(rgb, bo=bo)), rgb)
    # gray replicates to RGB; WhiteIsZero inverts
    got = decode_tiff(_write_tiff(gray))
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))
    got = decode_tiff(_write_tiff(gray, photometric=0))
    assert np.array_equal(got, np.repeat((255 - gray)[:, :, None], 3, axis=2))
    # PackBits incl. replicate runs (hand-built strip)
    assert np.array_equal(decode_tiff(_write_tiff(rgb, compression=32773)), rgb)
    from monocator_ray.stages.media import _packbits_decode

    assert _packbits_decode(bytes([0xFE, 7, 2, 1, 2, 3]), 6) == bytes([7, 7, 7, 1, 2, 3])
    # LZW, plain and with the horizontal predictor; data big enough to
    # cross the 9->10 bit width boundary
    big = rng.randint(0, 256, size=(40, 40, 3), dtype=np.uint8)
    assert np.array_equal(decode_tiff(_write_tiff(big, compression=5)), big)
    assert np.array_equal(
        decode_tiff(_write_tiff(big, compression=5, predictor=2)), big)
    # hand-pinned tiny LZW stream: Clear,'A',KwKwK(258),EOI == b'AAA'
    from monocator_ray.stages.media import _lzw_decode_tiff

    assert _lzw_decode_tiff(bytes([0x80, 0x10, 0x60, 0x50, 0x10]), 3) == b"AAA"
    # sniff + dispatch
    c = PureCodec()
    blob = _write_tiff(rgb)
    assert c.sniff(blob) == "image/tiff"
    assert np.array_equal(c.decode_image(blob), rgb)
    # exotic variants stay gated
    import pytest as _pytest

    bad = bytearray(_write_tiff(rgb))
    # compression tag value lives in the IFD; flip it to CCITT (2)
    blob2 = _write_tiff(rgb, compression=1).replace(
        bytes([3, 1, 3, 0, 1, 0, 0, 0, 1, 0]), bytes([3, 1, 3, 0, 1, 0, 0, 0, 2, 0]), 1)
    with _pytest.raises((NotImplementedError, ValueError)):
        decode_tiff(bytes(blob2))


def test_ico_roundtrip_dib_and_png_entries():
    """ICO/CUR favicon container: 32-bpp DIB and PNG entries roundtrip
    bit-exactly, the largest frame wins decode_ico, odd widths exercise
    the 4-byte row stride, and the 0-means-256 directory byte works."""
    import numpy as np

    from monocator_ray.stages.media import (
        PureCodec, decode_ico, decode_ico_frames, encode_ico,
    )

    rng = np.random.default_rng(3)
    small = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    big = rng.integers(0, 256, (32, 31, 3), dtype=np.uint8)  # odd width
    ico = encode_ico([small, big])
    assert PureCodec().sniff(ico) == "image/x-icon"
    frames = decode_ico_frames(ico)
    assert np.array_equal(frames[0], small) and np.array_equal(frames[1], big)
    assert np.array_equal(decode_ico(ico), big)
    assert np.array_equal(PureCodec().decode_image(ico), big)
    # PNG entries (Vista+ mixed containers)
    f2 = decode_ico_frames(encode_ico([small, big], png=True))
    assert np.array_equal(f2[0], small) and np.array_equal(f2[1], big)
    # 256-px edge: the directory width/height byte stores 0
    full = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    assert np.array_equal(decode_ico(encode_ico([full])), full)


def test_ico_paletted_dib_gated():
    """Paletted DIB entries are a documented gate, not silent garbage."""
    import struct

    import numpy as np
    import pytest

    from monocator_ray.stages.media import decode_ico_frames, encode_ico

    rng = np.random.default_rng(4)
    ico = bytearray(encode_ico([rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)]))
    # flip the DIB's bpp field (offset: 6 dir + 16 entry + 14 into header)
    off = 6 + 16
    struct.pack_into("<H", ico, off + 14, 8)
    with pytest.raises(NotImplementedError):
        decode_ico_frames(bytes(ico))


# ---------------------------------------------------------- TrapFilter ----


def _trap_urls(urls):
    import pyarrow as pa

    from monocator_ray.stages.filters import TrapFilter

    t = pa.table({"url": pa.array(urls, pa.string())})
    out = TrapFilter(annotate=True)(t)
    return dict(zip(urls, out["trap"].to_pylist()))


def test_trap_filter_shapes():
    flags = _trap_urls([
        "http://ok.example/a/b/c",                          # clean
        "http://ok.example/" + "x/" * 20,                   # too deep
        "http://ok.example/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9",  # params
        "http://ok.example/p;jsessionid=ABC123",            # session id
        "http://ok.example/p?phpsessid=deadbeef",           # session id
        "http://ok.example/h/" + "g" * 16 + "h" * 16,       # long but not hex
        "http://ok.example/h/" + "0123456789abcdef" * 2,    # 32-char hex run
        "http://ok.example/2024/01/02/2024/01/03/x",        # calendar
        "http://ok.example/a/a/a/x",                        # /a/a/a repeat
        "http://ok.example/a/b/a/b/x",                      # alternating: ok
        "http://ok.example/?" + "q" * 3000,                 # oversized
    ])
    assert flags["http://ok.example/a/b/c"] is False
    assert flags["http://ok.example/" + "x/" * 20] is True
    assert flags["http://ok.example/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9"] is True
    assert flags["http://ok.example/p;jsessionid=ABC123"] is True
    assert flags["http://ok.example/p?phpsessid=deadbeef"] is True
    assert flags["http://ok.example/h/" + "g" * 16 + "h" * 16] is False
    assert flags["http://ok.example/h/" + "0123456789abcdef" * 2] is True
    assert flags["http://ok.example/2024/01/02/2024/01/03/x"] is True
    assert flags["http://ok.example/a/a/a/x"] is True
    assert flags["http://ok.example/a/b/a/b/x"] is False
    assert flags["http://ok.example/?" + "q" * 3000] is True


def test_trap_filter_drops_rows_and_host_not_counted():
    import pyarrow as pa

    from monocator_ray.stages.filters import TrapFilter

    # a host full of dots/digits must not trip PATH heuristics
    t = pa.table({"url": pa.array(
        ["http://123.45.67.89:8080/ok", "http://deep.example/a/a/a/a/x"])})
    out = TrapFilter()(t)
    assert out["url"].to_pylist() == ["http://123.45.67.89:8080/ok"]


def test_trap_filter_empty_batch():
    import pyarrow as pa

    from monocator_ray.stages.filters import TrapFilter

    t = pa.table({"url": pa.array([], pa.string())})
    assert TrapFilter()(t).num_rows == 0
    assert "trap" in TrapFilter(annotate=True)(t).column_names
