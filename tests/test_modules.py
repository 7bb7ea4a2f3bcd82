"""Non-web module surface (TLS/DNS/SMTP entity model + dispatch flow,
reference TODO.MD:3-51) and screenshot-mode triggers (TODO.MD:62-67)."""

import pyarrow as pa
import pytest

from monocator_ray.stages.modules import (
    SINGLE_VERSION_SCAN,
    TLS_SCAN,
    TLS_VERSIONS,
    NetworkUnavailable,
    TlsModule,
    convert_to_entity,
    save_visit_result,
)


def test_tls_module_stub_raises_without_network():
    mod = TlsModule()
    with pytest.raises(NetworkUnavailable):
        mod.visit("example.com", ["192.0.2.1"])


def test_tls_module_with_injected_prober(tmp_path):
    calls = []

    def fake_probe(ip, version):
        calls.append((ip, version))
        return {"supported": version in ("tls13", "tls12"), "cipher_suite": "TLS_AES_128_GCM_SHA256",
                "error": "", "millis": 5}

    mod = TlsModule(probe_fn=fake_probe)
    t = mod.visit("example.com", ["192.0.2.1", "192.0.2.2"])
    assert t.schema.equals(TLS_SCAN)
    assert t.num_rows == 2
    assert t["connect_ok"].to_pylist() == [True, True]
    scans = t["scans"][0].as_py()
    assert len(scans) == len(TLS_VERSIONS)
    assert dict(scans)["tls13"]["supported"] is True
    # FullScanCache semantics: same ip scanned once (TODO.MD:41)
    mod.visit("other.example", ["192.0.2.1"])
    assert len(calls) == 2 * len(TLS_VERSIONS)

    # convertToEntity + VisitService.save flow (TODO.MD:44-51)
    ent = convert_to_entity(t, TLS_SCAN, "tls")
    save_visit_result(str(tmp_path), "example.com", {"tls_scan": ent})
    import pyarrow.parquet as pq

    back = pq.read_table(str(tmp_path / "tls_scan" / "example.com.parquet"))
    assert back.num_rows == 2


def test_single_version_scan_struct_shape():
    s = pa.scalar(
        {"supported": True, "cipher_suite": "x", "error": "", "millis": 1},
        type=SINGLE_VERSION_SCAN,
    )
    assert s["supported"].as_py() is True


@pytest.mark.usefixtures("ray_session")
def test_screenshot_modes(tmp_path):
    from monocator_ray import report
    from monocator_ray.crawl.driver import CrawlConfig, crawl
    from monocator_ray.sources.synth import SynthSpec, write_synth_pages

    d = tmp_path / "web"
    write_synth_pages(str(d), 120, 5, 2, use_ray=False)
    spec = SynthSpec(120, 5)
    cfg = CrawlConfig(num_shards=2, budget_per_epoch=64, max_depth=3, link_cap=8,
                      num_buckets=2, fetch_concurrency=2, extract_concurrency=2)
    out1 = tmp_path / "run1"
    out2 = tmp_path / "run2"
    crawl(spec.seeds(5), str(d), str(out1), cfg)
    crawl(spec.seeds(5), str(d), str(out2), cfg)

    n_pages = report.screenshot_candidates(str(out1), "always").count()
    assert n_pages > 0
    # identical runs: nothing changed -> no screenshots due
    changed = report.screenshot_candidates(str(out2), "if_html_changed", str(out1)).count()
    assert changed == 0
    # no previous run: everything is "changed"
    all_changed = report.screenshot_candidates(str(out1), "if_html_changed", None).count()
    assert all_changed == n_pages
    with pytest.raises(NotImplementedError):
        report.screenshot_candidates(str(out1), "if_suspicious")
    with pytest.raises(ValueError):
        report.screenshot_candidates(str(out1), "nope")
