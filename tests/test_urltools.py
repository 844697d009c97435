"""URL canonicalization (stages/urltools.py)."""

import pyarrow as pa

from open_telemetry_opentelemetry_collector_contrib_ray.stages.urltools import UrlNormalizer


def _norm(urls):
    out = UrlNormalizer()(pa.table({"url": pa.array(urls, pa.string())}))
    return (out.column("url_norm").to_pylist(),
            out.column("host").to_pylist())


def test_lowercase_prefix_keeps_path_case():
    n, h = _norm(["HTTP://WWW.Example.COM/CaseSensitive/Path"])
    assert n == ["http://www.example.com/CaseSensitive/Path"]
    assert h == ["www.example.com"]


def test_fragment_tracking_and_default_ports():
    n, _ = _norm([
        "http://a.com:80/x?utm_source=s&id=1&utm_campaign=c#frag",
        "https://b.com:443/y?fbclid=f&q=2",
        "https://c.com:8443/z",
        "http://d.com:443/kept",  # :443 is NOT default for http
    ])
    assert n == ["http://a.com/x?id=1", "https://b.com/y?q=2",
                 "https://c.com:8443/z", "http://d.com:443/kept"]


def test_trailing_slash_and_bare_host():
    n, h = _norm(["http://e.com/", "http://f.com/?utm_x=1"])
    assert n == ["http://e.com", "http://f.com"]
    assert h == ["e.com", "f.com"]


def test_non_urls_and_nulls_pass_through():
    n, h = _norm(["not a url", None, ""])
    assert n == ["not a url", "", ""]
    assert h == ["", "", ""]
