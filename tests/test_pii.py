"""PII scrub stage (stages/pii.py)."""

import pyarrow as pa
import pytest
import ray.data

from open_telemetry_opentelemetry_collector_contrib_ray.stages.pii import (
    PiiScrubber,
    scrub_pii,
)


def _run(texts, **kw):
    t = pa.table({"text": pa.array(texts, pa.string())})
    return PiiScrubber(**kw)(t)


def test_each_category():
    out = _run(["mail bob.smith+x@corp.example.org now",
                "ssn 123-45-6789 here",
                "host 10.0.255.7 up",
                "call 555-867-5309 or 555.867.5309"])
    texts = out.column("text").to_pylist()
    assert texts[0] == "mail <EMAIL> now"
    assert texts[1] == "ssn <SSN> here"
    assert texts[2] == "host <IP> up"
    assert texts[3] == "call <PHONE> or <PHONE>"
    assert out.column("n_email").to_pylist() == [1, 0, 0, 0]
    assert out.column("n_ssn").to_pylist() == [0, 1, 0, 0]
    assert out.column("n_ipv4").to_pylist() == [0, 0, 1, 0]
    assert out.column("n_phone").to_pylist() == [0, 0, 0, 2]


def test_sequential_no_double_count():
    # an SSN is consumed before the phone pattern can see its digits;
    # an email's IP-shaped host is consumed before the ipv4 pattern
    out = _run(["a 123-45-6789 b", "x@1.2.3.4a.com y"])
    assert out.column("n_phone").to_pylist() == [0, 0]
    assert out.column("n_ssn").to_pylist() == [1, 0]
    assert out.column("n_ipv4").to_pylist() == [0, 0]
    assert out.column("n_email").to_pylist() == [0, 1]


def test_clean_text_untouched_and_nulls():
    out = _run(["just words here", None])
    assert out.column("text").to_pylist() == ["just words here", None]
    assert out.column("n_email").to_pylist() == [0, None]


def test_unknown_category_is_loud():
    with pytest.raises(KeyError, match="unknown PII categories"):
        PiiScrubber(categories=["email", "passport"])


def test_dataset_level():
    ds = ray.data.from_items(
        [{"doc_id": i, "text": f"u{i}@ex.com says hi"} for i in range(10)])
    out = scrub_pii(ds, categories=["email"]).to_pandas()
    assert (out.text == "<EMAIL> says hi").all()
    assert out.n_email.sum() == 10
    assert "n_phone" not in out.columns
