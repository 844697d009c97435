"""HtmlExtractor tests (stages/textfilters.py)."""

import pyarrow as pa

from open_telemetry_opentelemetry_collector_contrib_ray.stages.textfilters import (
    HtmlExtractor,
)


def _t(htmls):
    return pa.table({"text": pa.array(htmls, pa.string())})


def test_script_style_comment_bodies_dropped_whole():
    out = HtmlExtractor()(_t([
        '<p>keep</p><script>var a = "1 < 2 </p> trap";</script>tail',
        "<style>p { color: red; }</style>x<!-- <p>never</p> -->y",
    ]))
    assert out.column("text").to_pylist() == ["keep tail", "xy"]


def test_block_tags_become_separators_inline_tags_vanish():
    out = HtmlExtractor()(_t([
        "<h1>Title</h1><p>one <b>bold</b> two</p><ul><li>a</li><li>b</li></ul>",
        "line<br/>break<br >no",  # <br > is a plain tag, <br/> a block sep
    ]))
    assert out.column("text").to_pylist() == [
        "Title one bold two a b", "line break no"]


def test_entity_chain_single_pass_and_amp_last():
    out = HtmlExtractor()(_t([
        "&lt;tag&gt; &quot;q&quot; &#39;a&#39; &apos;b&apos;&nbsp;c",
        "&amp;amp; &amp;lt;",  # single-pass: decodes to literal entities
    ]))
    assert out.column("text").to_pylist() == [
        '<tag> "q" \'a\' \'b\' c', "&amp; &lt;"]


def test_numeric_entities_sparse_python_path():
    t = _t(["&#65;&#x42;", "plain &amp; ascii", None])
    assert HtmlExtractor()(t).column("text").to_pylist() == [
        "&#65;&#x42;", "plain & ascii", ""]
    assert HtmlExtractor(numeric_entities=True)(t) \
        .column("text").to_pylist() == ["AB", "plain & ascii", ""]


def test_count_links_on_raw_html_and_out_col():
    t = _t(['<a href="u1">x</a><a href="u2">y</a>', "none"])
    out = HtmlExtractor(out_col="body", count_links=True)(t)
    assert out.column("n_links").to_pylist() == [2, 0]
    assert out.column("body").to_pylist() == ["xy", "none"]  # <a> is inline
    assert out.column("text").to_pylist() == t.column("text").to_pylist()


def test_declarative_html_extract_step():
    import ray.data as rd

    from open_telemetry_opentelemetry_collector_contrib_ray.pipelines.builder import (
        build_pipeline,
    )

    ds = rd.from_arrow(_t(['<p>hi</p><a href="u">l</a>']))
    out = build_pipeline(ds, [
        {"type": "html_extract", "count_links": True},
    ]).to_pandas()
    assert out["text"].tolist() == ["hi l"]
    assert out["n_links"].tolist() == [1]
