"""Frozen extractor unit tests (SURVEY.md §5.2.1; BASELINE.json:15
byte-identical mandate). These outputs are FROZEN — if any assertion
here ever needs changing, that's an extractor version bump, not a fix."""

from crawlfe.extract import extract_text


def test_basic_blocks():
    html = b"<html><body><p>hello</p><p>world</p></body></html>"
    assert extract_text(html) == "hello\nworld"


def test_script_style_skipped():
    html = (
        b"<html><head><script>var x=1;</script><style>.a{}</style>"
        b"<title>Ti</title></head><body><p>body</p></body></html>"
    )
    assert extract_text(html) == "Ti\nbody"


def test_entities_decoded():
    assert extract_text(b"<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_nbsp_collapses():
    # &nbsp; decodes to U+00A0 which str.split() treats as whitespace
    assert extract_text(b"<p>a&nbsp;&nbsp;b</p>") == "a b"


def test_whitespace_collapsed():
    assert extract_text(b"<p>  a \t\n  b  </p>\n\n<p> c </p>") == "a b\nc"


def test_inline_tags_no_break():
    assert extract_text(b"<p><b>bo</b>ld <i>it</i>alic</p>") == "bold italic"


def test_multibyte_utf8():
    assert extract_text("<p>café 中文 données</p>".encode()) == "café 中文 données"


def test_invalid_utf8_replaced():
    out = extract_text(b"<p>ab\xff\xfecd</p>")
    assert out == "ab��cd"


def test_nested_skip_depth():
    html = b"<div><script>a<script>b</script>c</script>x</div><p>keep</p>"
    assert "keep" in extract_text(html)


def test_empty_and_none():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"<html><body></body></html>") == ""


def test_self_closing_br_breaks_line():
    assert extract_text(b"<p>a<br/>b</p>") == "a\nb"


def test_deterministic_golden():
    # pinned golden value: any algorithm drift fails loudly
    html = (
        b"<html><head><title>T1 &amp; x</title><script>s</script></head>"
        b"<body><div><p><b>alpha</b> beta</p></div><li>g</li>"
        b"<pre>p\n  q</pre></body></html>"
    )
    assert extract_text(html) == "T1 & x\nalpha beta\ng\np q"
