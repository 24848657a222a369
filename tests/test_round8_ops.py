"""Round-8 operators: HTML boilerplate extraction, perceptual image
dedup, byte-level BPE."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# html_extract_text
# --------------------------------------------------------------------------


def _extract(spark, html: str, **kw):
    from bb_bigdata_log_tools_spark.operators.html import html_extract_text

    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return html_extract_text(df, **kw).collect()[0]


def test_html_strips_chrome_and_nonrendered(spark):
    """script/style/nav/header/footer/aside/comment content never
    reaches the output, even when it is long enough to pass the
    length gate."""
    html = (
        "<html><head><style>p{color:red} /* long style payload text that"
        " would pass the length gate */</style>"
        "<script>var leaked = 'script payload words that would pass the"
        " gate too';</script></head><body>"
        "<header>A very long header chrome sentence that must vanish"
        " entirely.</header>"
        "<nav><a href='/'>Home</a> and some nav prose that is long enough"
        " to pass the gate</nav>"
        "<!-- a long editorial comment that must also vanish from the"
        " output entirely -->"
        "<p>The single real content paragraph with plenty of prose.</p>"
        "<aside>Sidebar recommendation text, also long enough to pass"
        " the gate.</aside>"
        "<footer>Copyright footer sentence long enough to pass.</footer>"
        "</body></html>"
    )
    r = _extract(spark, html)
    assert r.text == "The single real content paragraph with plenty of prose."
    assert r.n_kept == 1
    for leaked in ("script payload", "style payload", "header chrome",
                   "nav prose", "editorial comment", "Sidebar", "Copyright"):
        assert leaked not in r.text


def test_html_link_density_and_length_gates(spark):
    """A link-only block is dropped at any length; a short stub is
    dropped; prose with a minority inline link is kept with the link
    text inlined."""
    html = (
        "<div><p><a href='/a'>a pure link list item long enough to pass"
        " the length gate alone</a></p>"
        "<p>tiny</p>"
        "<p>Prose sentence with one <a href='/r'>small link</a> inside"
        " a much longer run of ordinary words.</p></div>"
    )
    r = _extract(spark, html)
    assert r.n_kept == 1
    assert "small link" in r.text and "pure link list" not in r.text
    assert r.kept_chars == len(r.text)
    assert r.dropped_chars > 0


def test_html_entities_and_whitespace(spark):
    """Entities decode once (no double-decode of &amp;lt;) and runs of
    whitespace collapse."""
    html = (
        "<p>Fish &amp; chips &quot;cost&quot; &lt;5 &amp;lt;never"
        " re-decoded&#39;   with   spaced    out words here.</p>"
    )
    r = _extract(spark, html)
    assert r.text == (
        "Fish & chips \"cost\" <5 &lt;never re-decoded'"
        " with spaced out words here."
    )


def test_html_empty_and_tagless(spark):
    """No HTML at all = one block of plain text; empty string = no
    blocks, empty accounting."""
    r = _extract(spark, "Just plain text, no markup, long enough to keep.")
    assert r.n_blocks == 1 and r.n_kept == 1
    assert r.text == "Just plain text, no markup, long enough to keep."
    r2 = _extract(spark, "")
    assert (r2.n_blocks, r2.n_kept, r2.kept_chars, r2.dropped_chars,
            r2.text) == (0, 0, 0, 0, "")


def test_html_extract_plan_is_scan_parallel(spark):
    """The extraction is a single projection: no exchange in the
    unsorted plan (the 100 TB contract — per-document work only)."""
    from bb_bigdata_log_tools_spark.operators.html import html_extract_text

    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    plan = (
        html_extract_text(df, sort=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
