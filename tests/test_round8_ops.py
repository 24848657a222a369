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


# --------------------------------------------------------------------------
# image_dhash / dedup_image / hamming_pairs
# --------------------------------------------------------------------------


def test_dhash_invariances():
    """Same pixels across codecs hash identically; brightness shifts
    are free; a one-cell edit costs ~1 bit; lossy JPEG noise stays
    inside the near-dup band; distinct images are far."""
    from bb_bigdata_log_tools_spark.operators.jpegcodec import make_jpeg
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        image_dhash_value,
        make_bmp,
        make_png_rows,
    )
    from bb_bigdata_log_tools_spark.registry_misc import _dhash_rows

    W, H = 36, 24
    rows_a, rows_ab, rows_ae, rows_b, rows_c = _dhash_rows()
    h = lambda p: image_dhash_value(p)
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    ha = h(make_bmp(W, H, rows_a))
    assert h(make_png_rows(W, H, rows_a)) == ha
    assert h(make_jpeg(W, H, rows_a)) == ha
    assert h(make_bmp(W, H, rows_ab)) == ha          # brightness shift
    assert ham(h(make_bmp(W, H, rows_ae)), ha) == 1  # one-cell edit
    hc = h(make_bmp(W, H, rows_c))
    assert 0 < ham(h(make_jpeg(W, H, rows_c)), hc) <= 6  # codec noise
    assert ham(h(make_bmp(W, H, rows_b)), ha) > 20       # distinct
    assert image_dhash_value(b"junk") is None


def test_hamming_pairs_complete_vs_bruteforce(spark):
    """The pigeonhole-blocked join returns EXACTLY the brute-force
    pair set on seeded 64-bit hashes with both near and far pairs —
    including hashes with bit 63 set (negative longs)."""
    import random

    from bb_bigdata_log_tools_spark.operators.dedup import hamming_pairs

    rng = random.Random(8)
    base = [rng.getrandbits(64) for _ in range(12)]
    hashes = []
    for i, b in enumerate(base):
        hashes.append((2 * i, b))
        flip = b
        for _ in range(rng.randrange(0, 9)):   # 0..8 bit flips
            flip ^= 1 << rng.randrange(64)
        hashes.append((2 * i + 1, flip))
    signed = [(i, v - (1 << 64) if v >= 1 << 63 else v) for i, v in hashes]
    df = spark.createDataFrame(signed, "doc_id long, h long")
    got = {
        (r.id1, r.id2, r.hamming)
        for r in hamming_pairs(df, "h", 64, 6).collect()
    }
    uns = dict(hashes)
    want = {
        (a, b, bin(uns[a] ^ uns[b]).count("1"))
        for a in uns
        for b in uns
        if a < b and bin(uns[a] ^ uns[b]).count("1") <= 6
    }
    assert got == want and len(want) > 0


def test_hamming_pairs_guards(spark):
    from bb_bigdata_log_tools_spark.operators.dedup import hamming_pairs

    df = spark.createDataFrame([(1, 5)], "doc_id long, h long")
    with pytest.raises(ValueError, match="blocking would degenerate"):
        hamming_pairs(df, "h", 64, 12)          # 13 chunks < 5 bits
    with pytest.raises(ValueError, match="chunks but the hash"):
        hamming_pairs(df, "h", 8, 11)
    with pytest.raises(ValueError, match="salts must be >= 1"):
        hamming_pairs(df, "h", 64, 3, salts=0)  # was: silent zero pairs


def test_html_extract_null_page(spark):
    """NULL html is the empty page in BOTH engines (round-9 ADVICE
    fix): without the coalesce, Spark's size(null) and DuckDB's
    len(NULL) disagree on n_blocks."""
    import duckdb

    from bb_bigdata_log_tools_spark.operators.html import (
        html_extract_metadata,
        html_extract_sql,
        html_extract_text,
    )

    pages = [(1, None), (2, "<p>plain prose long enough to keep here</p>")]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = [tuple(r) for r in html_extract_text(df).collect()]
    assert got[0] == (1, 0, 0, 0, 0, "")

    con = duckdb.connect()
    con.execute("CREATE TABLE pages (doc_id BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", pages)
    want = con.execute(
        html_extract_sql("SELECT doc_id, html FROM pages")
    ).fetchall()
    assert got == [tuple(r) for r in want]

    meta = html_extract_metadata(df).collect()
    assert tuple(meta[0]) == (1, "", "", "", "")  # '' never NULL


def test_dedup_image_plan_no_cartesian(spark):
    """The image near-dup join is an equi-join on (chunk, salt) —
    never a cartesian/broadcast-nested-loop."""
    from bb_bigdata_log_tools_spark.operators.multimodal import dedup_image
    from bb_bigdata_log_tools_spark.registry_misc import _dhash_media_df

    plan = (
        dedup_image(_dhash_media_df(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# byte-level BPE
# --------------------------------------------------------------------------


def _ref_byte_bpe(text: str, n_merges: int):
    """Pure-Python byte-level BPE reference: regex pretokenization
    (same pattern), UTF-8 hex-pair alphabet, (freq DESC, pair ASC on
    left+\\x01+right) argmax, left-to-right non-overlapping merge."""
    import re

    from bb_bigdata_log_tools_spark.operators.textprep import (
        BYTE_PRETOKEN_PATTERN,
    )

    freqs: dict = {}
    for w in re.findall(BYTE_PRETOKEN_PATTERN, text):
        freqs[w] = freqs.get(w, 0) + 1
    hx = lambda w: w.encode("utf-8").hex().upper()
    toks = {w: tuple(hx(w)[i:i + 2] for i in range(0, len(hx(w)), 2))
            for w in freqs}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for w, f in freqs.items():
            t = toks[w]
            for i in range(len(t) - 1):
                pairs[(t[i], t[i + 1])] = pairs.get((t[i], t[i + 1]), 0) + f
        if not pairs:
            break
        (left, right), best_freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + "\x01" + kv[0][1])
        )
        merges.append((left, right, best_freq))

        def apply(t, L=left, R=right):
            out, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == L and t[i + 1] == R:
                    out.append(L + R)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            return tuple(out)

        toks = {w: apply(t) for w, t in toks.items()}
    return merges, toks, freqs


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6])
def test_bpe_bytes_matches_reference(spark, seed):
    """Seeded corpora — including multi-byte UTF-8 words and
    punctuation runs — through bpe_train_bytes vs the pure-Python
    byte-BPE reference; bpe_apply_bytes totals must equal the
    reference tokenization's totals."""
    import random

    from bb_bigdata_log_tools_spark.operators.textprep import (
        bpe_apply_bytes,
        bpe_train_bytes,
    )

    rng = random.Random(seed)
    vocab = ["ab", "a", "béé", "x!", "!!", "日本", "q9", "9"]
    words = [rng.choice(vocab) for _ in range(rng.randint(4, 20))]
    text = " ".join(words)
    n_merges = rng.randint(1, 5)
    expected, ref_toks, ref_freqs = _ref_byte_bpe(text, n_merges)

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [
        (r.left, r.right, r.pair_freq)
        for r in bpe_train_bytes(docs, n_merges=n_merges).collect()
    ]
    assert got == expected, (seed, text, got, expected)

    row = bpe_apply_bytes(docs, n_merges=n_merges).collect()[0]
    want_pre = sum(ref_freqs.values())
    want_tok = sum(len(t) * f for w, f in ref_freqs.items()
                   for t in [ref_toks[w]])
    assert (row.n_pretokens, row.n_tokens) == (want_pre, want_tok)


def test_bpe_bytes_total_coverage(spark):
    """The byte alphabet is total: every input byte is tokenized —
    n_tokens with zero merges equals the UTF-8 byte length."""
    from bb_bigdata_log_tools_spark.operators.textprep import bpe_apply_bytes

    text = "héllo wörld !!"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = bpe_apply_bytes(docs, n_merges=0).collect()[0]
    assert row.n_tokens == len(text.encode("utf-8"))


# --------------------------------------------------------------------------
# html_extract_links / dedup_image_cluster
# --------------------------------------------------------------------------


def test_html_extract_links_order_quotes_entities(spark):
    """Anchors come back in document order with both quote styles,
    normalized anchor text, internal/external flags, and nothing from
    comments."""
    from bb_bigdata_log_tools_spark.operators.html import html_extract_links

    html = (
        "<!-- <a href='/ghost'>never seen</a> -->"
        "<nav><a href=\"/\">Home</a></nav>"
        "<p>read <a href='/a/b'>the <b>guide</b> &amp; FAQ</a> or "
        "<a href=\"https://other.example/x\">an external site</a> or "
        "<a href='//cdn.example/y'>protocol-relative</a></p>"
    )
    df = spark.createDataFrame([(7, html)], "doc_id long, html string")
    rows = [tuple(r) for r in html_extract_links(df).collect()]
    assert rows == [
        (7, 0, "/", "Home", True),
        (7, 1, "/a/b", "the guide & FAQ", True),
        (7, 2, "https://other.example/x", "an external site", False),
        (7, 3, "//cdn.example/y", "protocol-relative", False),
    ]


def test_dedup_image_cluster_families(spark):
    """The fixture's three families resolve to three clusters keyed by
    their minimum doc_id; decoded=false payloads never appear."""
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        dedup_image_cluster,
    )
    from bb_bigdata_log_tools_spark.registry_misc import _dhash_media_df

    rows = {r.doc_id: r.cluster_id
            for r in dedup_image_cluster(_dhash_media_df(spark)).collect()}
    assert {rows[i] for i in range(0, 8)} == {0}    # A family
    assert rows[8] == 8 and rows[9] == 8            # B family
    assert {rows[i] for i in (10, 11, 12)} == {10}  # C family
    assert 13 not in rows and 14 not in rows        # audio + corrupt


# --------------------------------------------------------------------------
# cross-engine differential fuzz: random adversarial HTML through the
# Spark extractor vs the DuckDB rendering of the same algebra — the
# regex-dialect drift class (Java regex vs RE2) that a fixed fixture
# cannot sweep.
# --------------------------------------------------------------------------


def _random_html(rng):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    ents = ["&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;"]
    # every whitespace atom in the explicit cross-dialect class,
    # including \x0B (vertical tab): Java \s has it, RE2 \s does not —
    # the class in html._WS_CLASS must keep the engines identical here
    ws = [" ", "  ", "\t", "\n", "\x0b", "\f", "\r", "\r\n", " \x0b "]

    def prose(n):
        parts = [rng.choice(words) for _ in range(n)]
        if rng.random() < 0.5:
            parts.insert(rng.randrange(len(parts) + 1), rng.choice(ents))
        return rng.choice(ws).join(parts)

    frags = []
    for _ in range(rng.randint(2, 10)):
        kind = rng.randrange(9)
        if kind == 0:
            frags.append(f"<p>{prose(rng.randint(1, 15))}</p>")
        elif kind == 1:
            frags.append(f"<!-- {prose(rng.randint(0, 6))} -->")
        elif kind == 2:
            tag = rng.choice(["script", "style", "nav", "footer",
                              "header", "aside"])
            frags.append(f"<{tag}>{prose(rng.randint(0, 8))}</{tag}>")
        elif kind == 3:
            frags.append(
                f"<li><a href=\"/d/{rng.randrange(99)}\">"
                f"{prose(rng.randint(1, 4))}</a></li>"
            )
        elif kind == 4:
            frags.append(
                f"<p>{prose(rng.randint(3, 10))} "
                f"<a href='/x'>{prose(rng.randint(1, 3))}</a> "
                f"{prose(rng.randint(0, 8))}</p>"
            )
        elif kind == 5:
            frags.append(f"<h{rng.randint(1, 6)}>{prose(rng.randint(1, 5))}"
                         f"</h{rng.randint(1, 6)}>")
        elif kind == 6:
            frags.append(prose(rng.randint(1, 8)))        # stray text
        elif kind == 7:
            frags.append(f"<div class='c{rng.randrange(9)}'>")  # unclosed
        else:
            frags.append(rng.choice(["</div>", "<br/>", "<hr>",
                                     "< notatag", "<em>x</em>"]))
    return "".join(frags)


@pytest.mark.parametrize("seed", [11, 22, 33, 44])
def test_html_extract_differential_vs_duckdb(spark, seed):
    """120 random pages per seed: Spark extraction == the DuckDB
    rendering of the same algebra, value for value."""
    import random

    import duckdb

    from bb_bigdata_log_tools_spark.operators.html import (
        html_extract_links,
        html_extract_links_sql,
        html_extract_sql,
        html_extract_text,
    )

    rng = random.Random(seed)
    pages = [(i, _random_html(rng)) for i in range(120)]
    df = spark.createDataFrame(pages, "doc_id long, html string")

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pages (doc_id BIGINT, html VARCHAR)"
    )
    con.executemany("INSERT INTO pages VALUES (?, ?)", pages)
    src = "SELECT doc_id, html FROM pages"

    got = [tuple(r) for r in html_extract_text(df).collect()]
    want = con.execute(html_extract_sql(src)).fetchall()
    assert got == [tuple(r) for r in want], seed

    got_l = [tuple(r) for r in html_extract_links(df).collect()]
    want_l = con.execute(html_extract_links_sql(src)).fetchall()
    assert got_l == [tuple(r) for r in want_l], seed


def test_image_dhash_degenerate_dims():
    """dHash is defined (and deterministic) below the 9x8 grid: tiny
    images sample repeated pixels instead of raising."""
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        image_dhash_value,
        make_bmp,
    )

    one = image_dhash_value(make_bmp(1, 1, [[(7, 7, 7)]]))
    assert one == 0  # single gray value -> no gradients anywhere
    tiny = image_dhash_value(
        make_bmp(3, 2, [[(0, 0, 0), (255, 255, 255), (0, 0, 0)],
                        [(255, 255, 255), (0, 0, 0), (255, 255, 255)]])
    )
    assert tiny is not None and tiny != 0


@pytest.mark.parametrize("seed", [5, 15])
def test_byte_pretokenizer_differential_vs_duckdb(spark, seed):
    """The BYTE_PRETOKEN_PATTERN relies on identical leftmost-first
    alternation in Java regex (Spark) and RE2 (DuckDB): sweep random
    texts mixing words, digits, punctuation runs, and multi-space gaps
    and compare the extracted pretoken SEQUENCES exactly."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from bb_bigdata_log_tools_spark.operators.textprep import (
        BYTE_PRETOKEN_PATTERN,
    )

    rng = random.Random(seed)
    atoms = ["cat", "Dog", "42", "7", "!!", "?", ".", ",,", " ", "  ",
             "   ", "e9", "x!y"]
    texts = [
        (i, "".join(rng.choice(atoms) for _ in range(rng.randint(0, 25))))
        for i in range(150)
    ]
    df = spark.createDataFrame(texts, "id long, text string")
    got = {
        r.id: r.toks
        for r in df.select(
            "id",
            F.regexp_extract_all(
                "text", F.lit(BYTE_PRETOKEN_PATTERN), F.lit(0)
            ).alias("toks"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", texts)
    want = dict(
        con.execute(
            f"SELECT id, regexp_extract_all(text,"
            f" '{BYTE_PRETOKEN_PATTERN}') FROM t"
        ).fetchall()
    )
    assert got == want, seed


def test_html_extract_links_plan_scan_parallel(spark):
    """Link extraction is projection + posexplode only — no exchange
    in the unsorted plan."""
    from bb_bigdata_log_tools_spark.operators.html import html_extract_links

    df = spark.createDataFrame(
        [(1, "<a href='/x'>y</a>")], "doc_id long, html string"
    )
    plan = (
        html_extract_links(df, sort=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# --------------------------------------------------------------------------
# audio fingerprint / dedup_audio
# --------------------------------------------------------------------------


def test_audio_fingerprint_invariances():
    """Bit-depth requantization, amplitude scaling, and resampling
    preserve the fingerprint exactly; gain wobble lands in the near
    band; a different signal is far; non-PCM / too-short clips are
    None."""
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        audio_fingerprint_value,
    )
    from bb_bigdata_log_tools_spark.registry_misc import _audio_fp_payloads

    p = {i: pay for i, _mt, pay in _audio_fp_payloads()}
    fp = {i: audio_fingerprint_value(p[i]) for i in p}
    ham = lambda a, b: bin((fp[a] ^ fp[b]) & ((1 << 64) - 1)).count("1")
    for i in (1, 2, 3, 4):       # int16 / half-amp / 8-bit / resampled
        assert ham(0, i) == 0, i
    assert 0 < ham(0, 5) <= 6    # gain wobble: near band
    assert ham(0, 6) > 20        # different signal
    assert ham(6, 7) == 0        # its own 8-bit copy
    assert fp[8] is None and fp[9] is None and fp[10] is None


def test_dedup_audio_pairs(spark):
    """The blocked join returns exactly the master family (including
    the wobble at Hamming 2) plus the other-signal pair."""
    from bb_bigdata_log_tools_spark.operators.multimodal import dedup_audio
    from bb_bigdata_log_tools_spark.registry_misc import _audio_fp_media_df

    rows = {(r.doc_id1, r.doc_id2): r.hamming
            for r in dedup_audio(_audio_fp_media_df(spark)).collect()}
    master = {0, 1, 2, 3, 4, 5}
    want_master = {(a, b) for a in master for b in master if a < b}
    assert set(rows) == want_master | {(6, 7)}
    assert rows[(0, 5)] == 2 and rows[(0, 1)] == 0 and rows[(6, 7)] == 0


def test_html_extract_metadata_fields(spark):
    """Title decodes entities and collapses whitespace; lang / meta
    fields extract first-match; missing fields read '' (not NULL)."""
    from bb_bigdata_log_tools_spark.operators.html import (
        html_extract_metadata,
    )

    html = (
        '<html lang="fr-CA"><head>'
        "<title> Fish &amp; chips,\n  a guide </title>"
        '<meta charset="utf-8">'
        "<meta name='description' content='Best &quot;fry&quot; guide'>"
        '<meta name="keywords" content="fish,chips">'
        "<title>second title ignored</title></head><body/></html>"
    )
    df = spark.createDataFrame(
        [(1, html), (2, "<p>no head at all</p>")],
        "doc_id long, html string",
    )
    r1, r2 = html_extract_metadata(df).collect()
    assert (r1.title, r1.lang_attr, r1.meta_description, r1.meta_keywords) \
        == ("Fish & chips, a guide", "fr-CA", 'Best "fry" guide',
            "fish,chips")
    assert (r2.title, r2.lang_attr, r2.meta_description, r2.meta_keywords) \
        == ("", "", "", "")


def test_html_density_gate_exact_boundary(spark):
    """A block sitting EXACTLY on the 35% link-density threshold must
    be kept identically by Spark and DuckDB (review-found: Spark's
    0.35d * 180 = 62.999… dropped the block while DuckDB's DECIMAL
    0.35 * 180 = 63.00 kept it; the gate now compares in integers)."""
    import duckdb

    from bb_bigdata_log_tools_spark.operators.html import (
        html_extract_sql,
        html_extract_text,
    )

    # plain-text length 180, anchor text exactly 63 chars (35.00%)
    anchor = "x" * 63
    rest = "y" * (180 - 63 - 1)
    html = f"<p>{anchor[:0]}<a href='/l'>{anchor}</a> {rest}</p>"
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    got = html_extract_text(df).collect()[0]
    assert (got.n_kept, got.kept_chars) == (1, 180)

    con = duckdb.connect()
    con.execute("CREATE TABLE pages (doc_id BIGINT, html VARCHAR)")
    con.execute("INSERT INTO pages VALUES (1, ?)", [html])
    want = con.execute(
        html_extract_sql("SELECT doc_id, html FROM pages")
    ).fetchone()
    assert tuple(got) == tuple(want)


# --------------------------------------------------------------------------
# property: hamming_pairs == brute force for ANY (width, k) the guards
# admit — the generic join now backs three fingerprint families (text
# simhash, image dHash, audio energy-gradient), so the chunking math
# must hold beyond the 64/6 shape the fixtures pin.
# --------------------------------------------------------------------------


def test_hamming_pairs_property_any_width(spark):
    """Seeded sweep over (n_bits, max_hamming, salts) shapes incl. the
    60-bit simhash width, minimum 5-bit chunks, salts=1, and k=0."""
    import random

    from bb_bigdata_log_tools_spark.operators.dedup import hamming_pairs

    shapes = [(64, 6, 8), (60, 11, 8), (64, 11, 1), (32, 3, 4),
              (20, 3, 8), (64, 0, 2), (10, 1, 8)]
    rng = random.Random(88)
    for n_bits, k, salts in shapes:
        base = [rng.getrandbits(n_bits) for _ in range(8)]
        vals = []
        for i, b in enumerate(base):
            vals.append((2 * i, b))
            flip = b
            for _ in range(rng.randrange(0, k + 3)):
                flip ^= 1 << rng.randrange(n_bits)
            vals.append((2 * i + 1, flip))
        signed = [
            (i, v - (1 << 64) if v >= 1 << 63 else v) for i, v in vals
        ]
        df = spark.createDataFrame(signed, "doc_id long, h long")
        got = {
            (r.id1, r.id2, r.hamming)
            for r in hamming_pairs(df, "h", n_bits, k, salts=salts).collect()
        }
        uns = dict(vals)
        want = {
            (a, b, bin(uns[a] ^ uns[b]).count("1"))
            for a in uns
            for b in uns
            if a < b and bin(uns[a] ^ uns[b]).count("1") <= k
        }
        assert got == want, (n_bits, k, salts)
