"""HTML boilerplate extraction — the FIRST operator of a web-crawl
training pipeline: strip markup chrome, segment into blocks, keep the
main content by link-density + text-length heuristics (the
jusText/trafilatura family, reduced to deterministic column algebra).

Everything here is pure JVM-side regex/higher-order-function column
expressions — no Python in the hot path, no shuffle (the per-document
work is scan-parallel; only the gate's presentation sort moves rows).
The regexes are dialect-portable (no lookaround, no backrefs), so the
SAME algebra runs as the DuckDB oracle.

DELIBERATE SCOPE: this is the heuristic regex tier, not an HTML5 tree
parser — nested same-name containers (a ``<div>`` inside a ``<nav>``
closes the non-greedy strip early) and malformed tag soup degrade to
"keep too much", never to a crash. That is the right failure mode for
a crawl pre-filter: the downstream quality/dedup tiers see slightly
dirtier text, nothing is silently lost. A production pass would put a
spec parser behind this filter for the documents it flags.

No counterpart in the reference (logs, not web pages) — this extends
the engine along the LLM-data-pipeline axis like operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.operators.util import small_sort

#: Containers whose CONTENT is chrome, not content: dropped wholesale
#: before block segmentation (nav bars, headers, footers, sidebars)
#: along with non-rendered payloads (script/style/noscript/template).
STRIP_CONTAINERS = (
    "script",
    "style",
    "noscript",
    "template",
    "nav",
    "header",
    "footer",
    "aside",
)

#: Block-level boundary tags: the text between any two of these is one
#: candidate block for the keep/drop decision.
BLOCK_TAGS = (
    "p|div|h[1-6]|li|ul|ol|br|hr|table|thead|tbody|tr|td|th|section"
    "|article|main|blockquote|pre|figure|figcaption|form|body|html"
)

_BLOCK_SPLIT = rf"(?i)</?(?:{BLOCK_TAGS})(?:[\t\n\x0B\f\r ][^>]*)?/?>"
_ANCHOR = r"(?is)<a(?:[\t\n\x0B\f\r ][^>]*)?>(.*?)</a>"
_TAG = r"(?s)<[^>]*>"

#: Minimum plain-text length for a block to count as content.
MIN_BLOCK_CHARS = 25
#: Maximum fraction of a block's text that may sit inside <a> tags.
MAX_LINK_DENSITY = 0.35

#: (entity, replacement) in APPLICATION ORDER — &amp; last so freshly
#: produced '&' never re-enters entity decoding (single-pass decode).
ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def _decode_entities(col: Column) -> Column:
    for ent, rep in ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return col


#: Explicit whitespace class shared by both engines.  Java's ``\s``
#: includes ``\x0B`` (vertical tab) while DuckDB/RE2's does not — the
#: explicit class keeps the two dialects byte-identical on VT pages.
_WS_CLASS = r"[\t\n\x0B\f\r ]+"


def _plain_text(col: Column) -> Column:
    """Inline tags → space, entities decoded, whitespace collapsed."""
    c = F.regexp_replace(col, _TAG, " ")
    c = _decode_entities(c)
    return F.trim(F.regexp_replace(c, _WS_CLASS, " "))


def _chrome_pattern() -> str:
    """ONE alternation matching comments and every chrome-container
    span: a single regex pass over the page instead of nine sequential
    rewrites (each pass re-scans the whole string — measurably slower
    on MB-scale pages). No backreferences (RE2 has none), so each tag
    is its own explicit `<tag …> … </tag>` alternative.

    SEMANTICS NOTE: the fused pass is leftmost-first across ALL
    alternatives, which differs from the pre-round-8 sequential
    per-tag passes when chrome spans INTERLEAVE (e.g. a ``</nav>``
    inside an unterminated ``<header>`` span: the sequential header
    pass consumed it first; the fused pass starts at the earlier
    ``<nav>``). Both are heuristic answers to malformed nesting — the
    fused choice is the document-order one, and both engines run the
    identical pattern, so Spark and the oracle always agree."""
    tags = "|".join(
        rf"<{tag}(?:[\t\n\x0B\f\r ][^>]*)?>.*?</{tag}>" for tag in STRIP_CONTAINERS
    )
    return rf"(?is)(?:<!--.*?-->|{tags})"


def _strip_chrome(col: Column) -> Column:
    """Comments + non-content containers removed (non-greedy spans)."""
    return F.regexp_replace(col, _chrome_pattern(), " ")


def _decode_entities_sql(expr: str) -> str:
    """DuckDB rendering of :func:`_decode_entities` — ONE copy shared
    by every SQL builder below, so the entity table and its escaping
    rule cannot drift between the three oracles."""
    out = expr
    for ent, rep in ENTITIES:
        rq = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{rq}')"
    return out


def _plain_text_sql(expr: str) -> str:
    """DuckDB rendering of :func:`_plain_text` (shared single copy)."""
    inner = _decode_entities_sql(
        f"regexp_replace({expr}, '(?s)<[^>]*>', ' ', 'g')"
    )
    return (
        f"trim(regexp_replace({inner}, '{_WS_CLASS}', ' ', 'g'))"
    )


def html_extract_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_block_chars: int = MIN_BLOCK_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
    sort: bool = True,
) -> DataFrame:
    """Extract main-content text from an HTML column.

    Pipeline (all whole-stage-codegen column algebra):

    1. strip comments and chrome containers (:data:`STRIP_CONTAINERS`);
    2. segment on block-level tag boundaries (:data:`BLOCK_TAGS`);
    3. per block, compute the PLAIN text (inline tags → space, entities
       decoded, whitespace collapsed) and the LINK text length (same
       normalization over the concatenated ``<a>…</a>`` inners);
    4. keep blocks with ``len(text) >= min_block_chars`` and link
       density ``link_chars / len(text) <= max_link_density`` — the
       jusText-style two-rule gate separating prose from related-links
       lists, button bars, and heading stubs;
    5. re-join kept blocks with newlines, account every char.

    100 TB shape: one projection per document — no join, no aggregate,
    no shuffle; the block arrays live only inside the row being
    computed. Cost is O(bytes of HTML) per task and the output column
    is strictly smaller than the input.

    Output: (id, n_blocks, n_kept, kept_chars, dropped_chars, text) —
    ``n_blocks`` counts non-empty candidate blocks; dropped/kept chars
    partition their total text mass, so ``dropped_chars`` is the
    boilerplate payload this stage saved downstream tiers from.

    NULL html is treated as the empty page (coalesced to '') so both
    engines stay on the tested empty-string path — without it Spark's
    ``F.size(null array)`` and DuckDB's ``len(NULL)`` disagree.
    """
    raw = F.coalesce(F.col(html_col), F.lit(""))
    blocks = F.split(_strip_chrome(raw), _BLOCK_SPLIT)
    per_block = F.transform(
        blocks,
        lambda b: F.struct(
            _plain_text(b).alias("txt"),
            F.aggregate(
                F.regexp_extract_all(b, F.lit(_ANCHOR), F.lit(1)),
                F.lit(0),
                lambda acc, a: acc + F.length(_plain_text(a)),
            ).alias("link_chars"),
        ),
    )
    nonempty = F.filter(per_block, lambda s: s["txt"] != F.lit(""))
    # INTEGER-exact density gate: link_chars * 10000 <= ppm * length.
    # A float comparison diverges between engines on exact boundaries
    # (Spark's 0.35d * 180 = 62.999…; DuckDB types the literal 0.35 as
    # DECIMAL and gets exactly 63.00), so a block sitting exactly on
    # the threshold would be kept by one engine and dropped by the
    # other. Integers are bit-identical everywhere.
    density_e4 = int(round(max_link_density * 10000))
    kept = F.filter(
        nonempty,
        lambda s: (F.length(s["txt"]) >= F.lit(min_block_chars))
        & (
            s["link_chars"] * F.lit(10000)
            <= F.lit(density_e4) * F.length(s["txt"])
        ),
    )
    total_chars = F.aggregate(
        nonempty, F.lit(0), lambda acc, s: acc + F.length(s["txt"])
    )
    kept_chars = F.aggregate(
        kept, F.lit(0), lambda acc, s: acc + F.length(s["txt"])
    )
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(nonempty).cast("int").alias("n_blocks"),
        F.size(kept).cast("int").alias("n_kept"),
        kept_chars.cast("long").alias("kept_chars"),
        (total_chars - kept_chars).cast("long").alias("dropped_chars"),
        F.array_join(
            F.transform(kept, lambda s: s["txt"]), "\n"
        ).alias("text"),
    )
    return small_sort(out, "doc_id") if sort else out


def html_extract_sql(
    source_sql: str,
    html_expr: str = "html",
    id_expr: str = "doc_id",
    min_block_chars: int = MIN_BLOCK_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
) -> str:
    """The SAME extraction as :func:`html_extract_text`, rendered as
    dialect-portable DuckDB SQL — the full-fidelity oracle (and the
    SQL-surface form of the operator). ``source_sql`` is a relation
    providing ``id_expr`` and ``html_expr``.

    Kept mechanically in lockstep with the Spark algebra: both sides
    read their regexes and thresholds from the module constants.
    """
    plain = _plain_text_sql("b")
    link_plain = _plain_text_sql("a")
    stripped = (
        f"regexp_replace(coalesce({html_expr}, ''),"
        f" '{_chrome_pattern()}', ' ', 'g')"
    )
    return f"""
WITH src AS ({source_sql}),
seg AS (
  SELECT {id_expr} AS doc_id,
         string_split_regex({stripped}, '{_BLOCK_SPLIT}') AS blocks
  FROM src
),
pb AS (
  SELECT doc_id,
         list_filter(
           list_transform(blocks, b -> struct_pack(
             txt := {plain},
             link_chars := coalesce(list_sum(list_transform(
               regexp_extract_all(b, '{_ANCHOR}', 1),
               a -> length({link_plain}))), 0)
           )),
           s -> s.txt <> '') AS nonempty
  FROM seg
),
k AS (
  SELECT doc_id, nonempty,
         list_filter(nonempty,
           s -> length(s.txt) >= {min_block_chars}
                AND s.link_chars * 10000
                    <= {int(round(max_link_density * 10000))}
                       * length(s.txt))
           AS kept
  FROM pb
)
SELECT doc_id,
       CAST(len(nonempty) AS INTEGER) AS n_blocks,
       CAST(len(kept) AS INTEGER) AS n_kept,
       CAST(coalesce(list_sum(list_transform(kept, s -> length(s.txt))), 0)
            AS BIGINT) AS kept_chars,
       CAST(coalesce(list_sum(list_transform(nonempty,
                                             s -> length(s.txt))), 0)
            - coalesce(list_sum(list_transform(kept, s -> length(s.txt))), 0)
            AS BIGINT) AS dropped_chars,
       coalesce(array_to_string(list_transform(kept, s -> s.txt), chr(10)),
                '') AS text
FROM k
ORDER BY doc_id
"""


#: href-capturing anchor pattern (group 1 = target, group 2 = inner
#: HTML); single- or double-quoted attributes, dialect-portable.
_ANCHOR_HREF = r"""(?is)<a[\t\n\x0B\f\r ][^>]*href=["']([^"']*)["'][^>]*>(.*?)</a>"""


def html_extract_links(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    sort: bool = True,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Extract the link graph from an HTML column: one row per anchor
    in document order — (doc_id, link_pos, href, anchor_text,
    is_internal). The companion of :func:`html_extract_text` (which
    DROPS link-heavy chrome): the crawl frontier / web-graph side
    needs exactly the links the content side throws away, so this
    reads the whole page (comments stripped; nav and footers kept —
    site chrome is where most of the link graph lives).

    ``anchor_text`` is the normalized plain text of the anchor inner
    HTML (same tag-strip + entity + whitespace pipeline as the content
    extractor); ``is_internal`` marks site-relative hrefs (leading "/",
    not protocol-relative "//").

    Same 100 TB shape as the text extractor: one projection +
    posexplode per document, no join, no aggregate; output rows are
    the anchors themselves (the crawl frontier a scheduler consumes).
    The page-sized regex runs ONCE (group 0 — whole anchors); href and
    inner text re-extract from each short matched anchor string, not
    from the page again.
    """
    raw = F.regexp_replace(
        F.coalesce(F.col(html_col), F.lit("")), r"(?s)<!--.*?-->", " "
    )
    anchors = F.regexp_extract_all(raw, F.lit(_ANCHOR_HREF), F.lit(0))
    # extra_cols ride the projection (e.g. base_url for the streaming
    # frontier, where a join back to the page relation would be a
    # stream-stream join) — passthrough, no extra work
    extras = [F.col(c) for c in extra_cols]
    out = (
        df.select(
            F.col(id_col).alias("doc_id"),
            *extras,
            F.posexplode(anchors).alias("link_pos", "a"),
        )
        .select(
            "doc_id",
            *extra_cols,
            F.col("link_pos").cast("int").alias("link_pos"),
            F.regexp_extract("a", _ANCHOR_HREF, 1).alias("href"),
            _plain_text(
                F.regexp_extract("a", _ANCHOR_HREF, 2)
            ).alias("anchor_text"),
        )
        .withColumn(
            "is_internal",
            F.col("href").startswith("/") & ~F.col("href").startswith("//"),
        )
    )
    return small_sort(out, "doc_id", "link_pos") if sort else out


def html_extract_links_sql(
    source_sql: str,
    html_expr: str = "html",
    id_expr: str = "doc_id",
) -> str:
    """The SAME link extraction as :func:`html_extract_links` in
    DuckDB SQL (oracle / SQL surface), built from the same constants —
    one page-sized regex pass, per-anchor re-extraction, like the
    Spark side."""
    pat = _ANCHOR_HREF.replace("'", "''")
    plain = _plain_text_sql(f"regexp_extract(a, '{pat}', 2)")
    return f"""
WITH src AS ({source_sql}),
x AS (
  SELECT {id_expr} AS doc_id,
         regexp_extract_all(
           regexp_replace(coalesce({html_expr}, ''),
                          '(?s)<!--.*?-->', ' ', 'g'),
           '{pat}', 0) AS anchors
  FROM src
),
e AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS link_pos, anchors[i] AS a
  FROM x, LATERAL (SELECT unnest(generate_series(1, len(anchors))) AS i)
)
SELECT doc_id, link_pos,
       regexp_extract(a, '{pat}', 1) AS href,
       {plain} AS anchor_text,
       (regexp_extract(a, '{pat}', 1) LIKE '/%'
        AND regexp_extract(a, '{pat}', 1) NOT LIKE '//%') AS is_internal
FROM e
ORDER BY doc_id, link_pos
"""


#: (output column, first-match pattern with ONE capture group). All
#: dialect-portable; group 1 is the value. Meta tags assume the
#: name-before-content attribute order (the overwhelmingly dominant
#: authoring form; a reversed-attribute page degrades to '' — the
#: keep-going failure mode of the whole module).
METADATA_PATTERNS = (
    ("title", r"(?is)<title(?:[\t\n\x0B\f\r ][^>]*)?>(.*?)</title>"),
    ("lang_attr", r"""(?is)<html[\t\n\x0B\f\r ][^>]*lang=["']([^"']*)["']"""),
    (
        "meta_description",
        r"""(?is)<meta[\t\n\x0B\f\r ][^>]*name=["']description["'][^>]*"""
        r"""content=["']([^"']*)["']""",
    ),
    (
        "meta_keywords",
        r"""(?is)<meta[\t\n\x0B\f\r ][^>]*name=["']keywords["'][^>]*"""
        r"""content=["']([^"']*)["']""",
    ),
)


def html_extract_metadata(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    sort: bool = True,
) -> DataFrame:
    """Extract document metadata from an HTML column: the page title,
    the ``<html lang>`` attribute, and the description/keywords meta
    tags — the third HTML stage of a crawl pipeline (titles and
    descriptions feed quality filters, dedup keys, and search
    snippets; the lang attribute is the cheap prior the n-gram
    language-ID refines).

    First match wins per field (the document-order head tag, matching
    browser behavior); missing fields read as '' — never NULL, so
    downstream filters need no null-handling branch. Title and
    description pass the same entity/whitespace normalization as the
    content extractor. One projection per document — no join, no
    shuffle, same 100 TB shape as the sibling extractors.

    Output: (doc_id, title, lang_attr, meta_description,
    meta_keywords). NULL html is coalesced to '' like the siblings.
    """
    raw = F.coalesce(F.col(html_col), F.lit(""))
    cols = [F.col(id_col).alias("doc_id")]
    for name, pat in METADATA_PATTERNS:
        v = F.regexp_extract(raw, pat, 1)
        if name in ("title", "meta_description"):
            v = _plain_text(v)
        else:
            v = F.trim(v)
        cols.append(v.alias(name))
    out = df.select(*cols)
    return small_sort(out, "doc_id") if sort else out


def html_extract_metadata_sql(
    source_sql: str,
    html_expr: str = "html",
    id_expr: str = "doc_id",
) -> str:
    """The SAME metadata extraction in DuckDB SQL (oracle / SQL
    surface), from the same pattern constants."""
    sel = [f"{id_expr} AS doc_id"]
    for name, pat in METADATA_PATTERNS:
        pq = pat.replace("'", "''")
        base = f"regexp_extract(coalesce({html_expr}, ''), '{pq}', 1)"
        if name in ("title", "meta_description"):
            sel.append(f"{_plain_text_sql(base)} AS {name}")
        else:
            sel.append(f"trim({base}) AS {name}")
    cols = ",\n       ".join(sel)
    return f"""
WITH src AS ({source_sql})
SELECT {cols}
FROM src
ORDER BY doc_id
"""
