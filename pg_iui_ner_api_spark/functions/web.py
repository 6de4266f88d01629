"""Web-corpus URL canonicalization (training-data pipeline surface).

A 100 TB web crawl dedups FIRST on the canonical URL — it is the only
exact-dedup key that survives re-crawls of the same page behind
tracking parameters, fragments, default ports, and case-variant hosts
(RFC 3986 §6 syntax-based normalization plus the industry-standard
tracking-parameter strip used by crawl pipelines).

Everything here is pure JVM ``Column`` algebra — regexp group
extraction, higher-order array functions — zero Python, whole-stage
codegen, and an exact DuckDB twin in ``__spark_entry__.oracle_sql``
(``url_canon`` / ``url_dedup``). At scale the canonical URL reduces to
one narrow string per row; the dedup shuffle carries (canonical, id)
only, never the document payload.

Normalization rules (applied in order):
  1. drop the fragment (``#...``);
  2. lowercase the scheme and the host;
  3. strip the scheme's default port (``:80`` for http, ``:443`` for
     https);
  4. empty path -> ``/``;
  5. drop tracking query parameters (``utm_*`` prefixes and exact keys
     ``gclid``, ``fbclid``, ``ref``), comparing keys case-sensitively
     as crawlers do;
  6. sort the surviving ``k=v`` parameters bytewise (stable canonical
     order independent of emission order);
  7. drop the ``?`` when no parameter survives.

Inputs that do not parse as ``scheme://authority...`` are passed
through unchanged (NULL stays NULL) so a malformed row can never
poison a batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# one regex, four groups: scheme, authority, path, query (fragment is
# removed before this runs). Anchored so partial garbage never matches.
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?(.*))?$"

#: query keys stripped during canonicalization (exact matches) and the
#: prefix family (``utm_source``, ``utm_medium``, ...).
TRACKING_KEYS = ("gclid", "fbclid", "ref")
TRACKING_PREFIX = "utm_"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of ``url`` per the module rules; non-URL strings
    pass through unchanged."""
    u = F.col(url) if isinstance(url, str) else url
    nofrag = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, _URL_RE, 1))
    host = F.lower(F.regexp_extract(nofrag, _URL_RE, 2))
    path = F.regexp_extract(nofrag, _URL_RE, 3)
    query = F.regexp_extract(nofrag, _URL_RE, 4)

    strip80 = (scheme == F.lit("http")) & host.endswith(":80")
    strip443 = (scheme == F.lit("https")) & host.endswith(":443")
    host = (
        F.when(strip80, F.substring(host, 1, F.length(host) - 3))
        .when(strip443, F.substring(host, 1, F.length(host) - 4))
        .otherwise(host)
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.split(p, "=").getItem(0).startswith(TRACKING_PREFIX)
        & ~F.split(p, "=").getItem(0).isin(*TRACKING_KEYS),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )
    return F.when(scheme == "", u).otherwise(rebuilt)


def dedup_by_url(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Exact dedup on the canonical URL: one row per canonical with the
    smallest ``id_col`` as the deterministic keeper plus the collapse
    count.

    Scale shape: the ONLY shuffle carries (canonical_url, id) — the
    min/count pair is partial-aggregable (map-side combine), and the
    payload columns never move; callers re-join keepers on ``id_col``
    against the (bucketed) corpus.
    """
    return (
        # id keeps its native type (KG doc_ids are strings; testdata's
        # are int64) — min() is deterministic for both, and an ANSI-mode
        # cast here would throw on the string case
        df.select(
            canonicalize_url(url_col).alias("canonical_url"),
            F.col(id_col).alias(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_raw"),
        )
    )


# ---------------------------------------------------------------------------
# HTML -> text extraction (crawl ingest boundary)
# ---------------------------------------------------------------------------
# script/style/noscript payloads vanish whole; RE2 (the DuckDB twin's
# engine) has no backreferences, so each container gets its own literal
# pattern instead of <(script|style)>.*?</\1>.
_HTML_CONTAINERS = ("script", "style", "noscript")
# opening OR closing one of these implies a paragraph/line break in the
# extracted text (block-level rendering; the structure line-level dedup
# and boilerplate removal key on)
_HTML_BLOCK = r"(?i)</?(p|div|h[1-6]|li|tr|table|ul|ol|blockquote|section|article)(\s[^>]*)?>"
# entity decode table: decoded LAST and with &amp; at the very end, so
# double-escaped text (&amp;lt;) decodes exactly one level per pass,
# like browsers and html.unescape
_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
)


def html_to_text(html: Column | str) -> Column:
    """Main-text extraction from raw HTML as pure ``Column`` algebra —
    the first transform a crawled page meets (reference ingest takes
    pre-extracted text; a 100 TB web pipeline has to produce it).

    Contract: comments and script/style/noscript payloads are removed
    whole; block-level tags (opening or closing) become newlines (so downstream
    line-level ops — ``dedup_lines``, ``boilerplate_strip`` — see real
    line structure); every other tag becomes a space; the common named/
    numeric entities decode ONE level, after tag stripping (so literal
    ``&lt;p&gt;`` in text survives as ``<p>``, exactly like a browser
    renders it); whitespace collapses per line and blank lines drop.

    Deliberately NOT here: charset sniffing (decode bytes upstream),
    full numeric-entity decode (needs codepoint arithmetic), and
    readability-style content scoring (``boilerplate_strip`` covers the
    cross-document case). The regex subset is RE2-safe — no lookaround,
    no backreferences — so the DuckDB oracle replays it verbatim and
    the expressions stay inside whole-stage codegen.
    """
    c = F.col(html) if isinstance(html, str) else html
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    for t in _HTML_CONTAINERS:
        c = F.regexp_replace(c, rf"(?is)<{t}\b[^>]*>.*?</{t}\s*>", " ")
    c = F.regexp_replace(c, _HTML_BLOCK, "\n")
    c = F.regexp_replace(c, r"(?i)<br\s*/?\s*>", "\n")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"[ \t\r]+", " ")   # collapse within lines
    c = F.regexp_replace(c, r" ?\n ?", "\n")    # trim around breaks
    c = F.regexp_replace(c, r"\n+", "\n")       # drop blank lines
    return F.regexp_replace(c, r"^\s+|\s+$", "")
