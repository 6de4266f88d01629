"""URL canonicalization (functions/web.py) vs an independent Python
reference built on urllib.parse — different parser, same rules."""

import pytest
from urllib.parse import urlsplit

from pg_iui_ner_api_spark.functions.web import (
    TRACKING_KEYS,
    TRACKING_PREFIX,
    canonicalize_url,
    dedup_by_url,
)

from pyspark.sql import functions as F


def ref_canon(url):
    """Independent reference: urllib parsing + the module's rules."""
    if url is None:
        return None
    try:
        p = urlsplit(url)
    except ValueError:
        return url
    if not p.scheme or "://" not in url:
        return url
    scheme = p.scheme.lower()
    host = p.netloc.lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    if scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path = p.path or "/"
    params = [
        q
        for q in p.query.split("&")
        if q
        and not q.split("=")[0].startswith(TRACKING_PREFIX)
        and q.split("=")[0] not in TRACKING_KEYS
    ]
    q = "&".join(sorted(params))
    return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")


CASES = [
    "HTTP://WWW.Example.COM:80/Path/To?b=2&a=1#frag",
    "https://example.com:443/",
    "https://example.com:8443/x",            # non-default port survives
    "http://example.com",                    # empty path -> /
    "http://example.com?utm_source=x&utm_medium=y&gclid=1&id=7",
    "http://example.com/p?ref=nav&a=1&fbclid=zz",
    "http://example.com/p?a=1&a=0",          # duplicate keys sort bytewise
    "http://example.com/p?refresh=1",        # 'ref' is exact-match only
    "http://example.com/p?utm=1",            # 'utm' w/o underscore survives
    "http://example.com/UPPER/Case",         # path case preserved
    "http://user:PW@example.com/x",          # userinfo lowercased w/ host
    "ftp://Files.Example.com:80/a",          # :80 kept (not http's default)
    "not a url at all",
    "relative/path?x=1",
    "",
]


def test_canonicalize_matches_urllib_reference(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "url string")
    got = [
        r["c"]
        for r in df.select(canonicalize_url("url").alias("c"))
        .toPandas()
        .to_dict("records")
    ]
    want = [ref_canon(c) for c in CASES]
    assert got == want


def test_canonicalize_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(canonicalize_url("url").alias("c")).first()["c"] is None


def test_dedup_by_url_collapses_variants(spark):
    rows = [
        (1, "HTTP://A.com:80/x?b=2&a=1#f"),
        (2, "http://a.com/x?a=1&b=2&utm_source=s"),
        (3, "http://a.com/x?a=1&b=2"),
        (4, "http://a.com/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r["canonical_url"]: (r["keep_id"], r["n_raw"])
        for r in dedup_by_url(df, "url", "doc_id").collect()
    }
    assert out == {
        "http://a.com/x?a=1&b=2": (1, 3),
        "http://a.com/y": (4, 1),
    }


def test_dedup_plan_has_partial_aggregate(spark):
    """The dedup shuffle must map-side combine: two HashAggregate nodes
    around one Exchange, and no payload column in the exchange."""
    df = spark.createDataFrame([(1, "http://a.com/x", "PAYLOAD")],
                               "doc_id long, url string, body string")
    plan = (
        dedup_by_url(df, "url", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") >= 2
    exchange_lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert exchange_lines and all("body" not in ln for ln in exchange_lines)


def test_dedup_by_url_string_ids(spark):
    """KG doc_ids are strings; dedup must keep the lexicographically
    smallest without an ANSI cast error."""
    rows = [("d10", "http://a.com/x"), ("d2", "HTTP://A.com:80/x")]
    df = spark.createDataFrame(rows, "doc_id string, url string")
    r = dedup_by_url(df, "url", "doc_id").collect()[0]
    assert (r["keep_id"], r["n_raw"]) == ("d10", 2)


def test_canonicalize_idempotent_and_ref_exact_on_grid(spark):
    """Exhaustive combinatorial grid (schemes x hosts x ports x paths x
    queries x fragments): canonicalization must (a) agree with the
    urllib reference on every combination and (b) be IDEMPOTENT —
    canon(canon(u)) == canon(u), the fixed-point property that makes
    re-canonicalizing an already-clean corpus a no-op."""
    schemes = ["http", "HTTPS", "ftp"]
    hosts = ["Ex.COM", "ex.com", "user:p@Ex.com"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b"]
    queries = ["", "?b=2&a=1", "?utm_source=x", "?a=1&a=0&gclid=g", "?x"]
    frags = ["", "#f"]
    urls = [
        f"{s}://{h}{po}{pa}{q}{fr}"
        for s in schemes for h in hosts for po in ports
        for pa in paths for q in queries for fr in frags
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        "url",
        canonicalize_url("url").alias("c1"),
        canonicalize_url(canonicalize_url("url")).alias("c2"),
    ).collect()
    for r in out:
        assert r["c1"] == ref_canon(r["url"]), r["url"]
        assert r["c2"] == r["c1"], (r["url"], r["c1"], r["c2"])


# ---------------------------------------------------------------------------
# html_to_text
# ---------------------------------------------------------------------------
def _extract(spark, s: str) -> str:
    from pg_iui_ner_api_spark.functions.web import html_to_text

    df = spark.createDataFrame([(s,)], ["h"])
    return df.select(html_to_text("h").alias("t")).collect()[0].t


def test_html_basic_structure(spark):
    got = _extract(
        spark,
        "<html><body><h1>Title</h1><p>one two</p><p>three</p>"
        "<br>four<div>five</div></body></html>",
    )
    assert got == "Title\none two\nthree\nfour\nfive"


def test_html_containers_and_comments_vanish(spark):
    got = _extract(
        spark,
        '<head><style type="text/css">p {color: red}</style>'
        '<script>var x = "<p>markup in string</p>";</script>'
        "<noscript>enable js</noscript><!-- a <b> comment --></head>keep",
    )
    assert got == "keep"


def test_html_entities_decode_one_level(spark):
    got = _extract(spark, "<p>A &amp; B &lt;x&gt; &quot;q&quot;&nbsp;&#39;s&#39; &amp;lt;raw&amp;gt;</p>")
    # &amp;lt; decodes exactly one level -> literal &lt; survives
    assert got == "A & B <x> \"q\" 's' &lt;raw&gt;"


def test_html_case_insensitive_tags(spark):
    got = _extract(spark, "<SCRIPT>x</SCRIPT><P>a</P><BR>b")
    assert got == "a\nb"


def test_html_plain_text_passthrough(spark):
    assert _extract(spark, "  just   text \n\n here ") == "just text\nhere"


def test_html_whitespace_and_empty(spark):
    assert _extract(spark, "<p></p><div></div>") == ""
    assert _extract(spark, "") == ""


# ---------------------------------------------------------------------------
# html_to_text vs an INDEPENDENT html.parser-based reference
# ---------------------------------------------------------------------------
_BLOCK_TAGS = {"p", "div", "li", "tr", "table", "ul", "ol",
               "blockquote", "section", "article",
               "h1", "h2", "h3", "h4", "h5", "h6"}
_CONTAINERS = {"script", "style", "noscript"}
_ENTS = {"nbsp": " ", "quot": '"', "apos": "'", "lt": "<", "gt": ">",
         "amp": "&"}
_CHARREFS = {"34": '"', "39": "'"}


def _reference_extract(html: str) -> str:
    """Event-driven reference implementing the SAME contract through a
    real parser instead of the operator's regex chain."""
    import re
    from html.parser import HTMLParser

    class Ref(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=False)
            self.parts, self.skip = [], 0

        def _tagmark(self, tag):
            self.parts.append("\n" if tag in _BLOCK_TAGS or tag == "br"
                              else " ")

        def handle_starttag(self, tag, attrs):
            if tag in _CONTAINERS:
                self.skip += 1
            else:
                self._tagmark(tag)

        def handle_endtag(self, tag):
            if tag in _CONTAINERS:
                self.skip = max(0, self.skip - 1)
            else:
                self._tagmark(tag)

        def handle_startendtag(self, tag, attrs):
            if tag not in _CONTAINERS:
                self._tagmark(tag)

        def handle_data(self, data):
            if not self.skip:
                self.parts.append(data)

        def handle_entityref(self, name):
            if not self.skip:
                self.parts.append(_ENTS.get(name, f"&{name};"))

        def handle_charref(self, name):
            if not self.skip:
                self.parts.append(_CHARREFS.get(name, f"&#{name};"))

        def handle_comment(self, data):
            pass

    r = Ref()
    r.feed(html)
    r.close()
    s = "".join(r.parts)
    s = re.sub(r"[ \t\r]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n+", "\n", s)
    return re.sub(r"^\s+|\s+$", "", s)


def _gen_pages(n: int):
    """Deterministic well-formed page generator (seeded): nested block/
    inline structure, entities, comments, containers with markup inside
    string literals, br variants."""
    import random

    rng = random.Random(4242)
    texts = ["alpha beta", "x &amp; y", "tip &lt;b&gt; raw", "say &quot;hi&quot;",
             "it&#39;s", "gap&nbsp;here", "plain words", "&amp;lt;double&amp;gt;"]
    inline = ["b", "i", "span", "em", "a"]
    pages = []
    for _ in range(n):
        parts = ["<html><body>"]
        for _ in range(rng.randint(2, 6)):
            c = rng.random()
            if c < 0.35:
                t = rng.choice(sorted(_BLOCK_TAGS))
                parts.append(f"<{t}>{rng.choice(texts)}</{t}>")
            elif c < 0.55:
                t = rng.choice(inline)
                parts.append(f"<{t}>{rng.choice(texts)}</{t}>")
            elif c < 0.7:
                parts.append(rng.choice(texts))
            elif c < 0.8:
                parts.append(rng.choice(["<br>", "<br/>", "<BR >"]))
            elif c < 0.9:
                parts.append(f"<!-- {rng.choice(texts)} -->")
            else:
                t = rng.choice(sorted(_CONTAINERS))
                parts.append(f'<{t}>var x = "<p>{rng.choice(texts)}</p>";</{t}>')
        parts.append("</body></html>")
        pages.append("".join(parts))
    return pages


def test_html_to_text_vs_parser_reference(spark):
    from pg_iui_ner_api_spark.functions.web import html_to_text

    pages = _gen_pages(40)
    df = spark.createDataFrame([(i, p) for i, p in enumerate(pages)],
                               ["i", "h"])
    got = {r.i: r.t for r in
           df.select("i", html_to_text("h").alias("t")).collect()}
    for i, p in enumerate(pages):
        assert got[i] == _reference_extract(p), p
