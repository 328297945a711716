"""The four Arrow-vectorized kernels — the ONLY per-row Python in the engine.

Everything else is declarative DataFrame/SQL. Per the driver's input_hint
("no per-row Python"), these are pandas_udf / mapInPandas kernels operating
on Arrow columnar batches, never Python RDD maps.

Reference behaviors reproduced (citations into /root/reference/):

* ``canonicalize_url`` — w3lib-compatible canonicalization inside scrapy's
  RFPDupeFilter (selected at ``Douban2/settings.py:71,76``): lowercase
  scheme/host, strip fragment and default port, sort query parameters.
* ``fingerprint_col`` — the RFPDupeFilter SHA1 request fingerprint; a pure
  builtin expression (``F.sha1``), no UDF needed.
* ``extract_text`` — html -> text, the byte-identity invariant per url
  (driver input_hint; reference analog: response.text handling in
  ``Douban2/spiders/douban2.py:125-128``).
* ``extract_records_and_links`` — the generic-engine equivalent of the
  reference's XPath parse/parse_detail (``Douban2/spiders/douban2.py:112-221``):
  fielded record extraction + link discovery in one Arrow pass.
"""

from __future__ import annotations

import hashlib
import html as _htmllib
import re
from collections.abc import Iterator
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# plain-Python cores (shared with the synthetic generator and the pure-Python
# crawl-order simulator so byte-identity / order parity are testable)
# ---------------------------------------------------------------------------

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Canonical URL form (w3lib-compatible subset).

    lowercase scheme+host, drop fragment, drop default port, sort query
    params (stable sort on key then value), normalize empty path to '/'.
    """
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if "@" in netloc:  # strip credentials like w3lib does not; keep userinfo
        userinfo, _, hostport = netloc.rpartition("@")
        netloc = userinfo + "@" + hostport
    host, _, port = netloc.partition(":")
    if port and _DEFAULT_PORTS.get(scheme) == port:
        netloc = host
    path = parts.path or "/"
    query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


def url_fingerprint(url: str) -> str:
    """SHA1 hex of the canonical URL — the dedup join key (D1/D2)."""
    return hashlib.sha1(canonicalize_url(url).encode("utf-8")).hexdigest()


def url_host(url: str) -> str:
    netloc = urlsplit(url).netloc.lower()
    host = netloc.rpartition("@")[2].partition(":")[0]
    return host


_TAG_RE = re.compile(r"<[^>]*>")


def html_to_text(html_bytes: bytes) -> str:
    """Deterministic html -> text: strip tags, unescape entities, collapse
    whitespace. This exact function also runs at corpus-generation time
    (synth.py) — the stored ``pages.text`` column is its output, making
    byte-identity a hard testable invariant rather than a hope.
    """
    s = html_bytes.decode("utf-8", errors="replace")
    s = _TAG_RE.sub(" ", s)
    s = _htmllib.unescape(s)
    return " ".join(s.split())


_HREF_RE = re.compile(r'href="([^"]+)"')
_FIELD_RE = {
    "rank": re.compile(r'<span class="rank">([^<]*)</span>'),
    "name": re.compile(r'<h1 class="name">([^<]*)</h1>'),
    "rate": re.compile(r'<span class="rate">([^<]*)</span>'),
    "num": re.compile(r'<span class="num">([^<]*)</span>'),
    "genres": re.compile(r'<span class="genres">([^<]*)</span>'),
}


def extract_page(url: str, html_bytes: bytes, include_text: bool = True) -> dict:
    """Parse one page: kind, record fields (detail pages), links, text.

    ``include_text=False`` skips the html->text conversion and emits
    text=None — the crawl round never consumes text (results carry
    fields, not text; the byte-identity contract is tested on the
    extract_text kernel itself), and at ~50 KB/page the text column was
    the bulk of the round's Arrow transfer AND of the ext cache build
    (measured: the cache-build stage dominated e2e walls at 100k pages).

    Generic-engine equivalent of parse/parse_detail
    (/root/reference/Douban2/spiders/douban2.py:112-221), including the
    reference's cleaning semantics: ``int(rank)`` guard 1..N
    (douban2.py:140-148), ``float(rate)`` and
    ``int(num.replace('人评价',''))`` casts (Douban2/pipelines.py:144-152),
    strip() on every string field (douban2.py:205-213).
    """
    s = html_bytes.decode("utf-8", errors="replace")
    links = _HREF_RE.findall(s)
    is_list = 'class="grid_view"' in s
    kind = "list" if is_list else ("detail" if '<h1 class="name">' in s else "other")
    rank = name = rate = num = genres = None
    if kind == "detail":
        m = {k: r.search(s) for k, r in _FIELD_RE.items()}
        if m["name"]:
            name = m["name"].group(1).strip()
        if m["rank"]:
            try:
                rank = int(m["rank"].group(1).strip())
            except ValueError:
                rank = None
        if m["rate"]:
            try:
                rate = float(m["rate"].group(1).strip())
            except ValueError:
                rate = None
        if m["num"]:
            try:
                num = int(m["num"].group(1).replace("人评价", "").strip())
            except ValueError:
                num = None
        if m["genres"]:
            genres = [g.strip() for g in m["genres"].group(1).split("/") if g.strip()]
    return {
        "url": url,
        "kind": kind,
        "rank": rank,
        "name": name,
        "rate": rate,
        "num": num,
        "genres": genres,
        "text": html_to_text(html_bytes) if include_text else None,
        "links": links,
    }


# ---------------------------------------------------------------------------
# Spark-facing kernels (Arrow batches)
# ---------------------------------------------------------------------------


@pandas_udf(T.StringType())
def canonicalize_urls(urls: pd.Series) -> pd.Series:
    """K1: vectorized canonicalization (Arrow batch in/out)."""
    return urls.map(canonicalize_url)


@pandas_udf(T.StringType())
def extract_text(html_col: pd.Series) -> pd.Series:
    """K3: html binary -> text, byte-identical to ``pages.text``."""
    return html_col.map(html_to_text)


def fingerprint_col(url_col: Column, already_canonical: bool = False) -> Column:
    """K2: SHA1 fingerprint — stays entirely JVM-side/codegen'd.

    ``sha1(encode(canonicalize(url), 'utf-8'))`` — only the
    canonicalization needs Python; hashing is a Spark builtin. Pass
    ``already_canonical=True`` when the column has been canonicalized
    (canonicalization is idempotent; skipping the second Arrow pass
    halves the Python work on the link-discovery path).
    """
    canon = url_col if already_canonical else canonicalize_urls(url_col)
    return F.sha1(F.encode(canon, "utf-8"))


def host_col(url_col: Column) -> Column:
    """Host extraction as a builtin expression (no UDF): Spark's
    ``parse_url`` is JVM-side and codegen-friendly."""
    return F.lower(F.parse_url(url_col, F.lit("HOST")))


def host_bucket_col(host: Column, n_buckets: int) -> Column:
    """P1: consistent-hash placement. Reference: ``md5(domain) % n_nodes``
    (/root/reference/url_dispatcher/url_dispatcher.py:110-116). Ours:
    ``pmod(xxhash64(host), n_buckets)`` — same placement contract
    (stable host -> bucket), Spark-native hash."""
    return F.pmod(F.xxhash64(host), F.lit(n_buckets)).cast("int")


_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("rank", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("rate", T.DoubleType()),
        T.StructField("num", T.LongType()),
        T.StructField("genres", T.ArrayType(T.StringType())),
        T.StructField("text", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


def extract_records_and_links(df, url_field: str = "url", html_field: str = "html",
                              include_text: bool = True):
    """K4: mapInPandas batch extractor — one Arrow pass computes record
    fields, text, and discovered links for every fetched page.
    ``include_text=False``: see extract_page (round-path optimization)."""

    _out_cols = ("url", "kind", "rank", "name", "rate", "num",
                 "genres", "text", "links")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # column-wise assembly: pd.DataFrame from a dict of lists is
            # several times faster than from a list of per-row dicts
            # (measured; this kernel is the crawl round's hot loop)
            cols: dict[str, list] = {c: [] for c in _out_cols}
            for u, h in zip(pdf[url_field], pdf[html_field]):
                rec = extract_page(u, h if isinstance(h, (bytes, bytearray)) else bytes(h),
                                   include_text=include_text)
                for c in _out_cols:
                    cols[c].append(rec[c])
            yield pd.DataFrame(cols)

    return df.mapInPandas(_run, schema=_EXTRACT_SCHEMA)
