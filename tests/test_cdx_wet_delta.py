"""CDX index, anchor-text aggregation, crawl delta, and the WET
write/read roundtrip — hand-computed semantics for the r4 batch-2
operators."""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
import io

import pytest
from pyspark.sql import functions as F

from crawlspark import cdx, graph, scheduler, warc

TS = dt.datetime(2024, 3, 5, 12, 30, 45)


def test_surt_key_edge_cases(spark):
    rows = [
        ("https://WWW.Example.COM/Path?Q=1#frag",),
        ("http://example.com",),  # empty path -> '/'
        ("https://a.b.c.example.org/x/y",),
        ("https://example.com/?utm=z",),
    ]
    df = spark.createDataFrame(rows, ["url"])
    got = [r[0] for r in df.select(cdx.surt_key_col(F.col("url"))).collect()]
    assert got == [
        "com,example,www)/path?q=1",
        "com,example)/",
        "org,example,c,b,a)/x/y",
        "com,example)/?utm=z",
    ]


def test_cdx_index_digest_and_sort(spark):
    pages = spark.createDataFrame(
        [
            ("https://b.com/x", TS, b"hello"),
            ("https://a.com/y", TS, b"world!"),
            ("https://a.com/y", TS + dt.timedelta(seconds=1), b"world2"),
        ],
        ["url", "warc_ts", "html"],
    )
    out = cdx.cdx_index(pages).collect()
    # range-sorted by (surt_key, ts)
    assert [(r.surt_key, r.ts) for r in out] == [
        ("com,a)/y", "20240305123045"),
        ("com,a)/y", "20240305123046"),
        ("com,b)/x", "20240305123045"),
    ]
    assert out[0].digest == hashlib.md5(b"world!").hexdigest()
    assert out[0].length == 6
    assert out[2].url == "https://b.com/x"


def test_anchor_text_winner_and_drops(spark):
    mk = (
        '<a href="https://t.com/page">{t}</a>'
        '<a href="#x">frag</a><a href="rel/p">rel</a>'
        '<a href="https://t.com/page"></a>'
        '<a href="/local">  Local  </a>'
    )
    pages = spark.createDataFrame(
        [
            ("https://s1.com/a", mk.format(t="Click")),
            ("https://s1.com/b", mk.format(t="Click")),
            ("https://s2.com/c", mk.format(t="zz-once")),
            # count tie at 1-1 on /tie: lexicographically smaller wins
            ("https://s1.com/d", '<a href="//t.com/tie">beta</a>'),
            ("https://s2.com/e", '<a href="//t.com/tie">alpha</a>'),
        ],
        ["url", "html"],
    )
    got = {r.dst_url: r for r in graph.anchor_text(pages).collect()}
    page = got["https://t.com/page"]
    assert (page.n_anchors, page.n_texts, page.top_text) == (3, 2, "Click")
    tie = got["https://t.com/tie"]
    assert (tie.n_anchors, tie.top_text) == (2, "alpha")
    # root-relative resolves per source host; anchor text trimmed
    assert got["https://s1.com/local"].top_text == "Local"
    assert got["https://s2.com/local"].n_anchors == 1
    # fragment / directory-relative / empty-text anchors never surface
    assert all("#" not in k and "rel" not in k for k in got)


def test_crawl_delta_statuses_and_dup_resolution(spark):
    hist = spark.createDataFrame(
        [
            ("u/add", 1, "f1"),
            ("u/rm", 0, "f2"),
            ("u/chg", 0, "f3"), ("u/chg", 1, "f4"),
            ("u/same", 0, "f5"), ("u/same", 1, "f5"),
            # duplicate rows within round 0 resolve via max(fingerprint)
            ("u/dup", 0, "a"), ("u/dup", 0, "b"), ("u/dup", 1, "b"),
            # rows from other rounds are ignored entirely
            ("u/other", 7, "zz"),
        ],
        ["url", "round", "fingerprint"],
    )
    got = {r.url: r for r in scheduler.crawl_delta(hist, 0, 1).collect()}
    assert got["u/add"].status == "added" and got["u/add"].fp_a is None
    assert got["u/rm"].status == "removed"
    assert got["u/chg"].status == "changed"
    assert got["u/same"].status == "unchanged"
    assert got["u/dup"].status == "unchanged" and got["u/dup"].fp_a == "b"
    assert "u/other" not in got


def test_format_wet_record_parses_back():
    rec = warc.format_wet_record("https://e.com/p", TS, "héllo wörld")
    rows, tally = warc.parse_warc_stream(
        io.BytesIO(rec), strict=True, record_types=("conversion",)
    )
    assert tally == {"errors": 0, "records": 1}
    assert rows[0]["url"] == "https://e.com/p"
    assert rows[0]["warc_ts"] == TS
    assert rows[0]["html"].decode("utf-8") == "héllo wörld"
    # a response-only reader skips the conversion record silently
    rows2, _ = warc.parse_warc_stream(io.BytesIO(rec), strict=True)
    assert rows2 == []


def test_wet_roundtrip_distributed(spark, tmp_path):
    n = 37
    corpus = spark.range(n).select(
        F.concat(F.lit("https://e.com/d/"), F.col("id")).alias("url"),
        F.lit(TS).alias("warc_ts"),
        F.concat(F.lit("text body "), F.col("id")).alias("text"),
    ).repartition(3)
    out = str(tmp_path / "wet")
    manifest = warc.write_wet(corpus, out).collect()
    assert sum(m.n_records for m in manifest) == n
    assert 1 <= len(manifest) <= 3
    assert all(m.path.endswith(".warc.wet.gz") for m in manifest)
    back = warc.read_wet(spark, out)
    got = {r.url: (r.warc_ts, r.text) for r in back.collect()}
    assert len(got) == n
    assert got["https://e.com/d/5"] == (TS, "text body 5")
    # every gzip member is byte-deterministic (mtime=0): rewriting the
    # same partitioning yields identical shard bytes
    out2 = str(tmp_path / "wet2")
    warc.write_wet(corpus, out2).collect()
    b1 = b"".join(
        sorted(open(m.path, "rb").read() for m in manifest)
    )
    manifest2 = warc.write_wet(corpus, out2).collect()
    b2 = b"".join(
        sorted(open(m.path, "rb").read() for m in manifest2)
    )
    assert hashlib.md5(b1).hexdigest() == hashlib.md5(b2).hexdigest()


def test_wet_empty_partition_writes_no_shard(spark, tmp_path):
    corpus = spark.range(2).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit(TS).alias("warc_ts"),
        F.lit("t").alias("text"),
    ).repartition(8)
    out = str(tmp_path / "wet")
    manifest = warc.write_wet(corpus, out).collect()
    assert sum(m.n_records for m in manifest) == 2
    import os
    assert sorted(os.listdir(out)) == sorted(
        os.path.basename(m.path) for m in manifest
    )


def test_cdx_over_synthetic_corpus(spark):
    """Composition: the synthetic Common-Crawl-style pages table (the
    engine's input_hint shape) flows straight into cdx_index."""
    from crawlspark.schema import PAGES
    from crawlspark.synth import SiteSpec, generate_site

    site = generate_site(SiteSpec(n_hosts=2, lists_per_host=2, per_list=4,
                                  seed=11))
    pages = spark.createDataFrame(site["pages"], schema=PAGES)
    out = cdx.cdx_index(pages).collect()
    assert len(out) == pages.count()
    keys = [(r.surt_key, r.ts) for r in out]
    assert keys == sorted(keys)
    one = out[0]
    src = next(p for p in site["pages"] if p["url"] == one.url)
    assert one.digest == hashlib.md5(src["html"]).hexdigest()
    assert one.length == len(src["html"])


def test_politeness_report_flags_violation(spark):
    log = spark.createDataFrame(
        [("a", 0), ("a", 0), ("a", 1),          # max 2/round
         ("b", 0), ("b", 0), ("b", 0)],          # 3 in one round
        ["host", "round"],
    )
    got = {r.host: r for r in
           scheduler.politeness_report(log, budget=2).collect()}
    a, b = got["a"], got["b"]
    assert (a.n_rounds, a.total_fetches, a.max_round_fetches,
            a.budget, a.compliant) == (2, 3, 2, 2, True)
    assert (b.n_rounds, b.max_round_fetches, b.compliant) == (1, 3, False)


def test_revisit_records_hand_computed(spark):
    # digest groups: 'AAA' captured 3x (t1 u1 first; t2 u2, t3 u1 are
    # revisits), 'BBB' once (no revisit row). ts-first ordering decides
    # the original; bytes_saved is the payload length per revisit.
    from datetime import datetime

    from crawlspark import cdx

    rows = [
        ("u1", datetime(2024, 1, 1, 0, 0, 1), bytearray(b"AAA")),
        ("u2", datetime(2024, 1, 1, 0, 0, 2), bytearray(b"AAA")),
        ("u1", datetime(2024, 1, 1, 0, 0, 3), bytearray(b"AAA")),
        ("u3", datetime(2024, 1, 1, 0, 0, 4), bytearray(b"BBB")),
    ]
    d = spark.createDataFrame(rows, ["url", "warc_ts", "html"])
    out = sorted(
        cdx.revisit_records(d).collect(), key=lambda r: r["ts"]
    )
    assert [(r["url"], r["orig_url"], r["orig_ts"], r["bytes_saved"])
            for r in out] == [
        ("u2", "u1", "20240101000001", 3),
        ("u1", "u1", "20240101000001", 3),
    ]


def test_revisit_records_url_breaks_ts_tie(spark):
    # same digest, same timestamp: the lexicographically smaller url is
    # the original (min(struct(ts, url)) contract).
    from datetime import datetime

    from crawlspark import cdx

    t = datetime(2024, 1, 1)
    d = spark.createDataFrame(
        [("b", t, bytearray(b"X")), ("a", t, bytearray(b"X"))],
        ["url", "warc_ts", "html"],
    )
    out = cdx.revisit_records(d).collect()
    assert len(out) == 1
    assert out[0]["url"] == "b" and out[0]["orig_url"] == "a"


def test_warc_write_read_roundtrip(spark, tmp_path):
    # raw response records: payload bytes, status, url and ts all
    # round-trip byte-identically through write_warc -> read_warc
    n = 23
    corpus = spark.range(n).select(
        F.concat(F.lit("https://e.com/p/"), F.col("id")).alias("url"),
        F.lit(TS).alias("warc_ts"),
        F.concat(F.lit("<html>body "), F.col("id"), F.lit("</html>"))
        .cast("binary")
        .alias("html"),
        F.when(F.col("id") % 7 == 0, F.lit(404))
        .otherwise(F.lit(200))
        .cast("int")
        .alias("http_status"),
    ).repartition(3)
    out = str(tmp_path / "warc")
    manifest = warc.write_warc(corpus, out).collect()
    assert sum(m.n_records for m in manifest) == n
    assert all(m.path.endswith(".warc.gz") for m in manifest)
    back = warc.read_warc(spark, out)
    got = {r.url: r for r in back.collect()}
    assert len(got) == n
    r5 = got["https://e.com/p/5"]
    assert bytes(r5.html) == b"<html>body 5</html>"
    assert (r5.warc_ts, r5.http_status) == (TS, 200)
    assert got["https://e.com/p/7"].http_status == 404
    # deterministic bytes: same partitioning -> identical shard set
    out2 = str(tmp_path / "warc2")
    manifest2 = warc.write_warc(corpus, out2).collect()
    b1 = b"".join(sorted(open(m.path, "rb").read() for m in manifest))
    b2 = b"".join(sorted(open(m.path, "rb").read() for m in manifest2))
    assert hashlib.md5(b1).hexdigest() == hashlib.md5(b2).hexdigest()


def test_warc_write_defaults_status_200(spark, tmp_path):
    corpus = spark.range(3).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit(TS).alias("warc_ts"),
        F.lit("x").cast("binary").alias("html"),
    )
    out = str(tmp_path / "warc")
    warc.write_warc(corpus, out).collect()
    back = warc.read_warc(spark, out).collect()
    assert {r.http_status for r in back} == {200}


def test_nearest_capture_distance_tie_and_missing(spark):
    from crawlspark import cdx

    caps = spark.createDataFrame(
        [("u1", 100), ("u1", 200), ("u1", 300), ("u3", 50)], ["url", "ts"]
    )
    qs = spark.createDataFrame(
        [("u1", 140), ("u1", 150), ("u1", 290), ("u2", 10)],
        ["url", "q_ts"],
    )
    got = {
        (r["url"], r["q_ts"]): (r["capture_ts"], r["delta_seconds"])
        for r in cdx.nearest_capture(caps, qs).collect()
    }
    assert got == {
        ("u1", 140): (100, 40),
        ("u1", 150): (100, 50),  # equidistant -> earlier capture
        ("u1", 290): (300, 10),
        # u2 has no captures -> absent
    }
