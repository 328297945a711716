"""WARC source — read Common-Crawl-shaped archives into the pages table.

BASELINE.json's input_hint mandates a table of Common-Crawl-style pages
(url, warc_ts, html, ...); Common Crawl itself ships WARC files, so this
module closes the loop: a distributed WARC reader producing exactly that
schema. The reference has no WARC plane (it crawls live HTTP) — this is
engine-native surface for the 100 TB corpus story.

Spark-first shape: ``binaryFile`` source (one row per .warc file, content
as bytes) -> ``mapInPandas`` Arrow kernel running a dependency-free
WARC/1.0 parser per file. WARC files are independently parseable, so
parallelism = number of files — exactly how Common Crawl distributes its
corpus (segments of ~1 GB warc.gz). Gzip members are handled per-file
(.warc.gz is a concatenation of gzip members; ``gzip.decompress`` handles
multi-member streams).

Parser scope, loudly bounded: WARC/1.0 ``response`` records with an
HTTP/1.x payload; other record types (warcinfo, request, metadata) are
skipped. Chunked transfer encoding is NOT decoded (Common Crawl stores
de-chunked payloads); a Transfer-Encoding header raises rather than
silently yielding garbage.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_OUT = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("http_status", T.IntegerType(), True),
    ]
)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Pure-python WARC/1.0 parser (shared by the Spark kernel and tests).
    Returns one dict per ``response`` record: url, warc_ts (datetime),
    html (payload bytes), http_status."""
    import datetime as dt

    if data[:2] == b"\x1f\x8b":  # gzipped (possibly multi-member)
        data = gzip.decompress(data)
    out: list[dict] = []
    stream = io.BytesIO(data)
    while True:
        # find the next record header
        line = stream.readline()
        if not line:
            break
        if not line.startswith(b"WARC/"):
            continue
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            k, _, v = h.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        block = stream.read(length)
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        ts_raw = headers.get("warc-date")
        ts = None
        if ts_raw:
            ts = dt.datetime.strptime(ts_raw, "%Y-%m-%dT%H:%M:%SZ")
        # split the HTTP response head from the payload
        sep = block.find(b"\r\n\r\n")
        if sep < 0:
            sep = block.find(b"\n\n")
            head, payload = (block[:sep], block[sep + 2:]) if sep >= 0 else (b"", block)
        else:
            head, payload = block[:sep], block[sep + 4:]
        status = None
        first = head.split(b"\r\n", 1)[0].split(b"\n", 1)[0]
        parts = first.split()
        if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
            try:
                status = int(parts[1])
            except ValueError:
                status = None
        if b"transfer-encoding:" in head.lower():
            raise ValueError(
                f"WARC record for {url!r} has a Transfer-Encoding header — "
                "chunked payloads are outside this parser's bounded scope "
                "(Common Crawl stores de-chunked payloads)"
            )
        out.append({"url": url, "warc_ts": ts, "html": payload, "http_status": status})
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC read -> (url, warc_ts, html, http_status).

    One Arrow task per .warc/.warc.gz file (binaryFile rows are whole
    files; WARC segments are the parallelism unit, as in Common Crawl's
    own layout). Compose with kernels.extract_text /
    textops / dedup for the full corpus-prep pipeline.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("content")
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for blob in pdf["content"]:
                rows.extend(parse_warc_bytes(bytes(blob)))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "http_status"]
            )

    return files.mapInPandas(_run, schema=WARC_OUT)


def warc_to_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC -> the engine's pages table shape (url, warc_ts, html, text,
    lang): 200-status responses, canonical text via the byte-identity
    extract kernel, lang via the n-gram heuristic."""
    from .kernels import extract_text
    from .textops import lang_id

    raw = read_warc(spark, path).filter(F.col("http_status") == 200)
    return raw.select(
        "url",
        "warc_ts",
        "html",
        extract_text(F.col("html")).alias("text"),
    ).withColumn("lang", lang_id(F.col("text")))
