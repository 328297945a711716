"""CDX-style URL index over the crawled corpus (Common Crawl's lookup
artifact).

Common Crawl publishes a CDX(J) index next to every crawl: one line per
capture, keyed by the SURT-canonicalized URL and sorted, so any URL's
captures are found by binary search over range-sorted shards. The
reference engine has no index plane (its corpus is a 250-row SQLite
table); at 10^10 URLs the index IS how anyone reads the crawl back, so
this module builds it engine-native.

Spark-first shape: the key and digest are pure column algebra inside
scan codegen (no Python); the global ordering is Spark's range-partitioned
total sort (``orderBy`` = sample-based range exchange + per-partition
sort), which is exactly how CDX shards are produced at scale — each
output partition is one range-sorted shard, and the shard boundaries
form the secondary (cluster) index.

Determinism contract: digest is md5 of the raw content bytes (real CDX
uses sha1-b32; md5 keeps the column oracle-able in DuckDB — same
precedent as the DNS stand-in resolver, both equally arbitrary);
SURT here lowercases, strips the scheme and fragment, reverses host
labels comma-joined, and keeps port/query verbatim — the www-stripping
and session-param-dropping of pywb's canonicalizer are POLICY layers a
deployment adds on top, deliberately not baked into the deterministic
core.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+([^#]*)"


def surt_key_col(url: Column) -> Column:
    """SURT sort key for a URL column: ``com,example,www)/path?q=1``.

    Lowercase; scheme and fragment dropped; host labels reversed and
    comma-joined; empty path becomes ``/``. Pure column algebra
    (codegen), no Python.
    """
    low = F.lower(url)
    host = F.regexp_extract(low, _HOST_RE, 1)
    path = F.regexp_extract(low, _PATH_RE, 1)
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
    )


def cdx_index(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "html",
    sort: bool = True,
) -> DataFrame:
    """Build the CDX index relation: (surt_key, ts, url, digest, length),
    range-sorted by (surt_key, ts) when ``sort=True``.

    ``ts`` is the CDX 14-digit capture timestamp (yyyyMMddHHmmss);
    ``digest`` is md5-hex of the content bytes; ``length`` is the
    content byte length. ``sort=False`` skips the total sort for
    callers that re-sort downstream (e.g. a writer that range-buckets
    by its own shard plan).
    """
    c = F.col(content_col)
    out = pages.select(
        surt_key_col(F.col(url_col)).alias("surt_key"),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts"),
        F.col(url_col).alias("url"),
        F.md5(c).alias("digest"),
        F.length(c).cast("long").alias("length"),
    )
    return out.orderBy("surt_key", "ts") if sort else out


def revisit_records(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "html",
) -> DataFrame:
    """Common-Crawl-style ``revisit`` detection by payload digest: every
    capture whose content digest was already seen at an earlier capture
    becomes a revisit row pointing at the original — the WARC
    ``revisit`` record CC's deduplicating writer emits instead of
    storing the payload again (storage drops to one copy per distinct
    payload; ``bytes_saved`` is the payload length NOT re-stored).

    Original = the lexicographically first (ts, url) per digest, so the
    mapping is a pure function of the capture relation — reproducible
    across engines, reruns, and partition layouts (same determinism
    contract as SemDeDup's lowest-id winner).

    Scale shape: one hash-agg to 1 row per distinct digest (min(struct)
    partial-aggregates map-side — a mirrored boilerplate page arrives
    at the reducer as per-mapper minima) + one digest equi-join back,
    O(corpus) always, never corpus x corpus; AQE broadcasts the digest
    side when small and skew-splits the probe when one digest floods.

    Reference parity: the reference stores every captured body verbatim
    (pipelines.py writes each item row); content-level dedup is new
    surface the 10^10-URL corpus needs.
    """
    caps = pages.select(
        F.col(url_col).alias("url"),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts"),
        F.md5(F.col(content_col)).alias("digest"),
        F.length(F.col(content_col)).cast("long").alias("bytes_saved"),
    )
    firsts = caps.groupBy("digest").agg(
        F.min(F.struct("ts", "url")).alias("first")
    )
    return (
        caps.join(firsts, "digest")
        .filter(
            (F.col("ts") != F.col("first.ts"))
            | (F.col("url") != F.col("first.url"))
        )
        .select(
            "url",
            "ts",
            "digest",
            F.col("first.url").alias("orig_url"),
            F.col("first.ts").alias("orig_ts"),
            "bytes_saved",
        )
    )


def nearest_capture(
    captures: DataFrame,
    queries: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    query_ts_col: str = "q_ts",
) -> DataFrame:
    """Wayback-style nearest-capture resolution: for each (url, q_ts)
    query, the capture of that url whose timestamp is closest to q_ts
    (tie -> the EARLIER capture, the Memento TimeGate convention for
    equidistant mementos; RFC 7089 §4.5.3 leaves it to the server —
    pinning it makes replays byte-identical). This is the read path of
    the CDX index ``cdx_index`` writes: a temporal point lookup batched
    over the whole query relation at once instead of one binary search
    per request.

    Timestamps are integer epoch seconds end to end, so the distance
    and the tiebreak compare longs — bit-portable across engines.

    Scale shape: ONE equi-join on url (captures shard by url; a 10^10
    capture index and a 10^8 query batch both shuffle on the same key,
    AQE handles hot urls) + one min(struct) hash-agg that
    partial-aggregates map-side — the per-(url, q_ts) winner reaches its
    reducer as per-mapper minima. Never captures x queries beyond the
    per-url candidate set. Queries for urls with no capture drop out
    (inner join): absence IS the answer upstream handles.
    """
    caps = captures.select(
        F.col(url_col).alias("url"), F.col(ts_col).cast("long").alias("_cts")
    )
    qs = queries.select(
        F.col(url_col).alias("url"),
        F.col(query_ts_col).cast("long").alias("q_ts"),
    )
    delta = F.abs(F.col("_cts") - F.col("q_ts"))
    return (
        qs.join(caps, "url")
        .groupBy("url", "q_ts")
        .agg(
            F.min(
                F.struct(delta.alias("d"), F.col("_cts").alias("ts"))
            ).alias("w")
        )
        .select(
            "url",
            "q_ts",
            F.col("w.ts").alias("capture_ts"),
            F.col("w.d").alias("delta_seconds"),
        )
    )


def capture_cadence(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-URL capture-cadence card over an archive's capture history
    (CDX-shaped rows): how often a URL actually gets re-captured —
    the observational complement of scheduler.revisit_schedule (that
    op says how often a crawl SHOULD revisit given content churn; this
    says how often the archive DID, the coverage-gap audit CC-style
    collections publish). max_gap >> mean_gap flags urls with capture
    droughts.

    Timestamps as integer epoch seconds — every statistic here is
    integer arithmetic except the final mean division (exact ratio,
    rounded 6 dp). mean_gap needs NO lag window (it telescopes to
    (last-first)/(n-1)); max_gap does: one lag window sharded by url
    (10^10 urls shard on the key), one hash-agg to |urls|. Single-
    capture urls emit NULL gaps.
    """
    w = Window.partitionBy("url").orderBy("ts")
    gaps = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts"),
    ).withColumn("_gap", F.col("ts") - F.lag("ts").over(w))
    per = gaps.groupBy("url").agg(
        F.count("*").cast("long").alias("n_captures"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.max("_gap").alias("max_gap"),
    )
    mean_gap = F.when(
        F.col("n_captures") > 1,
        F.round(
            (F.col("last_ts") - F.col("first_ts")).cast("double")
            / (F.col("n_captures") - 1).cast("double"),
            6,
        ),
    )
    return per.select(
        "url", "n_captures", "first_ts", "last_ts",
        mean_gap.alias("mean_gap"), F.col("max_gap").cast("long").alias("max_gap"),
    )
