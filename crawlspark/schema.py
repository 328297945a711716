"""Fixed, declared StructTypes for every engine table.

The reference is dynamically typed end-to-end (Scrapy ``Field()`` is
untyped, ``/root/reference/Douban2/items.py:13-26``; pandas infers at the
SQLite boundary, ``Douban2/pipelines.py:285``). We invert that: one schema
module, casts happen exactly once at the validation operator (SURVEY.md
§1.2, §2.5 F5/F6).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# input corpus (driver-mandated shape, BASELINE.json input_hint)
# ---------------------------------------------------------------------------
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# round-0 frontier input — mirror of the reference's seed injection
# (/root/reference/scripts/run_crawler.py:177-274)
SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# engine state tables
# ---------------------------------------------------------------------------
# Frontier row = the Redis ZSET member + score of scrapy-redis
# SpiderPriorityQueue (selected at /root/reference/Douban2/settings.py:73,86-87),
# made columnar. ``seq`` is the monotone discovery counter that pins the
# north_rule tiebreak: per-host FIFO within a priority class.
FRONTIER = T.StructType(
    [
        T.StructField("fp", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("discovered_round", T.IntegerType(), False),
        T.StructField("op_seq", T.LongType(), False),  # log-entry ordinal for merge-on-read
    ]
)

# Seen set = RFPDupeFilter's Redis SET (%(spider)s:dupefilter,
# /root/reference/Douban2/settings.py:71,76) + the dispatcher's seen_urls set
# (/root/reference/url_dispatcher/url_dispatcher.py:152-155).
SEEN = T.StructType(
    [
        T.StructField("fp", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host_bucket", T.IntegerType(), False),
        T.StructField("first_round", T.IntegerType(), False),
    ]
)

# Output of extract_records_and_links (kernel K4). One row per fetched page;
# record fields are null for pages that carry no record (list pages).
EXTRACTED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),  # 'list' | 'detail' | 'other'
        T.StructField("rank", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("rate", T.DoubleType(), True),
        T.StructField("num", T.LongType(), True),
        T.StructField("genres", T.ArrayType(T.StringType()), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("links", T.ArrayType(T.StringType()), True),
    ]
)

# Final results table — the reference's ``all_movies`` Redis hash /
# ``movies_all`` SQLite table (SURVEY.md §1.2): upsert-by-rank semantics.
RESULTS = T.StructType(
    [
        T.StructField("rank", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("rate", T.DoubleType(), True),
        T.StructField("num", T.LongType(), True),
        T.StructField("genres", T.ArrayType(T.StringType()), True),
        T.StructField("url", T.StringType(), False),
        T.StructField("crawl_round", T.IntegerType(), False),
    ]
)

# Per-round observability — replaces the reference's Redis stats hashes
# (/root/reference/Douban2/middlewares.py:281-285) and the monitor TUI.
METRICS = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.LongType(), False),
    ]
)

# Broadcast politeness / robots state (SURVEY.md §2.4 N1-N5).
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("deny_prefixes", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)

# Analytics-plane golden fixture — exact shape of the reference output
# (Parquet golden output/parquet/movies_all_20250305_220816.parquet and
# SQLite DDL /root/reference/utils/data_storage.py:42-60).
MOVIES = T.StructType(
    [
        T.StructField("rank", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("director", T.StringType(), True),
        T.StructField("screenwriter", T.ArrayType(T.StringType()), True),
        T.StructField("actors", T.ArrayType(T.StringType()), True),
        T.StructField("genres", T.ArrayType(T.StringType()), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("release_date", T.StringType(), True),
        T.StructField("runtime", T.StringType(), True),
        T.StructField("imdb", T.StringType(), True),
        T.StructField("rate", T.DoubleType(), True),
        T.StructField("num", T.LongType(), True),
        T.StructField("crawl_time", T.StringType(), True),
        T.StructField("node_id", T.StringType(), True),
    ]
)

N_BUCKETS_DEFAULT = 64  # sandbox default; 4096 at 10^10-frontier scale

# Discovery-counter field widths (crawl.py docstring):
#   seq = (round+1)*S_ROUND + parent_rn*S_PARENT + link_idx
# Valid iff parent_rn < S_ROUND/S_PARENT (2^20) and link_idx < S_PARENT
# (2^12); violations are raised loudly (CrawlConfig.__post_init__ bounds
# the pop budget; a row-level raise_error guards link_idx at runtime).
S_ROUND = 1 << 32
S_PARENT = 1 << 12
MAX_PARENT_RN = S_ROUND // S_PARENT  # 2^20

STATUS_QUEUED = "queued"
STATUS_DONE = "done"
STATUS_FAILED = "failed"
STATUS_ROBOTS_DENIED = "robots_denied"
STATUS_EXHAUSTED = "exhausted"  # retries used up (RETRY_TIMES=3 analog)
