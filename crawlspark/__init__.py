"""crawlspark — a PySpark-native distributed crawl + analytics engine.

A from-scratch, Spark-first reimplementation of the capabilities of the
reference system (tooth-lab/Scrapy-redis, a Scrapy-Redis distributed
crawler + SQLite/Parquet analytics tail; see SURVEY.md):

* the Redis ZSET priority request queue     -> a snapshot-versioned
  priority *frontier table* (``crawlspark.store.FrontierStore``)
* the RFPDupeFilter fingerprint Redis SET   -> a host-bucket-partitioned
  *seen* table, dedup by SHA1-of-canonical-URL anti-join
* the spider fetch/parse stage              -> a batched fetch-extract-emit
  job over a Common-Crawl-style ``pages`` table (``crawlspark.crawl``)
* politeness / robots.txt middlewares       -> per-host admission budgets
  + a broadcast robots table (``crawlspark.scheduler``)
* the SQLite analytics plane                -> DataFrame/SQL builders
  (``crawlspark.analytics``)

All per-row logic lives in four Arrow-vectorized kernels
(``crawlspark.kernels``); everything else is declarative DataFrame/SQL so
Catalyst owns pushdown, pruning, join selection, and AQE skew handling.
"""

__version__ = "0.1.0"
