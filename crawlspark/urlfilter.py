"""URL-level filtering — the FIRST stage of a web-scale corpus pipeline.

RefinedWeb, C4, and the Common-Crawl curriculum all filter on the URL
string BEFORE fetching or parsing a byte of content (blocklisted
domains, media/binary extensions, spammy URL shapes): it is the cheapest
attrition stage, so it must be pure column algebra — stateless
projection + filter, zero shuffles, fully pushed into the scan.

The reference's crawl plane has the same hook as robots/dupefilter
admission (/root/reference/url_dispatcher/url_dispatcher.py:143-200
checks seen-set + politeness before dispatch); this module is the
content-policy analog a 100 TB crawl adds in front of the frontier
MERGE.

Every rule is a named boolean; a row is attributed to its FIRST failing
rule (stable order below) so the attrition report is a partition of the
corpus — exactly the funnel accounting a production pipeline publishes.

Scale notes: a human-authored blocklist (the UT1 adult/ads categories
are ~4M hosts) compiles to ``isin`` only while tiny; above broadcast
size pass ``blocked_hosts_df`` and the check becomes a left-semi join
against a host-keyed table — both paths emit the same boolean. Host and
path come from one regexp each (portable to the DuckDB oracle, unlike
parse_url), evaluated once per row inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# attribution order: cheap + decisive rules first (the order is part of
# the operator contract — first-fail attribution depends on it)
RULES = (
    "blocked_domain",
    "bad_extension",
    "too_long",
    "too_many_params",
    "digit_heavy",
)

BAD_EXTENSIONS = (
    "jpg|jpeg|png|gif|webp|svg|ico|css|js|woff2?|mp3|mp4|avi|mov|"
    "pdf|zip|gz|tar|rar|7z|exe|dmg|iso"
)


def host_col(url: Column) -> Column:
    """scheme://HOST[/...] — one regexp, portable to the SQL oracle."""
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)


def path_col(url: Column) -> Column:
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)


def query_col(url: Column) -> Column:
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def n_params_col(url: Column) -> Column:
    q = query_col(url)
    return F.when(q == "", F.lit(0)).otherwise(F.size(F.split(q, "&")))


def digit_ratio_col(url: Column) -> Column:
    return (
        F.length(F.regexp_replace(url, r"[^0-9]", "")).cast("double")
        / F.length(url)
    )


def url_filter(
    frontier: DataFrame,
    url_col: str = "url",
    blocked_hosts: list[str] | None = None,
    blocked_hosts_df: DataFrame | None = None,
    max_len: int = 256,
    max_params: int = 4,
    max_digit_ratio: float = 0.5,
) -> DataFrame:
    """Annotate every row with ``host``, ``first_fail`` (first failing
    rule name, or 'kept'), and ``keep``. Stateless projection when the
    blocklist is a literal list; one left join (AQE picks broadcast for
    a small blocklist side) when ``blocked_hosts_df(host)`` is given.
    """
    url = F.col(url_col)
    host = host_col(url)
    out = frontier.withColumn("host", host)
    if blocked_hosts_df is not None:
        blocked = blocked_hosts_df.select(
            F.col("host"), F.lit(True).alias("_blocked")
        ).dropDuplicates(["host"])
        out = out.join(blocked, "host", "left")
        is_blocked = F.coalesce(F.col("_blocked"), F.lit(False))
    else:
        hosts = blocked_hosts or []
        is_blocked = (
            F.col("host").isin(hosts) if hosts else F.lit(False)
        )
    checks = [
        ("blocked_domain", is_blocked),
        ("bad_extension",
         path_col(url).rlike(r"\.(" + BAD_EXTENSIONS + r")$")),
        ("too_long", F.length(url) > max_len),
        ("too_many_params", n_params_col(url) > max_params),
        ("digit_heavy", digit_ratio_col(url) > max_digit_ratio),
    ]
    verdict = None
    for name, cond in checks:
        verdict = (
            F.when(cond, F.lit(name))
            if verdict is None
            else verdict.when(cond, F.lit(name))
        )
    out = out.withColumn("first_fail", verdict.otherwise(F.lit("kept")))
    out = out.withColumn("keep", F.col("first_fail") == "kept")
    return out.drop("_blocked") if blocked_hosts_df is not None else out


def url_trap_stats(
    frontier: DataFrame,
    url_col: str = "url",
    min_urls: int = 100,
) -> DataFrame:
    """Crawl-trap (spider-trap) detection by URL-template explosion —
    the frontier-hygiene pass big crawlers run between link discovery
    and the frontier MERGE. Calendar pages, session-id mints, and
    faceted-search mazes all share one signature: a single path
    TEMPLATE (the path with digit runs collapsed to ``D``) expands into
    an unbounded set of concrete URLs on one host, starving every other
    host's budget. The reference hits the same failure through its
    per-domain politeness window (/root/reference/url_dispatcher/
    url_dispatcher.py:143-200 paces hosts but never notices the queue
    behind one host is infinite); this operator makes it observable so
    admission can cap or drop the template.

    Output per (host, template): n_urls, host_share (this template's
    fraction of the host's frontier), is_trap (n_urls >= min_urls).

    Scale shape: one projection (two regexes, whole-stage codegen) +
    one hash-agg — within-template duplicates collapse map-side, so the
    shuffle carries |distinct (host, template)| rows, not the frontier.
    The share window runs over that aggregate partitioned by host,
    never over raw URLs. No corpus-derived broadcast anywhere."""
    url = F.col(url_col)
    template = F.regexp_replace(path_col(url), r"[0-9]+", "D")
    agg = (
        frontier.select(
            host_col(url).alias("host"), template.alias("template")
        )
        .groupBy("host", "template")
        .agg(F.count("*").alias("n_urls"))
    )
    from pyspark.sql import Window

    host_total = F.sum("n_urls").over(Window.partitionBy("host"))
    return agg.select(
        "host",
        "template",
        "n_urls",
        F.round(F.col("n_urls") / host_total.cast("double"), 6).alias(
            "host_share"
        ),
        (F.col("n_urls") >= min_urls).alias("is_trap"),
    )


def url_filter_report(filtered: DataFrame) -> DataFrame:
    """Attrition funnel: rows per first-failing rule + corpus share.
    One hash-agg collapses the corpus to <=|RULES|+1 rows; the share
    denominator is an unpartitioned window over that tiny aggregate
    (never a second scan of the input)."""
    from pyspark.sql import Window

    agg = filtered.groupBy("first_fail").agg(F.count("*").alias("n_urls"))
    tot = F.sum("n_urls").over(Window.partitionBy())
    return agg.withColumn(
        "share", F.round(F.col("n_urls") / tot.cast("double"), 6)
    )
