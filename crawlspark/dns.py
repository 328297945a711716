"""DNS prefetch cache — the batch analog of the reference's Redis DNS
cache (N6).

The reference resolves A records per request through a Redis-backed TTL
cache with a sweeper thread (/root/reference/utils/dns_cache.py:36-113,
wired as a middleware at /root/reference/Douban2/middlewares.py:288-305).
Per-request resolution inside executors is the anti-pattern the cache
exists to avoid — and in Spark the natural unit is the ROUND, not the
request: a round's slice touches a bounded set of distinct hosts (at most
the hosts admitted by politeness budgets), so the engine resolves that
set ONCE, driver-side, through a TTL'd cache, and ships the resulting
``{host: addr}`` map to the fetch backend as a broadcast column — the
same broadcast-tiny-state shape as robots (N4).

Scale note: the number of distinct hosts per round is bounded by
admission control (one budgeted lane per host), not by corpus size; even
a 10^7-URL round against a web-shaped host distribution carries ~10^5
hosts — a few MB of (host, addr) pairs, comfortably broadcast-sized, and
the resolver only runs for cache-MISSING hosts.

No network exists in this sandbox, so the default resolver is an
explicit seam (same pattern as fetch.HttpFetchBackend and
textops.PandasScorer): ``DeterministicResolver`` derives a stable fake
address from the host's md5 for tests (md5 rather than sha1 so the
driver gate `c06_dns_map` can verify the whole prefetch+broadcast-join
path hash-exactly against a DuckDB SQL oracle); a production deployment
slots a real ``socket.getaddrinfo``/dnspython resolver into
``Resolver`` without touching the engine.
"""

from __future__ import annotations

import hashlib
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Resolver:
    """Resolves one hostname to an address string, or raises on failure.
    Production: wrap socket.getaddrinfo / dnspython here (the reference's
    resolver config, utils/dns_cache.py:19-23)."""

    def resolve(self, host: str) -> str:
        raise NotImplementedError

    def ttl(self, host: str) -> float | None:
        """Optional per-record TTL override (the reference caps the
        record's own TTL at 3600 s, utils/dns_cache.py:52-55)."""
        return None


class DeterministicResolver(Resolver):
    """Sandbox resolver: stable fake IPv4 derived from md5(host) — the
    documented stand-in for a real A-record lookup (no network here).
    Oracle-checkable: the c06_dns_map driver gate recomputes these
    addresses in pure DuckDB SQL from md5 hex digits."""

    def resolve(self, host: str) -> str:
        h = hashlib.md5(host.encode("utf-8")).digest()
        return f"10.{h[0]}.{h[1]}.{h[2]}"


class DnsCache:
    """Driver-side TTL cache over a pluggable resolver.

    Mirrors the reference's semantics — TTL'd entries (default 3600 s),
    failures uncached, expired entries dropped lazily on access (the
    batch engine needs no sweeper thread: entries are touched every
    round, /root/reference/utils/dns_cache.py:28-31's 10-min sweeper is
    replaced by the check in :meth:`lookup`).
    """

    def __init__(self, resolver: Resolver, default_ttl: float = 3600.0,
                 clock=time.monotonic):
        self.resolver = resolver
        self.default_ttl = default_ttl
        self._clock = clock
        self._cache: dict[str, tuple[str, float]] = {}
        self.hits = 0
        self.misses = 0
        self.failures = 0

    def lookup(self, host: str) -> str | None:
        now = self._clock()
        ent = self._cache.get(host)
        if ent is not None and now < ent[1]:
            self.hits += 1
            return ent[0]
        self.misses += 1
        try:
            addr = self.resolver.resolve(host)
        except Exception:
            self.failures += 1  # uncached: retried next round
            return None
        ttl = self.resolver.ttl(host) or self.default_ttl
        self._cache[host] = (addr, now + min(ttl, self.default_ttl))
        return addr

    def prefetch(self, hosts: list[str]) -> dict[str, str]:
        """Resolve a round's distinct host set; unresolvable hosts are
        absent from the returned map (their fetches miss and take the
        engine's retry path, P4/N9)."""
        out = {}
        for h in hosts:
            addr = self.lookup(h)
            if addr is not None:
                out[h] = addr
        return out


def with_addrs(spark: SparkSession, slice_df: DataFrame,
               cache: DnsCache) -> DataFrame:
    """Annotate a round's popped slice with resolved addresses.

    One driver-side prefetch over the slice's DISTINCT hosts (bounded by
    admission control — see module docstring), then a broadcast join of
    the tiny (host, addr) map: the N4-robots shape. Rows whose host did
    not resolve carry addr NULL — a fetch backend treats them as
    failures so the engine's retry/backoff engages.
    """
    hosts = [r["host"] for r in slice_df.select("host").distinct().collect()]
    mapping = cache.prefetch(hosts)
    if not mapping:
        return slice_df.withColumn("addr", F.lit(None).cast("string"))
    m = spark.createDataFrame(
        [(h, a) for h, a in mapping.items()], "host string, addr string"
    )
    return slice_df.join(F.broadcast(m), "host", "left")
