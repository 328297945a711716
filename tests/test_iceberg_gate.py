"""The Iceberg backend is config-gated: without a catalog it refuses with
a pointer to the Parquet backend (sandbox constraint, SURVEY §1.3)."""

from __future__ import annotations

import pytest

from crawlspark.store_iceberg import IcebergFrontierStore, iceberg_available


def test_gate_refuses_without_catalog(spark):
    assert not iceberg_available(spark, "crawl")
    with pytest.raises(RuntimeError, match="snapshot-Parquet backend"):
        IcebergFrontierStore(spark, "crawl.crawldb")
