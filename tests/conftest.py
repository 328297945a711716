from __future__ import annotations

import pytest

from crawlspark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crawlspark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture()
def tmp_store_root(tmp_path):
    return str(tmp_path / "store")
