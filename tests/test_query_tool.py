"""Query-tool parity tests: views, parameterized queries, builder, SQL
passthrough, export (reference scripts/query_movies.py semantics)."""

from __future__ import annotations

import json

import pytest

from crawlspark.movies import movies_df
from crawlspark.query_tool import MovieQueryTool


@pytest.fixture(scope="module")
def tool(spark):
    return MovieQueryTool(spark, movies_df(spark))


def test_views_exist_and_sane(tool, spark):
    assert spark.sql("SELECT * FROM movies_summary").count() == 250
    assert spark.sql("SELECT * FROM movies_duplicates").count() == 0
    decades = {r["decade"] for r in spark.sql("SELECT decade FROM movies_decades").collect()}
    assert all(d % 10 == 0 for d in decades)


def test_keyword_search_parameterized(tool):
    rows = tool.keyword_search("周星驰").collect()
    assert rows and all("周星驰" in r["actors"] for r in rows)
    # injection attempt comes back empty instead of exploding the query
    assert tool.keyword_search("x' OR 1=1 --").count() == 0


def test_year_range(tool):
    rows = tool.year_range(2000, 2010).collect()
    assert rows
    assert all(2000 <= int(r["release_date"][:4]) <= 2010 for r in rows)


def test_by_genre(tool):
    rows = tool.by_genre("科幻", min_rate=8.0).collect()
    assert all("科幻" in r["genres"] and r["rate"] >= 8.0 for r in rows)


def test_statistics_menu(tool):
    stats = tool.statistics()
    assert stats["overall"].collect()[0]["total_movies"] == 250
    assert stats["top10"].count() == 10


def test_query_builder(tool):
    df = tool.query_builder(
        conditions={"node_id": "douban1"},
        order_by=[("rate", True), ("num", True)],
        limit=5,
    )
    rows = df.collect()
    assert len(rows) == 5
    rates = [r["rate"] for r in rows]
    assert rates == sorted(rates, reverse=True)


def test_sql_passthrough_and_export(tool, tmp_path):
    df = tool.sql("SELECT rank, name FROM movies_all WHERE rank <= 3 ORDER BY rank")
    p = tool.export(df, str(tmp_path / "out.json"), fmt="json")
    data = json.load(open(p))
    assert [d["rank"] for d in data] == [1, 2, 3]
    p2 = tool.export(df, str(tmp_path / "out.csv"), fmt="csv")
    assert open(p2, encoding="utf-8-sig").readline().strip() == "rank,name"


def test_xlsx_export_roundtrip(tool, tmp_path):
    """S7 xlsx parity (reference query_movies.py:324-325 / pipelines.py:
    367-368): the dependency-free writer must produce a valid OOXML zip
    whose sheet carries header + typed values."""
    import zipfile
    import xml.etree.ElementTree as ET

    df = tool.sql("SELECT rank, name FROM movies_all WHERE rank <= 3 ORDER BY rank")
    p = tool.export(df, str(tmp_path / "out.xlsx"), fmt="xlsx")
    with zipfile.ZipFile(p) as z:
        names = set(z.namelist())
        assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
                "xl/worksheets/sheet1.xml"} <= names
        sheet = z.read("xl/worksheets/sheet1.xml").decode("utf-8")
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    rows = ET.fromstring(sheet).findall(".//m:row", ns)
    assert len(rows) == 4  # header + 3 data rows
    header = [t.text for t in rows[0].findall(".//m:t", ns)]
    assert header == ["rank", "name"]
    first_rank = rows[1].find(".//m:v", ns).text
    assert first_rank == "1"


def test_crawl_summary_artifact(tool, tmp_path):
    """S8: the crawl_summary.txt text report (pipelines.py:397-405 shape)."""
    from crawlspark.analytics import write_crawl_summary

    p = write_crawl_summary(tool.movies, str(tmp_path / "crawl_summary.txt"),
                            timestamp="20250305_220816")
    text = open(p, encoding="utf-8").read()
    assert "采集时间: 20250305_220816" in text
    assert "总数据量: 250" in text
    assert "排名范围: 1 - 250" in text
    assert "节点数据统计:" in text
    # per-node lines sum to the total
    counts = [int(line.rsplit(": ", 1)[1][:-1]) for line in text.splitlines()
              if line.endswith("条")]
    assert sum(counts) == 250
