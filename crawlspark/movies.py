"""Deterministic 250-row ``movies`` golden fixture (FIXTURES.md §5).

Exact shape of the reference's analytical output: Parquet golden
``/root/reference/output/parquet/movies_all_20250305_220816.parquet`` and
SQLite DDL ``/root/reference/utils/data_storage.py:42-60``. At this parity
boundary, list-valued fields are JSON-string encoded
(``Douban2/pipelines.py:160-162``) except ``genres``, which the reference's
SQL corpus treats as a '/'-joined string (``INSTR(genres,'/')``,
``sql/queries.sql:226``) — we mirror that observed storage.
"""

from __future__ import annotations

import json
import random

from pyspark.sql import types as T

MOVIES_SQL_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("director", T.StringType(), True),
        T.StructField("screenwriter", T.StringType(), True),  # JSON list string
        T.StructField("actors", T.StringType(), True),        # JSON list string
        T.StructField("genres", T.StringType(), True),        # '/'-joined
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

_GENRES = ["剧情", "喜剧", "动作", "爱情", "科幻", "动画", "悬疑", "犯罪", "战争"]
_COUNTRIES = ["中国大陆", "美国", "日本", "法国", "英国", "韩国", "意大利"]
_LANGS = ["汉语普通话", "英语", "日语", "法语", "韩语"]


def movies_rows(n: int = 250, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for rank in range(1, n + 1):
        # director pool sized so many directors have >=2 films (HAVING>=2
        # queries non-empty, sql/queries.sql:212)
        director = f"导演{rank % 97:02d}"
        year = 1930 + (rank * 37) % 96  # 1930..2025
        runtime = "" if rank % 50 == 0 else f"{80 + (rank * 13) % 120}分钟"
        genres = "/".join(
            rng.sample(_GENRES, k=1 + rank % 3)
        )
        rows.append(
            {
                "rank": rank,
                "name": f"电影{rank:03d}",
                "director": director,
                "screenwriter": json.dumps([f"编剧{rank % 53}", f"编剧{rank % 31}"], ensure_ascii=False),
                "actors": json.dumps([f"演员{(rank * 7) % 101}", f"演员{(rank * 11) % 101}", "周星驰" if rank % 40 == 0 else f"演员{rank % 59}"], ensure_ascii=False),
                "genres": genres,
                "country": _COUNTRIES[rank % len(_COUNTRIES)],
                "language": _LANGS[rank % len(_LANGS)],
                "release_date": f"{year}-{1 + (rank % 12):02d}-{1 + (rank % 28):02d}",
                "runtime": runtime,
                "imdb": f"tt{1000000 + rank * 137}",
                "rate": round(7.5 + ((rank * 2654435761) % 2200) / 1000.0, 1),
                "num": 10_000 + (rank * 40503) % 3_190_000,
                "crawl_time": f"2025-03-05 22:{(rank // 60) % 60:02d}:{rank % 60:02d}",
                "node_id": f"douban{1 + rank % 3}",
            }
        )
    return rows


def movies_df(spark, n: int = 250, seed: int = 42):
    return spark.createDataFrame(movies_rows(n, seed), schema=MOVIES_SQL_SCHEMA)
