"""Interactive analytics query surface — parity with the reference's
``scripts/query_movies.py:41-332`` (menu of canned statistics, keyword /
year-range / genre search with ``?`` parameters, free-form SQL REPL,
csv/json export) and ``utils/data_storage.py:147-196``'s
conditions/order_by/limit query builder.

DataFrame-first: every canned query delegates to analytics.py builders;
ad-hoc SQL goes straight to ``spark.sql`` (Catalyst = the planner the
reference borrowed from SQLite). Parameterization uses Spark's native
parameterized SQL (R6) instead of string concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import analytics as A


class MovieQueryTool:
    def __init__(self, spark: SparkSession, movies: DataFrame):
        self.spark = spark
        self.movies = movies
        movies.createOrReplaceTempView("movies_all")
        self._create_views()

    def _create_views(self) -> None:
        """The 6 SQLite views of the reference output db (S6/R26), as Spark
        views (/root/reference/output/movies.db sqlite_master)."""
        self.spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW movies_summary AS "
            "SELECT rank, name, director, rate, num FROM movies_all "
            "ORDER BY rank"
        )
        self.spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW movies_by_rate AS "
            "SELECT * FROM movies_all ORDER BY rate DESC, num DESC"
        )
        self.spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW movies_by_votes AS "
            "SELECT * FROM movies_all ORDER BY num DESC"
        )
        self.spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW movies_node_stats AS "
            "SELECT node_id, count(*) AS movie_count, "
            "round(avg(rate),2) AS avg_rate FROM movies_all GROUP BY node_id"
        )
        self.spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW movies_duplicates AS "
            "SELECT rank, name, count(*) AS cnt FROM movies_all "
            "GROUP BY rank, name HAVING count(*) > 1"
        )
        self.spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW movies_decades AS "
            "SELECT (try_cast(substr(release_date,1,4) AS int) DIV 10) * 10 "
            "AS decade, count(*) AS movie_count, round(avg(rate),2) AS avg_rate "
            "FROM movies_all GROUP BY 1"
        )

    # -- canned queries (menu items of query_movies.py) ---------------------

    def keyword_search(self, keyword: str) -> DataFrame:
        """4-column OR keyword search (query_movies.py:44-54), R6-style
        parameterized — no SQL injection by construction."""
        return self.spark.sql(
            """SELECT name, director, screenwriter, actors, rate, num
               FROM movies_all
               WHERE name LIKE :kw OR director LIKE :kw
                  OR screenwriter LIKE :kw OR actors LIKE :kw
               ORDER BY rate DESC""",
            args={"kw": f"%{keyword}%"},
        )

    def year_range(self, y0: int, y1: int) -> DataFrame:
        return self.spark.sql(
            """SELECT name, director, release_date, rate FROM movies_all
               WHERE try_cast(substr(release_date,1,4) AS int)
                     BETWEEN :y0 AND :y1
               ORDER BY release_date DESC""",
            args={"y0": y0, "y1": y1},
        )

    def by_genre(self, genre: str, min_rate: float = 0.0) -> DataFrame:
        return self.spark.sql(
            """SELECT name, director, genres, rate, num FROM movies_all
               WHERE genres LIKE :g AND rate >= :r ORDER BY rate DESC""",
            args={"g": f"%{genre}%", "r": min_rate},
        )

    def statistics(self) -> dict[str, DataFrame]:
        """The show_statistics menu (query_movies.py:82-153)."""
        return {
            "overall": A.overall_stats(self.movies),
            "yearly": A.yearly_stats(self.movies),
            "by_rating": A.rate_range_analysis(self.movies),
            "by_genre": A.genre_stats(self.movies),
            "by_country": A.country_stats(self.movies),
            "top10": A.top_k(self.movies, 10),
        }

    def query_builder(
        self,
        conditions: dict[str, object] | None = None,
        order_by: list[tuple[str, bool]] | None = None,
        limit: int = 100,
    ) -> DataFrame:
        """dict-driven WHERE/ORDER/LIMIT builder
        (utils/data_storage.py:147-196 parity)."""
        from pyspark.sql import functions as F

        df = self.movies
        for col, val in (conditions or {}).items():
            df = df.filter(F.col(col) == val)
        if order_by:
            df = df.orderBy(
                *[F.col(c).desc() if desc else F.col(c).asc() for c, desc in order_by]
            )
        return df.limit(limit)

    # -- ad-hoc SQL + export (R27, S7) --------------------------------------

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def export(self, df: DataFrame, path: str, fmt: str = "csv") -> str:
        """Driver-side export of a (small) result — csv/json/xlsx analog of
        query_movies.py:315-332. Large results should df.write instead."""
        pdf = df.toPandas()
        if fmt == "csv":
            pdf.to_csv(path, index=False, encoding="utf-8-sig")
        elif fmt == "json":
            pdf.to_json(path, orient="records", force_ascii=False)
        else:
            raise ValueError(f"unsupported export format: {fmt}")
        return path
