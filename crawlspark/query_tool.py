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
        """Driver-side export of a (small) result — csv/json/xlsx parity
        with query_movies.py:315-332 and the pipeline's Excel summary
        (/root/reference/Douban2/pipelines.py:367-368). Large results
        should df.write instead."""
        pdf = df.toPandas()
        if fmt == "csv":
            pdf.to_csv(path, index=False, encoding="utf-8-sig")
        elif fmt == "json":
            pdf.to_json(path, orient="records", force_ascii=False)
        elif fmt == "xlsx":
            try:  # pandas engine if an Excel lib is installed
                pdf.to_excel(path, index=False)
            except (ImportError, ModuleNotFoundError):
                _write_minimal_xlsx(pdf, path)
        else:
            raise ValueError(f"unsupported export format: {fmt}")
        return path


def _write_minimal_xlsx(pdf, path: str) -> None:
    """Dependency-free XLSX writer (stdlib zipfile + XML): one sheet,
    header row + data rows, numbers typed, strings inline. XLSX is a zip
    of OOXML parts — this emits the minimal valid set ([Content_Types],
    package rels, workbook, workbook rels, sheet1), openable by Excel /
    LibreOffice / openpyxl. Used when no Excel engine is installed (this
    sandbox), keeping S7 export parity real instead of stubbed."""
    import zipfile
    from xml.sax.saxutils import escape

    def cell(v) -> str:
        if v is None or (isinstance(v, float) and v != v):
            return '<c t="inlineStr"><is><t></t></is></c>'
        if isinstance(v, bool):
            return f'<c t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c t="n"><v>{v}</v></c>'
        return f'<c t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    rows = ["<row>" + "".join(cell(str(c)) for c in pdf.columns) + "</row>"]
    for rec in pdf.itertuples(index=False):
        rows.append("<row>" + "".join(cell(v) for v in rec) + "</row>")
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(rows)}</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    pkg_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", pkg_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
