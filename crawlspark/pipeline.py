"""End-to-end training-corpus preparation — the composed pipeline a
100 TB web-text run actually executes, built entirely from this repo's
operators (C4/Gopher-shaped):

    documents
      -> language filter            (textops.lang_id — pure column expr)
      -> quality filter             (textops.quality_score >= threshold)
      -> exact dedup                (keep min doc_id per fingerprint)
      -> near-dup cluster removal   (ngram Jaccard pairs -> connected
                                     components -> keep min doc per cluster)
      -> surviving corpus

Everything stays declarative DataFrame algebra (the one iterative piece,
connected components, is dedup.dup_clusters), so the WHOLE pipeline is
SQL-expressible and hash-verified against DuckDB in the driver gate
(entry_queries.t13/t14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import textops as tx
from .dedup import dup_clusters, ngram_jaccard_pairs


def corpus_prep(
    documents: DataFrame,
    lang: str = "en",
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.5,
    k: int = 3,
    max_df: int | None = 100,
    scorer: tx.TextScorer | None = None,
) -> DataFrame:
    """Surviving (doc_id) set after the full prep pipeline.

    Dedup keeps the LOWEST doc_id of each exact-duplicate group and of
    each near-dup cluster (deterministic canonical representative). The
    near-dup stage runs on the exact-deduped survivors, so exact copies
    never inflate a cluster.

    ``scorer`` (textops.TextScorer) swaps the language/quality models:
    default = the oracle-checkable heuristics (t14 stays hash-exact); a
    real fastText/KenLM model plugs in via textops.PandasScorer without
    touching this pipeline.
    """
    scorer = scorer or tx.HeuristicScorer()
    base = documents.filter(
        (scorer.lang_col(F.col("text")) == lang)
        & (scorer.quality_col(F.col("text")) >= min_quality)
    ).select("doc_id", "text")

    # exact dedup: canonical representative per fingerprint
    keep_exact = (
        base.select(tx.doc_fingerprint(F.col("text")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = base.join(keep_exact, "doc_id", "left_semi")

    # near-dup clusters among survivors; drop everything but the cluster min
    pairs = ngram_jaccard_pairs(survivors, k=k, threshold=jaccard_threshold, max_df=max_df)
    clusters = dup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return survivors.join(losers, "doc_id", "left_anti").select("doc_id")
