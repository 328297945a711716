#!/usr/bin/env python
"""Dump formatted physical plans of the headline queries to PLANS.md so
plan quality (PushedFilters, ReadSchema pruning, BroadcastHashJoin,
codegen spans) is reviewable without running Spark."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawlspark import plans  # noqa: E402
from crawlspark.entry_queries import QUERIES  # noqa: E402
from crawlspark.session import get_spark  # noqa: E402

SHOW = [
    "q01_pricing_summary",
    "q02_filter_project",
    "j01_fetch_join",
    "j02_anti_join",
    "c01_priority_pop",
    "t01_text_profile",
    "t03_exact_dedup",
    "t04_ngram_jaccard",
    "t05_minhash_signature",
    "t07_ann_cosine_topk",
    "t12_simhash64_banded",
    "t22_window_dup_stats",
    "t25_fuzzy_dedup_removals",
    "t28_transition_pagerank",
    "t30_url_filter",
    "t32_sequence_packing",
    "t51_incremental_minhash",
    "t53_host_skew",
    "t54_shard_plan",
    "t55_lsh_error_audit",
    "t58_lm_perplexity",
    "t59_dsir_weights",
    "t60_crawl_budget",
    "t61_dsir_resample",
    "t62_leakage_safe_split",
    "t63_threshold_sweep",
    "t64_vocab_coverage",
    "t65_jl_projection",
    "t66_source_mirrors",
    "t67_line_correction",
    "t68_doc_keywords",
    "t69_nb_lang_id",
    "t70_nb_heldout_eval",
]


def iterative_stage_plans(spark, sf_dir: str, out: list) -> None:
    """t25/t28 checkpoint each iteration, so their gate plans show only
    the post-checkpoint ExistingRDD scan. Dump the interesting
    pre-iteration stages here: the LSH candidate+verify pairs plan
    (t25's per-round cost) and one PageRank iteration's join+agg (t28's
    per-iteration cost)."""
    from pyspark.sql import functions as F

    from crawlspark import dedup, graph, plans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs, n_hashes=8, bands=4, k=3,
                                    threshold=0.2, max_df=100)
    out.append("\n## t25 pre-iteration stage: LSH candidates + exact-Jaccard verify\n")
    out.append("```\n" + plans.explain_str(pairs, "formatted")[:6000] + "\n```\n")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    edges = graph.transition_edges(ev)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outw = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    shares = edges.join(outw, "src").select(
        "src", "dst", (F.col("weight") / F.col("out_w")).alias("share")
    )
    pr = nodes.withColumn("pagerank", F.lit(0.2))
    contrib = (
        shares.join(pr, shares.src == pr.node)
        .groupBy("dst")
        .agg(F.sum(F.col("pagerank") * F.col("share")).alias("c"))
    )
    one_iter = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
        "node", (F.lit(0.15) + F.lit(0.85) * F.coalesce(F.col("c"), F.lit(0.0))).alias("pagerank")
    )
    out.append("\n## t28 one PageRank iteration: edge join + hash agg\n")
    out.append("```\n" + plans.explain_str(one_iter, "formatted")[:6000] + "\n```\n")


def crawl_round_plans(spark, out: list) -> None:
    """Dump the crawl round's own plans (judge r2 #5): the max_by frontier
    resolve, the salted two-phase pop, and the F1 fetch join in BOTH gate
    modes (broadcast hint when the slice is provably small, plain
    sort-merge-able equi-join otherwise)."""
    import tempfile

    from pyspark.sql import functions as F

    from crawlspark import plans
    from crawlspark.crawl import seed_frontier
    from crawlspark.fetch import CorpusFetchBackend
    from crawlspark.scheduler import CrawlConfig, pop_slice
    from crawlspark.schema import PAGES, ROBOTS, SEEDS
    from crawlspark.store import FrontierStore
    from crawlspark.synth import SiteSpec, generate_site

    site = generate_site(SiteSpec(n_hosts=2, lists_per_host=2, per_list=5, seed=3))
    pages = spark.createDataFrame(site["pages"], schema=PAGES)
    seeds = spark.createDataFrame(site["seeds"], schema=SEEDS)
    robots = spark.createDataFrame(site["robots"], schema=ROBOTS)
    cfg = CrawlConfig(round_wall=1e9, per_host_cap=100, max_depth=1)
    root = tempfile.mkdtemp(prefix="plandump_")
    store = FrontierStore(spark, root)
    seed_frontier(spark, store, seeds, cfg)

    state = store.frontier_state()
    out.append("\n## crawl: frontier resolve (max_by hash agg)\n")
    out.append("```\n" + plans.explain_str(state, "formatted")[:5000] + "\n```\n")

    sliced, _denied = pop_slice(state, robots, cfg)
    out.append("\n## crawl: salted two-phase pop window\n")
    out.append("```\n" + plans.explain_str(sliced, "formatted")[:5000] + "\n```\n")

    urls = sliced.select("url")
    bc = CorpusFetchBackend(pages, broadcast_slice=True).fetch(urls)
    out.append("\n## crawl: F1 fetch join, small slice (broadcast hint)\n")
    out.append("```\n" + plans.explain_str(bc, "simple")[:2500] + "\n```\n")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        nb = CorpusFetchBackend(pages, broadcast_slice=False).fetch(urls)
        out.append("\n## crawl: F1 fetch join, big slice (gated off -> sort-merge)\n")
        out.append("```\n" + plans.explain_str(nb, "simple")[:2500] + "\n```\n")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plan-dump", master="local[4]", shuffle_partitions=4)
    # round stamp (VERDICT r5 task 4): derive from the repo's NOTES_r{N}
    # files so the header can never go stale again
    import glob as _glob
    import re as _re
    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _rounds = [
        int(m.group(1))
        for p in _glob.glob(os.path.join(_repo, "NOTES_r*.md"))
        + _glob.glob(os.path.join(_repo, "OPTIMIZATION_r*.md"))
        if (m := _re.search(r"_r0*(\d+)\.md$", p))
    ]
    _round = max(_rounds) if _rounds else "?"
    out = [f"# PLANS — physical plans, round {_round} engine (sf0.01)\n"]
    out.append(
        "Generated by `python bench/dump_plans.py`. Things to check: "
        "`PushedFilters` non-empty on filtered scans, `ReadSchema` pruned "
        "to the projection, `BroadcastHashJoin` on dim joins, no "
        "`BatchEvalPython` in hot paths (Arrow only), single Exchange per "
        "agg/window.\n"
    )
    checklist = ["\n## Checklist (all gate queries)\n",
                 "\n| query | BatchEvalPython (must be none) | ArrowEval (sanctioned kernels only) | exchanges |\n|---|---|---|---|\n"]
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        es = plans.explain_str(df)
        batch = "YES-BAD" if "BatchEvalPython" in es else "-"
        arrow = "arrow" if "ArrowEvalPython" in es else "-"
        checklist.append(f"| {name} | {batch} | {arrow} | {plans.shuffle_count(df)} |\n")
    out.extend(checklist)
    for name in SHOW:
        df = QUERIES[name](spark, sf_dir)
        out.append(f"\n## {name}\n")
        out.append("```\n" + plans.explain_str(df, "formatted")[:6000] + "\n```\n")
    iterative_stage_plans(spark, sf_dir, out)
    crawl_round_plans(spark, out)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
