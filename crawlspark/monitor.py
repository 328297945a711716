"""Crawl progress rendering — the reference's live monitor, made columnar.

The reference runs a curses-style monitor polling Redis stats hashes and
printing per-node queue/seen/result gauges
(/root/reference/utils/monitor.py:148-166). This engine's observability
is the metrics TABLE (one row per (round, metric)); this module is the
convenience reader that renders it the way the monitor did — per-round
progress plus cumulative totals — from a store path or a FrontierStore.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .store import FrontierStore

_COLS = ["popped", "fetched", "missed", "denied", "new_links", "items", "exhausted"]


def progress_frame(store: FrontierStore):
    """Pivot the metrics log into one row per round (round ASC), one
    column per counter — the tabular form of the monitor screen."""
    m = store.metrics_state()
    if m is None:
        return None
    return (
        m.groupBy("round")
        .pivot("metric", _COLS)
        .agg(F.first("value"))
        .na.fill(0)
        .orderBy("round")
    )


def render_progress(store: FrontierStore) -> str:
    """Text rendering (monitor.py:148-166 analog): per-round rows plus a
    totals line and current frontier gauges."""
    pf = progress_frame(store)
    if pf is None:
        return "(no metrics yet)"
    rows = pf.collect()
    head = f"{'round':>5} " + " ".join(f"{c:>9}" for c in _COLS)
    lines = [head]
    totals = dict.fromkeys(_COLS, 0)
    for r in rows:
        lines.append(
            f"{r['round']:>5} " + " ".join(f"{r[c] or 0:>9}" for c in _COLS)
        )
        for c in _COLS:
            totals[c] += r[c] or 0
    lines.append("total " + " ".join(f"{totals[c]:>9}" for c in _COLS))
    st = store.frontier_state()
    if st is not None:
        gauges = {
            row["status"]: row["n"]
            for row in st.groupBy("status").agg(F.count("*").alias("n")).collect()
        }
        lines.append("frontier now: " + ", ".join(f"{k}={v}" for k, v in sorted(gauges.items())))
    return "\n".join(lines)
