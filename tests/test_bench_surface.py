"""BENCH and CORRECTNESS must cover the same query set: every
``queries()`` entry gets a timing row and vice versa (a VERDICT-r2
finding — the two lists had drifted apart)."""

from __future__ import annotations


def test_bench_list_matches_query_surface():
    import bench
    import __spark_entry__ as e

    bq = bench.BENCH_QUERIES
    assert len(bq) == len(set(bq)), "duplicate bench entries"
    assert set(bq) == set(e.queries())


def test_bench_compact_line_bounded():
    """The LAST stdout line must survive a bounded tail capture: with
    the full 100+-query suite it stays under 2 KB and parses back to
    the documented shape (round-3's BENCH artifact was truncated)."""
    import json

    import bench

    timings = {name: 1.234 for name in bench.BENCH_QUERIES}
    full, compact = bench.format_output(timings, 123.456, 0.1)
    assert len(compact) < 2000
    rec = json.loads(compact)
    assert rec["metric"] == "suite_wall_clock"
    assert rec["value"] == 123.456
    assert rec["unit"] == "sec"
    assert rec["n_queries"] == len(bench.BENCH_QUERIES)
    assert 0 < len(rec["queries"]) <= 15
    assert json.loads(full)["queries"] == timings
