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
