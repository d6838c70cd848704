"""Unit tests for triangle counting (operators/graph.py): exact
counts on known graphs, once-per-triangle uniqueness, orientation
invariance to input edge direction/duplication, and the integer
clustering-coefficient arithmetic."""

from __future__ import annotations

from itertools import combinations

from aoseventstreamer_spark.operators.graph import (
    triangle_stats,
    triangles,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_k4_has_four_triangles_each_once(spark):
    k4 = _edges(spark, list(combinations(range(4), 2)))
    rows = triangles(k4).collect()
    assert len(rows) == 4
    # each unordered node triple appears exactly once
    triples = {tuple(sorted((r.x, r.y, r.z))) for r in rows}
    assert triples == set(combinations(range(4), 3))


def test_path_and_star_have_no_triangles(spark):
    path = _edges(spark, [(i, i + 1) for i in range(6)])
    star = _edges(spark, [(0, i) for i in range(1, 7)])
    assert triangles(path).count() == 0
    assert triangles(star).count() == 0


def test_orientation_invariant_to_direction_and_duplicates(spark):
    tri = [(1, 2), (2, 3), (3, 1)]
    fwd = _edges(spark, tri)
    # reversed directions + duplicate edges must not change the census
    rev = _edges(spark, [(b, a) for a, b in tri] + tri)
    assert triangles(fwd).count() == 1
    assert triangles(rev).count() == 1


def test_stats_integer_clustering_coefficient(spark):
    # triangle + pendant: tri=1, degs = [2,2,3,1] -> wedges = 1+1+3+0 = 5
    g = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    row = triangle_stats(g).collect()[0]
    assert (row.n_triangles, row.n_wedges) == (1, 5)
    assert row.gcc_micro == (3 * 1 * 1_000_000) // 5
