"""connected_components: min-label propagation fixpoint semantics."""

from __future__ import annotations

import pytest

from bigquery_etl_spark.operators.components import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.component for r in connected_components(df).collect()}


def test_chains_cycles_and_merges(spark):
    got = _cc(
        spark,
        [
            (1, 2), (2, 3),          # chain
            (10, 11), (11, 12), (12, 10),  # cycle
            (3, 10),                 # merge chain into cycle
            (20, 21),                # separate pair
            (30, 30),                # self-loop: dropped, node isolated
        ],
    )
    assert {n for n, c in got.items() if c == 1} == {1, 2, 3, 10, 11, 12}
    assert {n for n, c in got.items() if c == 20} == {20, 21}
    assert 30 not in got  # self-loops carry no connectivity


def test_long_chain_converges(spark):
    # diameter 30 chain: needs many sweeps; must still reach fixpoint
    edges = [(i, i + 1) for i in range(100, 130)]
    got = _cc(spark, edges)
    assert set(got.values()) == {100}
    assert len(got) == 31
