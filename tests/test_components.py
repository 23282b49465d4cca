"""Connected components: chains, multiple components, canonical selection."""

from __future__ import annotations

from chainhouse_spark.operators.components import canonicalize, connected_components


def test_chain_and_islands(spark):
    # chain 1-2-3-4 (one component), pair 10-11, pair 20-21
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (21, 20)], "src long, dst long"
    )
    got = {r.node: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_long_chain_converges(spark):
    n = 30  # diameter 30 chain — stresses the iteration bound
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    got = {r.node: r.cluster_id for r in connected_components(edges, max_iter=40).collect()}
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_canonicalize(spark):
    edges = spark.createDataFrame([(5, 9), (9, 7), (2, 3)], "src long, dst long")
    comp = connected_components(edges)
    cl = {r.cluster_id: (r.n_members, r.canonical_id)
          for r in canonicalize(comp).collect()}
    assert cl == {5: (3, 5), 2: (2, 2)}


def test_star_matches_propagation(spark):
    from chainhouse_spark.operators.components import connected_components_star

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (21, 20), (4, 2)],
        "src long, dst long",
    )
    prop = {r.node: r.cluster_id for r in connected_components(edges).collect()}
    star = {r.node: r.cluster_id
            for r in connected_components_star(edges).collect()}
    assert star == prop


def test_star_long_chain_few_rounds(spark):
    # A diameter-64 chain: min-propagation needs ~64 rounds; the
    # star algorithm must finish within max_iter=8 (edge set folds
    # roughly in half per round).
    from chainhouse_spark.operators.components import connected_components_star

    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    got = {r.node: r.cluster_id
           for r in connected_components_star(edges, max_iter=8).collect()}
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_star_random_graph_equivalence(spark):
    import random

    from chainhouse_spark.operators.components import connected_components_star

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(70)]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src long, dst long")
    prop = {r.node: r.cluster_id for r in connected_components(df).collect()}
    star = {r.node: r.cluster_id for r in connected_components_star(df).collect()}
    assert star == prop
