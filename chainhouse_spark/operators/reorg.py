"""Chain-reorg canonicalization for the blocks table.

The reference appends every fetched block into ReplacingMergeTree keyed by
(hash, number) (src/main.rs:87-88): after a reorg the STALE block (same
height, different hash) stays forever — dedup-by-hash cannot remove it
because it IS a distinct hash. Its users either query "any row per height"
and silently read orphaned blocks, or hand-write latest-wins windows.

This operator derives the canonical chain from the data itself: a block is
canonical iff it is reachable from the tip by parentHash links. The
resolution walks DOWN the chain, but only through AMBIGUOUS heights
(heights holding >1 hash), so the iteration count is the maximum reorg
depth (single digits in practice), never the chain length:

  1. Heights with exactly one hash are canonical by uniqueness — no walk.
  2. Each contiguous ambiguous run is anchored by the canonical block just
     above it (unique by step 1, or the tip rule below) and resolved one
     height per iteration by matching `anchor.parentHash == candidate.hash`.
  3. A fork AT the tip height has no anchor above; it resolves by maximum
     hash — a deterministic stand-in for ReplacingMergeTree's
     latest-insert-wins (document/extend with an ingest-sequence column
     when one exists).

Scale mechanics: ambiguous heights are fork residue — bounded by reorg
frequency x depth, not by chain length — so the run bookkeeping happens
driver-side on a collect() of just those heights, and every per-iteration
join broadcasts the (tiny) frontier against a height-pruned candidate set.
The full blocks table is only ever touched by the single groupBy(number)
that counts hashes per height.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_chain(
    blocks: DataFrame,
    hash_col: str = "hash",
    number_col: str = "number",
    parent_col: str = "parentHash",
    max_depth: int = 64,
) -> DataFrame:
    """(number, hash) of every canonical block — the ancestor chain of the
    tip. Input may hold any mix of canonical and reorged-out rows."""
    cand = blocks.select(
        F.col(number_col).alias("number"),
        F.col(hash_col).alias("hash"),
        F.col(parent_col).alias("parent"),
    ).dropDuplicates(["number", "hash"])

    per_h = cand.groupBy("number").agg(F.count(F.lit(1)).alias("n_hashes"))
    amb_rows = per_h.filter(F.col("n_hashes") > 1).select("number").collect()
    amb = sorted(r.number for r in amb_rows)
    unique = cand.join(
        per_h.filter(F.col("n_hashes") == 1).select("number"), "number"
    )
    if not amb:
        return unique.select("number", "hash")

    spark = blocks.sparkSession
    tip_height = cand.agg(F.max("number")).first()[0]

    # Contiguous ambiguous runs, highest first: [(top, bottom), ...]
    runs: list[tuple[int, int]] = []
    for h in sorted(amb, reverse=True):
        if runs and runs[-1][1] == h + 1:
            runs[-1] = (runs[-1][0], h)
        else:
            runs.append((h, h))
    max_run = max(top - bot + 1 for top, bot in runs)
    if max_run > max_depth:
        raise ValueError(
            f"ambiguous run of {max_run} heights exceeds max_depth="
            f"{max_depth} — not a reorg tail; check the ingest"
        )

    # Anchors: the canonical block just above each run (unique by count),
    # or — for a run touching the tip — the max-hash tiebreak at the top.
    anchor_heights = [top + 1 for top, _ in runs if top != tip_height]
    anchors = unique.filter(F.col("number").isin(anchor_heights)).select(
        "number", "parent"
    )
    if any(top == tip_height for top, _ in runs):
        tip_pick = (
            cand.filter(F.col("number") == tip_height)
            .orderBy(F.desc("hash"))
            .limit(1)
        )
        anchors = anchors.unionAll(
            tip_pick.select(
                (F.col("number") + 1).alias("number"), F.col("hash").alias("parent")
            )
        )
        resolved_tip = tip_pick.select("number", "hash", "parent")
    else:
        resolved_tip = None

    amb_set = set(amb)
    resolved_parts = [] if resolved_tip is None else [resolved_tip]
    frontier = anchors  # rows: (number, parent) — parent names height-1's hash
    for _ in range(max_run):
        step = (
            cand.filter(F.col("number").isin(list(amb_set)))
            .alias("c")
            .join(
                F.broadcast(frontier.alias("f")),
                (F.col("c.number") == F.col("f.number") - 1)
                & (F.col("c.hash") == F.col("f.parent")),
            )
            .select("c.number", "c.hash", "c.parent")
            .localCheckpoint()
        )
        if step.isEmpty():
            break
        resolved_parts.append(step)
        frontier = step.select("number", "parent")

    canon = unique.select("number", "hash")
    if resolved_parts:
        resolved = resolved_parts[0]
        for p in resolved_parts[1:]:
            resolved = resolved.unionAll(p)
        canon = canon.unionAll(
            resolved.select("number", "hash").dropDuplicates(["number", "hash"])
        )
    # Completeness: every height must resolve to exactly one block. A
    # missing parent link (anchor's parentHash matching no candidate) would
    # otherwise silently DROP the ambiguous heights from the canonical
    # chain — for an ingest-correctness operator, fail loudly instead.
    n_heights = cand.select("number").distinct().count()
    n_canon = canon.count()
    if n_canon != n_heights:
        raise ValueError(
            f"canonicalization incomplete: {n_canon} canonical rows for "
            f"{n_heights} heights — broken parentHash linkage in the "
            "ambiguous region (re-fetch those heights)"
        )
    return canon


def reorged_out(
    blocks: DataFrame,
    hash_col: str = "hash",
    number_col: str = "number",
    parent_col: str = "parentHash",
) -> DataFrame:
    """The drop list: (number, hash) rows that are NOT on the canonical
    chain — what a ReplacingMergeTree keyed by hash can never evict."""
    canon = canonical_chain(blocks, hash_col, number_col, parent_col)
    return (
        blocks.select(
            F.col(number_col).alias("number"), F.col(hash_col).alias("hash")
        )
        .dropDuplicates(["number", "hash"])
        .join(canon, ["number", "hash"], "left_anti")
    )
