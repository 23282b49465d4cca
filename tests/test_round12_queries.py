"""Round-12 query invariants the oracle-parity gate can't express.

Starts with the ADVICE r11 totality fix: dedup_modality_overlap's 1-row
go/no-go report must stay NULL-free even on a corpus with ZERO near-dup
pairs in either modality (sums over an empty relation are NULL and 0/0 is
NULL in both engines; the sf0.01 parity run always has union > 0, so only
a constructed corpus exercises the guard).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from chainhouse_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def nodup_sf_dir(tmp_path_factory):
    """A tiny sf dir whose corpus has NO near-dup pairs in either
    modality: two orthogonal embeddings (cosine 0 < 0.2 even if sign-LSH
    buckets them together) and two texts sharing no 3-gram."""
    d = tmp_path_factory.mktemp("sf_nodup")
    dim = 16
    e1 = [0.0] * dim
    e2 = [0.0] * dim
    e1[0] = 1.0
    e2[1] = 1.0
    pd.DataFrame(
        {
            "vec_id": pd.array([1, 2], dtype="int64"),
            "embedding": [
                np.asarray(e1, dtype=np.float32),
                np.asarray(e2, dtype=np.float32),
            ],
            "label": pd.array([0, 1], dtype="int32"),
        }
    ).to_parquet(d / "embeddings.parquet")
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six",
    ]
    pd.DataFrame(
        {
            "doc_id": pd.array([1, 2], dtype="int64"),
            "text": texts,
            "lang": ["en", "en"],
            "source": ["src_a", "src_b"],
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    ).to_parquet(d / "documents.parquet")
    return str(d)


def test_modality_overlap_total_on_empty_union(spark, nodup_sf_dir):
    """Every cell of the report is non-NULL and exactly zero when the
    pair union is empty (ADVICE r11: the unguarded form emitted NULL
    from SUM-over-empty and 0/0)."""
    r = QUERIES["dedup_modality_overlap"](spark, nodup_sf_dir).collect()[0]
    assert r.n_semantic == 0
    assert r.n_lexical == 0
    assert r.n_both == 0
    assert r.n_semantic_only == 0
    assert r.n_lexical_only == 0
    assert r.pair_jaccard == 0.0


def test_modality_overlap_unchanged_on_real_corpus(spark):
    """The guard is a no-op whenever union > 0 — the identity the r11
    driver row adjudicated still holds on the real sf0.01 corpus."""
    r = QUERIES["dedup_modality_overlap"](spark, SF).collect()[0]
    union = r.n_semantic + r.n_lexical - r.n_both
    assert union > 0
    assert abs(r.pair_jaccard - r.n_both / union) < 1e-9
