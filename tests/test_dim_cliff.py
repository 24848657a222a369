"""High-dimension embedding paths (above WIDEN_DIM_CLIFF).

The widened-scalar-column strategy builds O(dim) expression nodes per
dot-product site; at realistic embedding dims (384-1024) that is the
same Catalyst plan-size cliff class that OOMed the round-2 IVF plan.
Above :data:`WIDEN_DIM_CLIFF` the operators switch to the array form
(zip_with + aggregate — O(1) plan nodes). These tests pin:

  * correctness at dim=256 / dim=512 against a Python replica of the
    exact sequential-sum arithmetic, and
  * a wall-clock bound that fails loudly if plan construction ever
    regresses to super-linear behavior.
"""

from __future__ import annotations

import math
import random
import time

import pytest

from bb_bigdata_log_tools_spark.operators import similarity


def _mk_embeddings(spark, n: int, dim: int, n_labels: int = 4, seed: int = 7):
    """Label-clustered vectors: per-label base + small noise, so some
    same-label pairs clear a 0.3 cosine threshold and cross-label ones
    mostly don't."""
    rng = random.Random(seed)
    bases = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_labels)]
    rows = []
    for i in range(n):
        lab = i % n_labels
        vec = [b + rng.uniform(-0.3, 0.3) for b in bases[lab]]
        rows.append((i, lab, vec))
    df = spark.createDataFrame(rows, "vec_id long, label long, embedding array<double>")
    return df, rows


def _seq_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cos(a, b):
    return _seq_dot(a, b) / math.sqrt(_seq_dot(a, a)) / math.sqrt(_seq_dot(b, b))


@pytest.mark.parametrize("dim", [256, 512])
def test_ann_bruteforce_highdim_matches_python(spark, dim):
    df, rows = _mk_embeddings(spark, 40, dim)
    t0 = time.perf_counter()
    got = similarity.ann_topk_bruteforce(df, n_queries=4, k=3, dim=dim).collect()
    elapsed = time.perf_counter() - t0
    # The round-2 widened-IVF plan died (OOM/StackOverflow) at dim=64;
    # the array path must stay flat — seconds, not minutes, at dim=512.
    assert elapsed < 120, f"high-dim plan took {elapsed:.1f}s — plan-size cliff?"

    expected = {}
    for q in range(4):
        scored = [
            (round(_cos(rows[q][2], rows[n][2]), 4), n)
            for n in range(len(rows))
            if n != q
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        expected[q] = [(n, c) for c, n in scored[:3]]

    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append((r.rank, r.n_id, r.cos_sim))
    assert set(by_q) == set(expected)
    for q, want in expected.items():
        have = [(n, c) for _, n, c in sorted(by_q[q])]
        assert have == want, f"q={q}: {have} != {want}"


def test_dedup_embedding_highdim_matches_python(spark):
    dim = 256
    df, rows = _mk_embeddings(spark, 30, dim)
    got = {
        (r.vec_id1, r.vec_id2): r.cos_sim
        for r in similarity.dedup_embedding(df, 0.3, dim=dim).collect()
    }
    want = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if rows[i][1] != rows[j][1]:
                continue
            c = round(_cos(rows[i][2], rows[j][2]), 4)
            if c >= 0.3:
                want[(i, j)] = c
    assert got == want
    assert want, "fixture produced no qualifying pairs — test is vacuous"


def test_ann_lsh_highdim_runs_and_scores_exact(spark):
    dim = 384
    df, rows = _mk_embeddings(spark, 30, dim)
    got = similarity.ann_topk_lsh(df, n_queries=3, k=2, n_planes=4, dim=dim).collect()
    # Bucketing is approximate; the *scores* of whatever candidates it
    # returns must still be exact.
    for r in got:
        assert r.cos_sim == round(_cos(rows[r.q_id][2], rows[r.n_id][2]), 4)


def test_ivf_highdim_runs(spark):
    dim = 256
    df, rows = _mk_embeddings(spark, 40, dim)
    got = similarity.ann_topk_ivf(
        df, n_queries=4, k=3, n_cells=4, n_probe=2, dim=dim
    ).collect()
    assert got, "IVF returned no rows at high dim"
    for r in got:
        assert r.cos_sim == round(_cos(rows[r.q_id][2], rows[r.n_id][2]), 4)


def test_low_dim_still_uses_widened_path(spark):
    # Guard: the codegen hot path must remain the default below the
    # cliff — the analyzed plan of the prepped frame contains widened
    # scalar columns at dim=64 and none at dim=256.
    df, _ = _mk_embeddings(spark, 8, 64)
    wide = similarity.prep_embeddings(df, 64, ["vec_id"])
    assert "e63" in wide.columns and "embedding" not in wide.columns
    df2, _ = _mk_embeddings(spark, 8, 256)
    narrow = similarity.prep_embeddings(df2, 256, ["vec_id"])
    assert narrow.columns == ["vec_id", "embedding", "norm"]
