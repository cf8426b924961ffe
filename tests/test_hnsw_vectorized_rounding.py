"""Pin the HNSW kernels' vectorized distance math to the scalar path.

Optimization r12 (guide §4.2): the beam-search kernels compute each
query/insertion's rounded cosine-distance row in ONE vectorized call —
``np.round(1.0 - np.einsum("ij,j->i", unit, qu), 9)`` — instead of a
per-neighbor ``round(1.0 - float(unit[i] @ qu), 9)``. That is only a
pure speedup if the two paths agree on every distance this corpus
produces: einsum's accumulation order and np.round's scaled-rint
rounding are not GUARANTEED to match ddot + Python round in the last
ulp. This test asserts exact agreement — exhaustively at the 500-row
SFs, densely sampled at sf0.1 — so a numpy/BLAS change that breaks the
equivalence fails loudly here instead of silently perturbing the
graphs.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

SFS = [
    p
    for p in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(p)
]


def _unit_matrix(sf_dir: str) -> np.ndarray:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    vecs = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    return vecs / np.maximum(norms, 1e-12)[:, None]


@pytest.mark.parametrize("sf_dir", SFS)
def test_vectorized_distance_row_matches_scalar(sf_dir):
    unit = _unit_matrix(sf_dir)
    n = len(unit)
    # node-vs-node rows (the insert loops): exhaustive at n=500,
    # every 7th row at larger corpora (still ~285 full rows at sf0.1)
    step = 1 if n <= 500 else 7
    for i in range(0, n, step):
        qu = unit[i]
        vec = np.round(1.0 - np.einsum("ij,j->i", unit, qu), 9)
        for j in range(n):
            assert vec[j] == round(1.0 - float(unit[j] @ qu), 9), (i, j)


@pytest.mark.parametrize("sf_dir", SFS)
def test_vectorized_query_row_and_prune_batches_match_scalar(sf_dir):
    unit = _unit_matrix(sf_dir)
    n = len(unit)
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    # external query normalization exactly as the kernels do it
    for qi in range(min(5, n)):
        qu = np.asarray([float(x) for x in t["embedding"][qi]], dtype=np.float64)
        qn = math.sqrt(float(qu @ qu))
        qu = qu / max(qn, 1e-12)
        vec = np.round(1.0 - np.einsum("ij,j->i", unit, qu), 9)
        for j in range(n):
            assert vec[j] == round(1.0 - float(unit[j] @ qu), 9), (qi, j)
    # small-subset batches (the M-bound prune shape, <= 2m+1 rows)
    rng = np.random.RandomState(12)
    for size in (2, 3, 9, 17):
        for _ in range(50):
            idx = rng.choice(n, size, replace=False).tolist()
            e = int(rng.randint(n))
            ds = np.round(1.0 - np.einsum("ij,j->i", unit[idx], unit[e]), 9)
            for k_, j in enumerate(idx):
                assert ds[k_] == round(1.0 - float(unit[j] @ unit[e]), 9)
