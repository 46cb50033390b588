"""Float64 numpy oracles for the device kernels.

Two uses:
1. unit tests cross-check every jitted kernel against these;
2. the pipeline's "exact" precision mode runs decision-critical
   transforms here (f64, reference-identical tie behavior) while the
   heavy counting/scoring still runs on device.
"""

from __future__ import annotations

import numpy as np


def to_distance(matrix: np.ndarray) -> np.ndarray:
    """Distance transform feeding UPGMA: (1 - row/rowsum) + 1
    (convertMatrix, scaffoldToChromosomes.py:138-148).

    Must stay f64-bit-identical to the reference in every mode — scipy
    linkage consumes these values and the dendrogram is a byte-equality
    target — and TPU hardware has no f64, so the fast path is the fused
    threaded native kernel (native/distance_transform.cpp; same
    per-element IEEE op sequence, ~10x the naive numpy expression at
    16K).  Row sums stay on numpy: its pairwise-summation order is part
    of the parity contract.  Fallback: in-place numpy (one temporary
    instead of three, still bit-identical)."""
    row_sums = matrix.sum(axis=1, keepdims=True)
    matrix = np.ascontiguousarray(matrix, dtype=np.float64)
    if matrix.size >= (1 << 20):
        try:
            from hic_genome_assembler_tpu.io import native

            if native.available():
                return native.distance_transform_f64(matrix, row_sums)
        except Exception:
            pass
    out = matrix / row_sums
    np.subtract(1.0, out, out=out)
    np.add(out, 1.0, out=out)
    return out


def to_similarity(matrix: np.ndarray, row_sums: np.ndarray) -> np.ndarray:
    return row_sums[:, None] * (1.0 - (matrix - 1.0))


def log_transform(matrix, log_base=10.0, reverse=False, plus_one=True):
    nz = matrix != 0.0
    out = np.zeros_like(matrix, dtype=np.float64)
    if not reverse:
        shifted = matrix + 1.0 if plus_one else matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            vals = np.log(shifted) / np.log(log_base)
        out[nz] = vals[nz]
    else:
        powed = np.power(float(log_base), matrix)
        vals = powed - 1.0 if plus_one else powed
        out[nz] = vals[nz]
    return out


def rank_matrix_desc(matrix: np.ndarray) -> np.ndarray:
    """Reference-identical rank matrix: numpy default argsort reversed
    (scaffoldToChromosomes.py:1132: ``argsort(adjMat, axis=1)[:, ::-1]``)."""
    return np.asarray(np.argsort(matrix, axis=1)[:, ::-1])


def growing_window_counts(rank_mat: np.ndarray, start: int) -> np.ndarray:
    n = rank_mat.shape[0]
    counts = np.zeros(n, dtype=np.int64)
    for i in range(n):
        prefix = rank_mat[i, : max(i - start, 0)]
        counts[i] = int(((prefix >= start) & (prefix <= i)).sum())
    return counts


def fixed_window_counts(rank_mat: np.ndarray, start: int, cut: int) -> np.ndarray:
    n = rank_mat.shape[0]
    counts = np.zeros(n, dtype=np.int64)
    width = max(cut - start, 0)
    for i in range(n):
        prefix = rank_mat[i, :width]
        counts[i] = int(((prefix >= start) & (prefix <= cut)).sum())
    return counts


def cost_function(matrix: np.ndarray, total: float) -> float:
    """The reference cost: harmonically-weighted cumulative
    super-diagonal traces (orderGenome.py:184-191), f64, identical
    summation order."""
    cumulative, cost = 0.0, 0.0
    n = len(matrix)
    for i in range(1, n):
        cumulative += float(np.trace(matrix, offset=i))
        cost += cumulative / total / float(i)
    return cost


def upper_triangle_total(matrix: np.ndarray) -> float:
    """sum over offsets >= 1 of trace(matrix, offset) — the cost
    normalizer (orderGenome.py:343,448,506)."""
    return float(sum(np.trace(matrix, offset=i) for i in range(1, len(matrix))))
