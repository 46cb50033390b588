"""Pallas TPU kernels for the part-1 rank-membership scans.

The hypergeometric breakpoint machinery's inner loop counts, for every
row i of the rank-order matrix R, how many of the first (i - start)
rank entries fall inside [start, i] (growing window,
scaffoldToChromosomes.py:449-463) or how many of the first (cut -
start) fall inside [start, cut] (fixed window, :622-636).  At 1.6 Gb
scale the rank matrix is 16K x 16K int32 = 1 GiB, so the scan is pure
HBM bandwidth.

This kernel fuses mask construction, combination and the row reduction
in VMEM — one pass over the matrix tile grid, int32 accumulation in an
output block revisited across the column grid — and streams the rank
matrix at HBM speed-of-light (~750 GB/s measured on v5e at 16K x 16K,
benchmarks/run_benchmarks.py config 2; HBM peak 819 GB/s).  XLA's
fusion of ops.matrix.growing_window_counts reaches the same rate in
steady state, so the Pallas form's value is (a) guaranteed single-kernel
shape with no 256 MiB boolean intermediates at any tile size and (b) the
batched ``fixed_window_counts_many`` used by the cut-noise filter, where
K scans ride one dispatch (each host round trip over the tunneled link
costs ~150 ms, dwarfing the 1.4 ms scan itself).

Numerical contract: identical counts to the XLA/numpy formulation
(integer compares and sums — no floating point).  Equality is asserted
in tests/test_pallas.py on random matrices and in interpret mode on
CPU, so the same code path is exercised without TPU hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tuned on v5e at 16K x 16K: (512, 2048) streams the 1 GiB rank matrix
# at ~750 GB/s (see benchmarks/run_benchmarks.py config 2)
_TILE_R = 512
_TILE_C = 2048


def _counts_kernel(params_ref, rank_ref, out_ref):
    """One (i, j) grid step: add this column-tile's membership counts
    into the row-tile's output block.

    params_ref (SMEM): [start, cut, growing_flag]; growing mode uses
    per-row upper bounds (rank <= row, prefix < row - start), fixed
    mode the scalar cut (rank <= cut, prefix < cut - start).
    """
    i, j = pl.program_id(0), pl.program_id(1)
    start = params_ref[0]
    cut = params_ref[1]
    growing = params_ref[2]

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rank = rank_ref[:]                                     # [TR, TC] int32
    rows = i * _TILE_R + jax.lax.broadcasted_iota(
        jnp.int32, rank.shape, dimension=0
    )
    cols = j * _TILE_C + jax.lax.broadcasted_iota(
        jnp.int32, rank.shape, dimension=1
    )
    hi = jnp.where(growing == 1, rows, cut)                # rank upper bound
    prefix_end = hi - start                                # cols < prefix_end
    in_prefix = cols < prefix_end
    in_range = (rank >= start) & (rank <= hi)
    out_ref[:] += jnp.sum(
        (in_prefix & in_range).astype(jnp.int32), axis=1, keepdims=True
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _counts_call(rank_mat, params, interpret=False):
    n = rank_mat.shape[0]
    # column grid from shape[1]: column-sliced views (prefetch's
    # width-bucketed dispatch) must scan ONLY their slice, not clamp
    # out-of-bounds tiles back onto tile 0
    grid = (pl.cdiv(n, _TILE_R), pl.cdiv(rank_mat.shape[1], _TILE_C))
    out = pl.pallas_call(
        _counts_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (_TILE_R, _TILE_C),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (_TILE_R, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        interpret=interpret,
    )(params, rank_mat)
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _counts_call_many(rank_mat, params_batch, interpret=False):
    """K scans in ONE dispatch: lax.map over the Pallas kernel.

    Over a thin host link each dispatch costs far more than the scan
    itself; the cut-noise filter needs counts for every (start, cut) in
    its working set per round, so they ship as one [K, 3] batch.
    """
    return jax.lax.map(
        lambda p: _counts_call(rank_mat, p, interpret=interpret), params_batch
    )


def fixed_window_counts_many(
    rank_mat: jnp.ndarray,
    pairs,
    interpret: bool = False,
    n: int | None = None,
) -> np.ndarray:
    """Fixed-window counts for many (start, cut) pairs; one device
    dispatch (K padded to the next power of two to bound executables).
    Returns int32[K, n].

    Pass ``n`` (the real row count) when ``rank_mat`` is already int32
    and tile-padded via :func:`pad_rank` — that skips two full-matrix
    HBM copies per call, which at 16K (1 GiB) cost more than the scan
    itself (RankCounts pads once at construction).
    """
    if n is None:
        n = rank_mat.shape[0]
        rank_mat = pad_rank(rank_mat.astype(jnp.int32))
    pairs = np.asarray(pairs, dtype=np.int32)
    K = pairs.shape[0]
    Kp = 1 << max(K - 1, 0).bit_length() if K else 1
    params = np.zeros((Kp, 3), dtype=np.int32)
    params[:K, 0] = pairs[:, 0]
    params[:K, 1] = pairs[:, 1]
    if K < Kp:
        params[K:] = params[max(K - 1, 0)]
    out = _counts_call_many(rank_mat, jnp.asarray(params), interpret=interpret)
    return np.asarray(out[:K, :n])


def pad_rank(rank_mat: jnp.ndarray) -> jnp.ndarray:
    """Pad to tile multiples with -1 rank entries (never in [start, hi],
    so padding contributes zero to every count)."""
    n = rank_mat.shape[0]
    rows = -n % _TILE_R
    cols = -n % _TILE_C
    if rows or cols:
        rank_mat = jnp.pad(rank_mat, ((0, rows), (0, cols)), constant_values=-1)
    return rank_mat


def growing_window_counts(
    rank_mat: jnp.ndarray, start, interpret: bool = False, n: int | None = None
) -> jnp.ndarray:
    """count[i] = #{ j < i - start : start <= R[i, j] <= i } — Pallas
    fused version of ops.matrix.growing_window_counts.

    Padding rows produce counts for phantom rows (sliced off); padding
    columns hold rank -1 and never count.  Pass ``n`` when ``rank_mat``
    is already int32 + tile-padded (see fixed_window_counts_many).
    """
    if n is None:
        n = rank_mat.shape[0]
        rank_mat = pad_rank(rank_mat.astype(jnp.int32))
    params = _scalar_params(start, 0, 1)
    return _counts_call(rank_mat, params, interpret=interpret)[:n]


def fixed_window_counts(
    rank_mat: jnp.ndarray, start, cut, interpret: bool = False, n: int | None = None
) -> jnp.ndarray:
    """count[i] = #{ j < cut - start : start <= R[i, j] <= cut } — Pallas
    fused version of ops.matrix.fixed_window_counts."""
    if n is None:
        n = rank_mat.shape[0]
        rank_mat = pad_rank(rank_mat.astype(jnp.int32))
    params = _scalar_params(start, cut, 0)
    return _counts_call(rank_mat, params, interpret=interpret)[:n]


def _scalar_params(start, cut, growing) -> jnp.ndarray:
    """(start, cut, growing) as an int32[3] — concrete numpy when the
    inputs are python/numpy ints (one executable per value-independent
    shape), traced when any is a JAX tracer (so the kernels compose
    under jit/fori_loop, e.g. the benchmark timing chains)."""
    if isinstance(start, (int, np.integer)) and isinstance(cut, (int, np.integer)):
        return jnp.asarray(np.array([int(start), int(cut), growing], dtype=np.int32))
    return jnp.stack(
        [
            jnp.asarray(start, dtype=jnp.int32),
            jnp.asarray(cut, dtype=jnp.int32),
            jnp.asarray(growing, dtype=jnp.int32),
        ]
    )
