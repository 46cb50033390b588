"""Device-mesh construction and sharding policy.

The reference is single-process/single-thread (SURVEY.md §2b); this
module introduces the framework's parallel substrate:

* ``data`` axis — batches of candidate permutations (DP) and row blocks
  of the contact matrix (SP);
* ``model`` axis — column blocks of the contact matrix (TP).

On a pod slice, ``jax.distributed.initialize`` + this mesh put the
``data`` axis across hosts (DCN) and ``model`` within a slice (ICI).
Collectives are XLA-inserted via NamedSharding/ pjit; nothing here talks
to NCCL/MPI — the XLA runtime is the backend.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh over the available devices.

    Default shape: all devices on the data axis (permutation batches are
    the dominant parallel dimension; BASELINE.json config 3), model=1.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    if np.prod(shape) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def matrix_sharding(mesh: Mesh) -> NamedSharding:
    """2-D sharding of the N x N contact matrix over (data, model)."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Row-block sharding (SP axis) for per-row transforms and scans."""
    return NamedSharding(mesh, P(DATA_AXIS, None))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for candidate-permutation batches (DP)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def row_sharding_all(mesh: Mesh) -> NamedSharding:
    """Row blocks over EVERY device (data x model flattened): the
    sharding for per-row transforms whose row work is independent
    (similarity, log transform, per-row argsort) — no collectives, all
    chips busy."""
    return NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS), None))


def put_rows_padded(mesh: Mesh, matrix) -> Tuple[jax.Array, int]:
    """Zero-pad the row axis to divide the full device count and place
    the matrix row-sharded over every device (``row_sharding_all``).
    Returns (array, original_n); pad rows produce garbage in row-wise
    transforms, which callers slice off with ``[:n]``."""
    import jax.numpy as jnp
    import numpy as _np

    arr = _np.asarray(matrix)
    n = arr.shape[0]
    rows = pad_to_multiple(n, mesh.devices.size)
    if rows != n:
        arr = _np.concatenate(
            [arr, _np.zeros((rows - n,) + arr.shape[1:], dtype=arr.dtype)]
        )
    return jax.device_put(jnp.asarray(arr), row_sharding_all(mesh)), n


def put_vector_padded(mesh: Mesh, vec) -> Tuple[jax.Array, int]:
    """Companion to :func:`put_rows_padded` for per-row vectors (e.g.
    rowSums): same pad + the same flattened-device sharding."""
    import jax.numpy as jnp
    import numpy as _np

    arr = _np.asarray(vec)
    n = arr.shape[0]
    rows = pad_to_multiple(n, mesh.devices.size)
    if rows != n:
        arr = _np.concatenate([arr, _np.zeros(rows - n, dtype=arr.dtype)])
    return (
        jax.device_put(jnp.asarray(arr), NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))),
        n,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def put_matrix_padded(mesh: Mesh, matrix) -> Tuple[jax.Array, int]:
    """Zero-pad an N x N matrix so both dims divide the mesh, then place
    it with the 2-D (data, model) sharding.  Returns (array, original_n);
    callers slice results back with ``[:n, :n]``.

    Padding rows/cols are zero: row-wise transforms produce NaN/garbage
    in the pad region only, which the final slice discards.
    """
    import jax.numpy as jnp
    import numpy as _np

    n = matrix.shape[0]
    rows = pad_to_multiple(n, mesh.shape[DATA_AXIS])
    cols = pad_to_multiple(n, mesh.shape[MODEL_AXIS])
    padded = _np.zeros((rows, cols), dtype=_np.asarray(matrix).dtype)
    padded[:n, :n] = _np.asarray(matrix)
    return jax.device_put(jnp.asarray(padded), matrix_sharding(mesh)), n


def put_batch_padded(mesh: Mesh, batch) -> Tuple[jax.Array, int]:
    """Pad a batch's leading axis to divide the data axis (repeating the
    last element so padded work is valid, just redundant) and place it
    batch-sharded.  Returns (array, original_batch)."""
    import jax.numpy as jnp
    import numpy as _np

    arr = _np.asarray(batch)
    b = arr.shape[0]
    target = pad_to_multiple(max(b, 1), mesh.shape[DATA_AXIS])
    if target != b:
        pad = _np.repeat(arr[-1:], target - b, axis=0)
        arr = _np.concatenate([arr, pad], axis=0)
    return jax.device_put(jnp.asarray(arr), batch_sharding(mesh)), b
