"""Device mesh & sharding runtime.

The reference is single-process single-GPU (SURVEY.md §2.2). Here we define the
multi-chip substrate the engine scales on: a 2-D logical mesh with

  * ``data``  — batch-parallel axis (BPR/BCE triples, VAE user rows)
  * ``table`` — node/catalog axis: rows of the (n_users+n_items, d) embedding
    tables, node representations and the item axis of score matrices are
    sharded here; the SpMM and top-k kernels ride XLA collectives over it.

On a single chip everything degrades to a (1, 1) mesh and shardings become
no-ops. Tests force an 8-device CPU mesh via
``XLA_FLAGS=--xla_force_host_platform_device_count=8``.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TABLE_AXIS = "table"


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    data: int | None = None,
    table: int | None = None,
) -> Mesh:
    """Build a ('data', 'table') mesh over the available devices.

    If axis sizes are not given, puts everything on the table axis when there
    are multiple devices (catalog size, not batch size, is the scale axis of
    this workload — SURVEY.md §5).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None and table is None:
        data, table = 1, n
    elif data is None:
        data = n // table
    elif table is None:
        table = n // data
    if data * table != n:
        raise ValueError(f"mesh {data}x{table} != {n} devices")
    arr = np.asarray(devices).reshape(data, table)
    return Mesh(arr, (DATA_AXIS, TABLE_AXIS))


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Rows sharded across the table axis (embedding tables, node reps)."""
    return NamedSharding(mesh, P(TABLE_AXIS, None))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded across the data axis (batches)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)
