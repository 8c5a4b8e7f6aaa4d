"""Multi-host initialization + mesh construction.

The reference is a single process (SURVEY.md §2c).  On a multi-host TPU
slice, call :func:`initialize` once per process before any jax use; meshes
then span every chip in the slice and the sharded BA's ``psum`` of the
reduced camera system rides ICI within a slice and DCN across slices
(BASELINE.json north star).

This module is exercised single-process in tests via
``jax_num_cpu_devices=8`` (the same collective code paths compile and run);
real multi-host bring-up only adds the ``jax.distributed.initialize`` call.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed (no-op when single-process with no args)."""
    if coordinator_address is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "lm", devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over every addressable chip in the (possibly multi-host)
    runtime — the landmark-shard axis for distributed BA."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def grid_mesh(data: int, model: int, axes=("data", "lm")) -> Mesh:
    """2-D mesh: sequences over ``data``, landmark blocks over ``model`` —
    the combined DP x shard layout for batched-sequence BA."""
    devs = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, axes)
