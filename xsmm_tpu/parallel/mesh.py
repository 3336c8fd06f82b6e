"""Device mesh helpers — the topology layer for multi-chip/multi-host scaling.

The reference has no in-core distributed layer (SURVEY.md §2.4): its
parallelism is caller-owned thread teams plus MLSL data parallelism in the
GxM sample (samples/deeplearning/gxm/src/Conv.cpp:350).  The TPU-native
equivalent is a jax.sharding.Mesh with named axes; XLA inserts ICI/DCN
collectives from sharding annotations.

Axis convention used across the framework:
  "dp"  - data parallel (batch / problem-instance dimension)
  "mp"  - model/row parallel (matrix row-block partitioning for the
          distributed SpMM/GEMM paths)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("dp", "mp"),
              devices=None) -> Mesh:
    """Build a mesh over available devices.

    Default: all devices on the "dp" axis, "mp"=1.  ``shape`` entries may be
    -1 (inferred).  Degrades gracefully to (1, 1) on a single chip.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // max(known, 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {tuple(shape)} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def dp_sharding(mesh: Mesh, axis: int = 0, name: str = "dp") -> NamedSharding:
    """Shard one array axis across the data-parallel mesh axis."""
    spec = [None] * (axis + 1)
    spec[axis] = name
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Initialize cross-host JAX (the GxM MLSL-environment analog).

    One process per host; afterwards jax.devices() spans all hosts and the
    same mesh/sharding code scales over DCN.  Arguments default to the
    standard env vars (JAX_COORDINATOR_ADDRESS etc. / TPU metadata); no-op
    when already initialized or single-process.
    """
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError) as e:
        already = "once" in str(e).lower() or "already" in str(e).lower()
        if explicit and not already:
            # a genuine failure (bad coordinator, unreachable network) must
            # not silently degrade a multi-host job to N single-host jobs
            raise
    return jax.process_count()


def host_count() -> int:
    return jax.process_count()


def local_device_count() -> int:
    return jax.local_device_count()
