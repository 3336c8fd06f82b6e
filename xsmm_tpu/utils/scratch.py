"""Memory / scratch introspection.

Reference: the scratch-pool allocator and its introspection
(libxsmm_scratch_malloc / libxsmm_get_scratch_info, src/libxsmm_malloc.c:
1181,1436; env LIBXSMM_SCRATCH_*).

TPU-native mapping: device memory is managed by the XLA allocator (arena +
buffer donation); the scratch-pool *role* — reusable workspace bounded by a
limit — is played by XLA's temp allocation inside each executable, and
user-level pooling is expressed with jax donation (see donate()).  This
module provides the introspection surface: live/peak device memory per
device and a scratch-info report shaped like libxsmm_get_scratch_info.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax


@dataclasses.dataclass
class ScratchInfo:
    """libxsmm_scratch_info analog."""

    size: int = 0        # bytes currently allocated (live)
    local: int = 0       # peak bytes
    npools: int = 1      # XLA arena = one pool
    nmallocs: int = 0    # allocation count (when the backend reports it)


def device_memory_stats(device=None) -> Dict[str, int]:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


def get_scratch_info(device=None) -> ScratchInfo:
    """libxsmm_get_scratch_info analog from backend allocator stats."""
    s = device_memory_stats(device)
    return ScratchInfo(
        size=int(s.get("bytes_in_use", 0)),
        local=int(s.get("peak_bytes_in_use", s.get("bytes_in_use", 0))),
        npools=1,
        nmallocs=int(s.get("num_allocs", 0)),
    )


def release_scratch() -> None:
    """libxsmm_release_scratch analog: drop cached live buffers we can
    reach (Python-side); XLA frees device arenas with their buffers."""
    import gc
    gc.collect()


def donate(fn, *donate_argnums: int):
    """Wrap fn so the given args' buffers are donated (reused in place) —
    the TPU-idiomatic scratch reuse (no aliasing analysis needed)."""
    return jax.jit(fn, donate_argnums=donate_argnums)
