"""Memory / scratch management: limits, scoped accounting, host staging.

Reference: the scratch-pool allocator and its introspection
(libxsmm_scratch_malloc / libxsmm_get_scratch_info, src/libxsmm_malloc.c:
1181,1436; env LIBXSMM_SCRATCH_{POOLS,LIMIT,SCALE}).

TPU-native mapping (three real pieces, not a shim):

* **Device scratch is XLA's** (arena allocator + per-executable temps +
  buffer donation) — re-implementing it would fight the runtime.  What
  the reference's LIMIT/pool semantics map to here is **accounting and
  enforcement**: ``scratch_scope()`` measures a region's peak device-byte
  delta and enforces ``XSMM_SCRATCH_LIMIT`` (warn, or raise when
  ``strict=True``) — the libxsmm_scratch_malloc limit check
  (libxsmm_malloc.c:1237-1250) applied to the device arena.
* **Host staging pool**: repeated host->device feeds (the f64 hi/lo split
  path re-allocates multi-100MB numpy buffers per call) reuse pooled
  page-warm buffers keyed by (shape, dtype), bounded by
  ``XSMM_SCRATCH_POOLS`` distinct keys.  Reuse is transfer-safe: the pool
  remembers the device arrays fed from each buffer and blocks on them
  before handing the buffer out again (PJRT may copy asynchronously).
* **Donation** (``donate()``): jax's buffer-donation wrapper — the
  idiomatic in-place scratch reuse for device arrays.

``get_scratch_info`` keeps the libxsmm_get_scratch_info-shaped report
from the backend allocator stats.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import threading
import warnings
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np


@dataclasses.dataclass
class ScratchInfo:
    """libxsmm_scratch_info analog."""

    size: int = 0        # bytes currently allocated (live)
    local: int = 0       # peak bytes
    npools: int = 1      # XLA arena = one pool (+ host staging pools)
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
        npools=1 + len(_staging._bufs),
        nmallocs=int(s.get("num_allocs", 0)),
    )


def scratch_limit() -> int:
    """XSMM_SCRATCH_LIMIT in bytes (suffixes K/M/G or KB/MB/GB;
    0 = unlimited) — the LIBXSMM_SCRATCH_LIMIT surface.  An unparsable
    value raises: silently disabling a limit the user configured is
    worse than failing loudly."""
    raw = os.environ.get("XSMM_SCRATCH_LIMIT", "0")
    v = raw.strip().upper()
    if v.endswith("B") and len(v) > 1 and v[-2] in "KMG":
        v = v[:-1]
    mult = 1
    for suf, m in (("K", 1 << 10), ("M", 1 << 20), ("G", 1 << 30)):
        if v.endswith(suf):
            v, mult = v[:-1], m
            break
    try:
        return int(float(v) * mult)
    except ValueError:
        raise ValueError(
            f"XSMM_SCRATCH_LIMIT={raw!r} is not a byte count "
            f"(expected e.g. 512M, 2G, 1073741824)") from None


@contextlib.contextmanager
def scratch_scope(label: str = "", limit: Optional[int] = None,
                  strict: bool = False, device=None):
    """Measure a region's peak device-memory delta; enforce the limit.

    Yields a dict filled at exit: {peak_delta, live_delta, limit}.
    Exceeding the limit warns, or raises MemoryError when strict.  On
    backends without memory_stats (CPU) the scope is a no-op report.
    """
    before = device_memory_stats(device)
    report: Dict[str, int] = {}
    yield report
    after = device_memory_stats(device)
    lim = scratch_limit() if limit is None else limit
    live_delta = (after.get("bytes_in_use", 0)
                  - before.get("bytes_in_use", 0)) if after else 0
    # the allocator's peak_bytes_in_use is a PROCESS-lifetime high-water
    # mark: only when the scope raises it is the scope's own peak
    # observable (new peak minus pre-scope live); otherwise the best
    # bound available is the live delta
    pb = before.get("peak_bytes_in_use", 0)
    pa = after.get("peak_bytes_in_use", 0) if after else 0
    if pa > pb:
        peak_delta = pa - before.get("bytes_in_use", 0)
    else:
        peak_delta = max(live_delta, 0)
    report.update(peak_delta=max(peak_delta, 0),
                  live_delta=live_delta, limit=lim)
    if lim and report["peak_delta"] > lim:
        msg = (f"scratch_scope{f' {label!r}' if label else ''}: peak "
               f"device delta {report['peak_delta']} B exceeds limit "
               f"{lim} B (XSMM_SCRATCH_LIMIT)")
        if strict:
            raise MemoryError(msg)
        warnings.warn(msg)


class HostStagingPool:
    """Reusable host staging buffers for repeated host->device feeds.

    ``buffer(shape, dtype, slot)`` returns a numpy array owned by the
    pool; ``mark_in_flight(buf, device_array)`` records the transfer fed
    from it.  The next ``buffer()`` for the same key blocks on the
    recorded transfer first (PJRT may still be reading the host memory).
    Pool count bounded by XSMM_SCRATCH_POOLS keys (default 16, LRU).
    The most recent in-flight device array per key stays referenced until
    that key's next buffer() / eviction / clear() — call
    ``release_scratch()`` to drop everything when a workload phase ends.
    """

    def __init__(self, max_pools: Optional[int] = None):
        self._max = max_pools or int(
            os.environ.get("XSMM_SCRATCH_POOLS", "16"))
        self._bufs: Dict[Tuple, np.ndarray] = {}
        # in-flight device arrays keyed by POOL KEY (not buffer id): an
        # eviction drops the in-flight reference with the buffer, so
        # nothing can leak past the pool's own bound; mark_in_flight on
        # an already-evicted buffer is a silent no-op.
        self._in_flight: Dict[Tuple, object] = {}
        self._rev: Dict[int, Tuple] = {}   # id(buf) -> key while pooled
        self._lock = threading.Lock()
        self.nmallocs = 0
        self.nreuse = 0

    def buffer(self, shape, dtype, slot: str = "") -> np.ndarray:
        key = (tuple(shape), np.dtype(dtype).str, slot,
               threading.get_ident())
        with self._lock:
            buf = self._bufs.pop(key, None)
            pending = self._in_flight.pop(key, None)
            if buf is not None:
                self._rev.pop(id(buf), None)
        if pending is not None:
            try:
                pending.block_until_ready()
            except Exception:  # noqa: BLE001 — a dead array is safe to reuse
                pass
        if buf is None:
            buf = np.empty(shape, dtype)
            self.nmallocs += 1
        else:
            self.nreuse += 1
        with self._lock:
            if len(self._bufs) >= self._max:
                # LRU-ish: drop the oldest entry AND its in-flight ref
                old_key = next(iter(self._bufs))
                old = self._bufs.pop(old_key)
                self._in_flight.pop(old_key, None)
                self._rev.pop(id(old), None)
            self._bufs[key] = buf
            self._rev[id(buf)] = key
        return buf

    def mark_in_flight(self, buf: np.ndarray, device_array) -> None:
        with self._lock:
            key = self._rev.get(id(buf))
            if key is not None:
                self._in_flight[key] = device_array

    def clear(self) -> None:
        with self._lock:
            self._bufs.clear()
            self._in_flight.clear()
            self._rev.clear()


_staging = HostStagingPool()


def get_staging_pool() -> HostStagingPool:
    return _staging


def release_scratch() -> None:
    """libxsmm_release_scratch analog: drop pooled host buffers and any
    Python-side cached live buffers; XLA frees device arenas with their
    buffers."""
    _staging.clear()
    import gc
    gc.collect()


def donate(fn, *donate_argnums: int):
    """Wrap fn so the given args' buffers are donated (reused in place) —
    the TPU-idiomatic scratch reuse (no aliasing analysis needed)."""
    return jax.jit(fn, donate_argnums=donate_argnums)
