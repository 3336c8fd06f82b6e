"""Tracing / profiler integration.

Reference observability stack (SURVEY.md §5): self-tracing
(src/libxsmm_trace.c, env LIBXSMM_TRACE), JIT kernel naming for profilers
(jit_name scheme libxsmm_main.c:1297), perf-map/jitdump/VTune sinks
(src/libxsmm_perf.c).

TPU-native mapping: kernel naming -> jax.named_scope (names appear in
XLA HLO metadata and xprof timelines); perf map / jitdump -> the JAX
profiler (xprof trace files readable by TensorBoard / Perfetto); verbose
statistics -> the registry stat dump (core/registry.py).  Env XSMM_TRACE=
<dir> arms profiler capture via trace_region / start_trace.
"""

from __future__ import annotations

import contextlib
import functools
import os
from typing import Optional

import jax

_TRACE_DIR = os.environ.get("XSMM_TRACE", "")
_active = False


def kernel_name(kind: str, desc) -> str:
    """Descriptive kernel name (the jit_name scheme analog), e.g.
    ``xsmm_tpu_f32_23x23x23_b1024.smm`` — visible in xprof via named_scope."""
    m = getattr(desc, "m", "")
    n = getattr(desc, "n", "")
    k = getattr(desc, "k", "")
    dt = getattr(desc, "in_dtype", getattr(desc, "dtype", ""))
    b = getattr(desc, "batch", 1)
    return f"xsmm_tpu_{dt}_{m}x{n}x{k}_b{b}.{kind}"


@contextlib.contextmanager
def scope(name: str):
    """Annotate a region: shows up in HLO op metadata and xprof."""
    with jax.named_scope(name):
        yield


def named(kind: str):
    """Decorator: wrap a kernel-building function in a named scope."""
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with jax.named_scope(kind):
                return fn(*args, **kwargs)
        return wrapper
    return deco


def start_trace(log_dir: Optional[str] = None) -> str:
    """Begin an xprof capture (the perf-map/jitdump sink analog)."""
    global _active
    d = log_dir or _TRACE_DIR or "/tmp/xsmm_tpu_trace"
    jax.profiler.start_trace(d)
    _active = True
    return d


def stop_trace() -> None:
    global _active
    if _active:
        jax.profiler.stop_trace()
        _active = False


@contextlib.contextmanager
def trace_region(log_dir: Optional[str] = None):
    d = start_trace(log_dir)
    try:
        yield d
    finally:
        stop_trace()


def trace_enabled() -> bool:
    return bool(_TRACE_DIR)
