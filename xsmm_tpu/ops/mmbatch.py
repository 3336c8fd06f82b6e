"""Batched GEMM frontends and the call-recording interceptor.

Reference: libxsmm_mmbatch / libxsmm_gemm_batch (src/libxsmm_gemm.c:1809,
1878) execute arrays of same-shape GEMMs through one dispatched kernel; the
BLAS interception wrapper (__wrap_dgemm, libxsmm_ext_gemm.c:314) reroutes
existing BLAS calls, and libxsmm_mmbatch_begin/end records calls into a
batch buffer for replay (template/libxsmm.h:251-257).

TPU-native: gemm_batch stacks the operand list and routes through the
lane-packed batched SMM (small shapes) or one XLA batched matmul; the
interception analog monkeypatches jnp.matmul inside a context manager —
existing JAX code runs unmodified while calls are recorded (and optionally
rerouted through the dispatch cache), mirroring the link-time --wrap trick
at the Python level.
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import get_config
from .smm import mmdispatch


def mmbatch(kernel, a_array, b_array, c_array=None):
    """Execute one dispatched kernel over stacked operands
    (libxsmm_mmbatch analog: same descriptor, many operand triplets)."""
    if c_array is not None:
        return kernel(a_array, b_array, c_array)
    return kernel(a_array, b_array)


def gemm_batch(a_list, b_list, c_list=None, *, beta: float = 0.0):
    """libxsmm_gemm_batch analog: list/stack of same-shape GEMMs."""
    a = jnp.stack([jnp.asarray(x) for x in a_list]) \
        if isinstance(a_list, (list, tuple)) else jnp.asarray(a_list)
    b = jnp.stack([jnp.asarray(x) for x in b_list]) \
        if isinstance(b_list, (list, tuple)) else jnp.asarray(b_list)
    nb, m, k = a.shape
    n = b.shape[-1]
    kern = mmdispatch(m, n, k, in_dtype=str(a.dtype), batch=nb, beta=beta)
    if beta:
        c = jnp.stack([jnp.asarray(x) for x in c_list]) \
            if isinstance(c_list, (list, tuple)) else jnp.asarray(c_list)
        return kern(a, b, c)
    return kern(a, b)


# ---------------------------------------------------------------------------
# Interception (the __wrap_dgemm / mmbatch_begin-end analog)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class RecordedCall:
    m: int
    n: int
    k: int
    batch: int
    dtype: str


class _Recorder(threading.local):
    def __init__(self):
        self.active: List[RecordedCall] = []
        self.depth = 0


_recorder = _Recorder()


_intercept_lock = threading.Lock()  # one interception scope per process
_intercept_local = threading.local()  # re-entry detection (same thread)


def _record_matmul_shapes(calls, ash, bsh, dtype):
    """Record an (m, n, k, batch) call if the shapes are matmul-like."""
    if len(ash) >= 2 and len(bsh) >= 2:
        m, k = ash[-2], ash[-1]
        n = bsh[-1]
        batch = int(np.prod(ash[:-2])) if len(ash) > 2 else 1
        calls.append(RecordedCall(m, n, k, batch, dtype))
        return m, n, k, batch
    return None


@contextlib.contextmanager
def mmbatch_begin(record_only: bool = True):
    """Intercept jnp.matmul / jnp.einsum calls within the context.

    Yields the list of RecordedCall entries (filled as calls happen).
    ``record_only=False`` additionally reroutes eligible 3-D batched small
    matmuls through the dispatch cache (the wrap behavior); 2-D and large
    calls, einsum, and anything the shape probe cannot classify always pass
    through to the original op.  einsum calls are recorded when the spec is
    a recognizable (batched) matmul contraction ('ij,jk', 'bij,bjk', ...);
    other specs pass through unrecorded — this interceptor is a parity shim
    for the reference's link-time --wrap trick, not a general dot_general
    hook.

    Scope rules: the monkeypatch is process-global, so interception scopes
    are serialized by a lock — one active scope at a time; concurrent
    threads' calls during a scope are recorded into that scope's list.
    Shape-probe failures on exotic inputs raise (nothing is swallowed);
    reroute errors propagate from the dispatched kernel itself.
    """
    calls: List[RecordedCall] = []
    threshold = get_config().gemm_threshold

    # a nested scope on the same thread would deadlock on the
    # non-reentrant lock below — fail loudly instead
    if getattr(_intercept_local, "active", False):
        raise RuntimeError(
            "mmbatch_begin scopes cannot nest (one interception scope "
            "at a time; the reference serializes the wrap batch array "
            "the same way, libxsmm_ext_gemm.c internal_mmbatch_flush)")
    with _intercept_lock:
        # flag set only once the lock is HELD: an exception while waiting
        # on the lock must not poison this thread's re-entry detection
        _intercept_local.active = True
        orig_matmul = jnp.matmul
        orig_einsum = jnp.einsum

        def wrapped_matmul(a, b, **kw):
            ash, bsh = np.shape(a), np.shape(b)
            rec = _record_matmul_shapes(calls, ash, bsh,
                                        str(jnp.result_type(a, b)))
            if (rec is not None and not record_only and len(ash) == 3
                    and len(bsh) == 3 and ash[0] == bsh[0] and not kw):
                m, n, k, batch = rec
                if m * n * k <= threshold:
                    kern = mmdispatch(m, n, k, in_dtype=str(a.dtype),
                                      batch=batch, beta=0.0)
                    return kern(a, b)
            return orig_matmul(a, b, **kw)

        def wrapped_einsum(*args, **kw):
            # record specs of the form '<batch>ij,<batch>jk-><batch>ik'
            # (same batch prefix, one contracted index) — the matmul family.
            # An explicit output must BE that plain-matmul output
            # (batch + lhs[-2] + rhs[-1]); transposed ('->ki') or reduced
            # ('->ik' on batched inputs) outputs are not plain matmuls and
            # would be recorded with wrong m/n/batch.
            if args and isinstance(args[0], str) and len(args) == 3:
                spec = args[0].replace(" ", "")
                explicit = spec.split("->")[0] if "->" in spec else spec
                parts = explicit.split(",")
                if len(parts) == 2 and len(parts[0]) >= 2 and len(parts[1]) >= 2:
                    lhs, rhs = parts
                    out_ok = True
                    if "->" in spec:
                        out_ok = (spec.split("->")[1]
                                  == lhs[:-2] + lhs[-2] + rhs[-1])
                    if (out_ok and lhs[:-2] == rhs[:-2]
                            and lhs[-1] == rhs[-2] and "." not in spec):
                        _record_matmul_shapes(
                            calls, np.shape(args[1]), np.shape(args[2]),
                            str(jnp.result_type(args[1], args[2])))
            return orig_einsum(*args, **kw)

        jnp.matmul = wrapped_matmul
        jnp.einsum = wrapped_einsum
        try:
            yield calls
        finally:
            jnp.matmul = orig_matmul
            jnp.einsum = orig_einsum
            _intercept_local.active = False


def mmbatch_end():  # parity shim: the context manager form is canonical
    raise RuntimeError("use `with mmbatch_begin() as calls:` on TPU")
