"""Blocked GEMM (BGEMM): persistent handle with block-laid-out operands.

Reference: src/libxsmm_blocked_gemm.c — handle creation (:47) with block
sizes (bm, bn, bk), copy-in/copy-out converters to the blocked layout
(:169-418), six loop orders (include/libxsmm_blocked_gemm.h:38-45), and a
barrier-synchronized threaded compute driven by a template.

TPU-native: the blocked layout is [Mb, Kb, bm, bk] (block-row-major, the
reference's layout), produced/consumed by jitted reshape+transpose
converters (pure data movement, fused by XLA into single copies).  The
compute contracts over (Kb, bk) in one einsum — the MXU + XLA tiling does
the per-block microkernel scheduling that the reference's loop orders and
per-block locks hand-manage; the ``order`` parameter is accepted for API
parity and recorded (it steered cache behavior on x86; XLA owns scheduling
here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_util import round_up
from .smm import _mxu_precision

ORDERS = ("ijk", "ikj", "jik", "jki", "kij", "kji")  # parity: 6 loop orders


class BlockedGemmHandle:
    """C[M,N] (+)= A[M,K] @ B[K,N] over blocked layouts."""

    def __init__(self, m: int, n: int, k: int, bm: int = 64, bn: int = 64,
                 bk: int = 64, dtype="float32", order: str = "ijk"):
        assert order in ORDERS, f"order must be one of {ORDERS}"
        self.m, self.n, self.k = m, n, k
        self.bm, self.bn, self.bk = bm, bn, bk
        self.order = order
        self.dtype = jnp.dtype(dtype)
        self.mp = round_up(m, bm)
        self.np_ = round_up(n, bn)
        self.kp = round_up(k, bk)

        prec = _mxu_precision(str(self.dtype))

        @jax.jit
        def compute(a_blk, b_blk, c_blk=None):
            # a_blk [Mb, Kb, bm, bk], b_blk [Kb, Nb, bk, bn]
            out = jnp.einsum("MKmk,KNkn->MNmn", a_blk, b_blk,
                             precision=prec,
                             preferred_element_type=jnp.float32)
            if c_blk is not None:
                out = out + c_blk
            return out.astype(self.dtype)

        self._compute = compute

    # -- copy-in/copy-out (libxsmm_blocked_gemm.c:169-418 analogs) -----------
    def copyin_a(self, a):
        a = jnp.asarray(a, self.dtype)
        a = jnp.pad(a, ((0, self.mp - self.m), (0, self.kp - self.k)))
        return a.reshape(self.mp // self.bm, self.bm,
                         self.kp // self.bk, self.bk).transpose(0, 2, 1, 3)

    def copyin_b(self, b):
        b = jnp.asarray(b, self.dtype)
        b = jnp.pad(b, ((0, self.kp - self.k), (0, self.np_ - self.n)))
        return b.reshape(self.kp // self.bk, self.bk,
                         self.np_ // self.bn, self.bn).transpose(0, 2, 1, 3)

    def copyin_c(self, c):
        c = jnp.asarray(c, self.dtype)
        c = jnp.pad(c, ((0, self.mp - self.m), (0, self.np_ - self.n)))
        return c.reshape(self.mp // self.bm, self.bm,
                         self.np_ // self.bn, self.bn).transpose(0, 2, 1, 3)

    def copyout_c(self, c_blk):
        c = c_blk.transpose(0, 2, 1, 3).reshape(self.mp, self.np_)
        return c[:self.m, :self.n]

    # -- execute ----------------------------------------------------------------
    def execute(self, a_blk, b_blk, c_blk=None):
        """Blocked-layout compute (the _st template analog)."""
        if c_blk is not None:
            return self._compute(a_blk, b_blk, c_blk)
        return self._compute(a_blk, b_blk)

    def __call__(self, a, b, c=None):
        """Convenience: unblocked in/out."""
        c_blk = self.copyin_c(c) if c is not None else None
        out = self.execute(self.copyin_a(a), self.copyin_b(b), c_blk)
        return self.copyout_c(out)


def blocked_gemm_handle(m, n, k, bm=64, bn=64, bk=64, dtype="float32",
                        order="ijk") -> BlockedGemmHandle:
    """libxsmm_blocked_gemm_handle_create analog."""
    return BlockedGemmHandle(m, n, k, bm, bn, bk, dtype, order)
