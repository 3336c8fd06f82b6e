"""Blocked GEMM (BGEMM): persistent handle with block-laid-out operands.

Reference: src/libxsmm_blocked_gemm.c — handle creation (:47) with block
sizes (bm, bn, bk), copy-in/copy-out converters to the blocked layout
(:169-418), six loop orders (include/libxsmm_blocked_gemm.h:38-45), and a
barrier-synchronized threaded compute driven by a template.

TPU-native: the blocked layout is [Mb, Kb, bm, bk] (block-row-major, the
reference's layout), produced/consumed by jitted reshape+transpose
converters.  The compute contracts over (Kb, bk) in one einsum — the MXU +
XLA tiling does the per-block microkernel scheduling that the reference's
loop orders and per-block locks hand-manage; the ``order`` parameter is
accepted for API parity and recorded (it steered cache behavior on x86;
XLA owns scheduling here).

float64 routes through the two-float split (three f32 einsums, hi/lo
recombined in f64 on the way out) like every other f64 path here — it is
NOT silently downcast to f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_util import round_up
from .smm import _mxu_precision, split_f64

ORDERS = ("ijk", "ikj", "jik", "jki", "kij", "kji")  # parity: 6 loop orders


class BlockedGemmHandle:
    """C[M,N] (+)= A[M,K] @ B[K,N] over blocked layouts."""

    def __init__(self, m: int, n: int, k: int, bm: int = 64, bn: int = 64,
                 bk: int = 64, dtype="float32", order: str = "ijk"):
        assert order in ORDERS, f"order must be one of {ORDERS}"
        self.m, self.n, self.k = m, n, k
        self.bm, self.bn, self.bk = bm, bn, bk
        self.order = order
        self.is_f64 = str(dtype) == "float64"
        self.dtype = np.dtype("float64") if self.is_f64 else jnp.dtype(dtype)
        self.mp = round_up(m, bm)
        self.np_ = round_up(n, bn)
        self.kp = round_up(k, bk)

        comp_dt = jnp.float32 if self.is_f64 else jnp.dtype(dtype)
        prec = (jax.lax.Precision.HIGHEST if self.is_f64
                else _mxu_precision(str(comp_dt)))

        def _ein(a_blk, b_blk):
            return jnp.einsum("MKmk,KNkn->MNmn", a_blk, b_blk,
                              precision=prec,
                              preferred_element_type=jnp.float32)

        @jax.jit
        def compute(a_blk, b_blk, c_blk=None):
            out = _ein(a_blk, b_blk)
            if c_blk is not None:
                out = out + c_blk
            return out.astype(comp_dt)

        self._compute = compute

        @jax.jit
        def compute_split2(ah, al, bh, bl, ch=None, cl=None):
            hi = _ein(ah, bh)
            lo = _ein(ah, bl) + _ein(al, bh)
            if ch is not None:
                hi = hi + ch
                lo = lo + cl
            return hi, lo

        self._compute_split2 = compute_split2

        def _block(x, rows, cols, br, bc):
            x = jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))
            return x.reshape(rows // br, br, cols // bc, bc
                             ).transpose(0, 2, 1, 3)

        self._blk_a = jax.jit(
            lambda x: _block(x.astype(comp_dt), self.mp, self.kp, bm, bk))
        self._blk_b = jax.jit(
            lambda x: _block(x.astype(comp_dt), self.kp, self.np_, bk, bn))
        self._blk_c = jax.jit(
            lambda x: _block(x.astype(comp_dt), self.mp, self.np_, bm, bn))
        self._unblk_c = jax.jit(
            lambda c: c.transpose(0, 2, 1, 3).reshape(self.mp, self.np_)
            [:m, :n])

    # -- copy-in/copy-out (libxsmm_blocked_gemm.c:169-418 analogs) -----------
    # f64 operands return (hi, lo) block pairs.
    def copyin_a(self, a):
        if self.is_f64:
            hi, lo = split_f64(a, slot="a")
            return self._blk_a(hi), self._blk_a(lo)
        return self._blk_a(jnp.asarray(a))

    def copyin_b(self, b):
        if self.is_f64:
            hi, lo = split_f64(b, slot="b")
            return self._blk_b(hi), self._blk_b(lo)
        return self._blk_b(jnp.asarray(b))

    def copyin_c(self, c):
        if self.is_f64:
            hi, lo = split_f64(c, slot="c")
            return self._blk_c(hi), self._blk_c(lo)
        return self._blk_c(jnp.asarray(c))

    def copyout_c(self, c_blk):
        if self.is_f64:
            hi, lo = c_blk
            return (np.asarray(self._unblk_c(hi), np.float64)
                    + np.asarray(self._unblk_c(lo), np.float64))
        return self._unblk_c(c_blk)

    # -- execute ----------------------------------------------------------------
    def execute(self, a_blk, b_blk, c_blk=None):
        """Blocked-layout compute (the _st template analog)."""
        if self.is_f64:
            ah, al = a_blk
            bh, bl = b_blk
            if c_blk is not None:
                return self._compute_split2(ah, al, bh, bl, *c_blk)
            return self._compute_split2(ah, al, bh, bl)
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
