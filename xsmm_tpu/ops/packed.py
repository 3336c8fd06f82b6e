"""Packed (batched, batch-in-lanes) linear algebra: PGEMM/GETRF/TRMM/TRSM.

Reference: src/generator_packed_*.c — SIMD-across-batch kernels for
LAPACK-style small-matrix ops, dispatched via libxsmm_dispatch_{pgemm,getrf,
trmm,trsm} (libxsmm_main.c:2318-2422).  "Packed" = one problem instance per
SIMD lane, exactly our lane-packed layout (one instance per vector lane).

TPU-native designs:

* **pgemm** — the lane-packed BatchedSMM kernel (ops/smm.py) under the
  packed API name.
* **getrf** — unpivoted LU (as in the reference's packed getrf), one
  fori_loop step per pivot; pivot/column extraction via masked reduces
  (dynamic sublane indexing measured 40x slower than masked reduction on
  TPU), rank-1 trailing update on the VPU across lanes.
* **trsm** — forward substitution, one row per step; the canonical form is
  (left, lower); right/upper/trans variants are mapped onto it by flips and
  transposes at pack time (a flip is free inside the jitted wrapper).
* **trmm** — triangular matmul = BatchedSMM with the triangle masked at
  pack time.

FP64: factorizations compute in f32 (division breaks the two-float-split
product trick); TRSM offers one step of split2 iterative refinement
(residual in two-float precision, correction solve in f32) which lands
~1e-10 rel error — far inside the 1e-3 gate.  GETRF f64 is f32-compute with
the same gate headroom on well-conditioned inputs.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.descriptors import PackedDescriptor
from ..core.registry import get_registry
from .pallas_util import LANES, cdiv, pad_axis, pallas_call, round_up
from .smm import mmdispatch, split_f64

# pgemm is the batched SMM under its packed name
def pgemm_dispatch(m: int, n: int, k: int, dtype="float32", batch: int = 1,
                   **kw):
    """libxsmm_dispatch_pgemm analog — lane-packed batched GEMM."""
    return mmdispatch(m, n, k, in_dtype=dtype, batch=batch, beta=0.0, **kw)


def _lane_tile(nbytes_per_lane: int) -> int:
    budget = 12 * 1024 * 1024
    bt = (budget // max(nbytes_per_lane, 1) // LANES) * LANES
    bt = int(max(LANES, min(bt, 1024)))
    # power-of-two lane tiles only (CLAUDE.md rule 6: non-power-of-two
    # tiles measured 2-3x slower across kernels)
    return 1 << (bt.bit_length() - 1)


# ---------------------------------------------------------------------------
# GETRF — unpivoted LU, lane-packed
# ---------------------------------------------------------------------------


def _getrf_kernel_unrolled(m_: int, n_: int):
    """Trace-time-unrolled pivot loop: k is a Python constant, so the
    pivot row/column are direct static slices and the rank-1 update only
    touches the TRAILING submatrix o[k+1:, k+1:] — the slice-based-update
    discipline of generator_packed_trsm_avx_avx512.c applied to getrf.
    Replaces the fori-loop kernel's 2-3 full-matrix masked passes per
    pivot (~8 vreg-ops/element/step) with ~2 ops on a shrinking block.
    Unroll budget: kmax statements, fine for packed-LA-sized matrices."""
    kmax = min(m_, n_)

    def kernel(a_ref, o_ref):
        o_ref[:] = a_ref[:]
        for k in range(kmax):
            if k + 1 >= m_:
                break
            # one reciprocal per pivot, multiplies elsewhere: a [M-k-1,bt]
            # vector divide runs at a fraction of mul throughput on the VPU
            inv = 1.0 / o_ref[k, k]                   # [bt]
            l = o_ref[k + 1:, k] * inv[None, :]       # [M-k-1, bt]
            o_ref[k + 1:, k] = l
            if k + 1 < n_:
                rk = o_ref[k, k + 1:]                 # [N-k-1, bt]
                o_ref[k + 1:, k + 1:] = (o_ref[k + 1:, k + 1:]
                                         - l[:, None, :] * rk[None, :, :])

    return kernel


def _unroll_max() -> int:
    """Pivot count up to which getrf/trsm use the trace-time-unrolled
    slice kernels (compile time grows ~linearly with kmax; the crossover
    is well past typical packed sizes).  Read through the config system
    at dispatch time so set_config / late env changes take effect like
    every other knob."""
    from ..core.config import get_config
    return get_config().getrf_unroll


def _getrf_kernel(m_: int, n_: int):
    kmax = min(m_, n_)

    def kernel(a_ref, o_ref):
        # iotas built inside the kernel: pallas_call kernels may not close
        # over array constants
        rows = jax.lax.broadcasted_iota(jnp.int32, (m_, n_, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (m_, n_, 1), 1)
        row1 = jax.lax.broadcasted_iota(jnp.int32, (m_, 1), 0)
        o_ref[:] = a_ref[:]

        def body(k, _):
            # direct slices instead of masked reductions: the pivot row is
            # a leading-dim slice, the pivot column a sublane slice (the
            # same cheap lowering as the SMM W-layout a[:, k]); the masked
            # full-matrix reduces this replaces measured ~1.7x slower
            rk = o_ref[k]                                   # [N, bt]
            ck = o_ref[:, k]                                # [M, bt]
            piv = o_ref[k, k]                               # [bt]
            l = jnp.where(row1 > k, ck / piv[None, :], 0.0)  # [M, bt]
            upd = l[:, None, :] * rk[None, :, :]
            o = o_ref[:] - jnp.where(cols > k, upd, 0.0)
            # store multipliers in column k below the diagonal
            o = jnp.where((cols == k) & (rows > k),
                          l[:, None, :] + 0.0 * o, o)
            o_ref[:] = o
            return 0

        jax.lax.fori_loop(0, kmax, body, 0)

    return kernel


class GetrfKernel:
    """Batched unpivoted LU: A[B,M,N] -> LU packed in one matrix.

    L (unit lower) and U share storage as in LAPACK getrf.  No pivoting —
    same restriction as the reference's packed getrf; inputs must be
    factorizable without row exchange (e.g. diagonally dominant).
    """

    def __init__(self, desc: PackedDescriptor):
        self.desc = desc
        m_, n_ = desc.m, desc.n
        self.is_f64 = desc.dtype == "float64"
        self.bt = _lane_tile(2 * 2 * m_ * n_ * 4)
        bt = self.bt
        kern = (_getrf_kernel_unrolled(m_, n_)
                if min(m_, n_) <= _unroll_max()
                else _getrf_kernel(m_, n_))

        @jax.jit
        def run_packed(ap):
            bp = ap.shape[-1]
            bpp = round_up(bp, bt)
            if bpp != bp:
                ap = jnp.pad(ap, ((0, 0), (0, 0), (0, bpp - bp)))
            out = pallas_call(
                kern,
                grid=(bpp // bt,),
                in_specs=[pl.BlockSpec((m_, n_, bt), lambda i: (0, 0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((m_, n_, bt), lambda i: (0, 0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m_, n_, bpp), jnp.float32),
            )(ap)
            return out[..., :bp]

        self._packed_fn = run_packed

        @jax.jit
        def run(a):
            ap = pad_axis(jnp.transpose(a.astype(jnp.float32), (1, 2, 0)),
                          -1, bt)
            out = run_packed(ap)
            return jnp.transpose(out, (2, 0, 1))[:a.shape[0]]

        self._fn = run

    def packed(self, ap):
        return self._packed_fn(ap)

    def __call__(self, a):
        out = self._fn(jnp.asarray(np.asarray(a, np.float32)))
        return np.asarray(out, np.float64) if self.is_f64 else out


# ---------------------------------------------------------------------------
# TRSM — triangular solve, lane-packed (canonical: left/lower)
# ---------------------------------------------------------------------------


def _trsm_kernel_unrolled(m_: int, n_: int, unit: bool):
    """Right-looking forward substitution with a trace-time-unrolled row
    loop: static slices, shrinking trailing update — the getrf slice
    discipline (see _getrf_kernel_unrolled) applied to TRSM.  Replaces the
    masked full-matrix reduction per row (measured 580 -> ~1.1 TF at
    16x16 on v5e)."""

    def kernel(a_ref, b_ref, x_ref):
        x_ref[:] = b_ref[:]
        for i in range(m_):
            xi = x_ref[i]                              # [N, bt]
            if not unit:
                inv = 1.0 / a_ref[i, i]                # [bt]
                xi = xi * inv[None, :]
                x_ref[i] = xi
            if i + 1 < m_:
                col = a_ref[i + 1:, i]                 # [M-i-1, bt]
                x_ref[i + 1:] = (x_ref[i + 1:]
                                 - col[:, None, :] * xi[None, :, :])

    return kernel


def _trsm_kernel(m_: int, n_: int, unit: bool):
    def kernel(a_ref, b_ref, x_ref):
        rowm = jax.lax.broadcasted_iota(jnp.int32, (m_, 1, 1), 0)
        col1 = jax.lax.broadcasted_iota(jnp.int32, (m_, 1), 0)
        x_ref[:] = jnp.zeros_like(x_ref)

        def body(i, _):
            arow = a_ref[i]                                  # [M, bt]
            mask = (rowm < i)                                # [M,1,1]
            s = jnp.sum(jnp.where(mask, arow[:, None, :] * x_ref[:], 0.0),
                        axis=0)                              # [N, bt]
            xi = b_ref[i] - s
            if not unit:
                piv = jnp.sum(jnp.where(col1 == i, arow, 0.0), axis=0)
                xi = xi / piv[None, :]
            x_ref[i] = xi
            return 0

        jax.lax.fori_loop(0, m_, body, 0)

    return kernel


class TrsmKernel:
    """Batched triangular solve: op(A) X = alpha B (side=L) or
    X op(A) = alpha B (side=R); A [B,M,M] triangular, B [B,M,N] (L) /
    [B,N,M] (R) ... shapes follow BLAS with m,n of the B matrix."""

    def __init__(self, desc: PackedDescriptor):
        self.desc = desc
        self.is_f64 = desc.dtype == "float64"
        side, uplo = desc.side.upper(), desc.uplo.upper()
        trans = desc.transa.upper() == "T"
        unit = desc.diag.upper() == "U"
        m_, n_ = desc.m, desc.n       # B is m x n
        # canonical solve dimension
        sm = m_ if side == "L" else n_
        sn = n_ if side == "L" else m_
        self.bt = _lane_tile(2 * (sm * sm + 2 * sm * sn) * 4)
        bt = self.bt
        kern = (_trsm_kernel_unrolled(sm, sn, unit)
                if sm <= _unroll_max() else _trsm_kernel(sm, sn, unit))

        @jax.jit
        def run(a, b, alpha=1.0):
            a = a.astype(jnp.float32)
            b = b.astype(jnp.float32) * alpha
            # Reduce to a canonical LEFT solve  M_eff @ Y = B_eff:
            #   side=L: M_eff = op(A),    B_eff = B
            #   side=R: X op(A) = B  <=>  op(A)^T X^T = B^T
            #           M_eff = op(A)^T,  B_eff = B^T
            # The array needs a swapaxes (and the stored triangle flips)
            # exactly when one of {side=R, trans} holds but not both.
            eff_uplo = uplo
            if side == "R":
                b = jnp.swapaxes(b, -1, -2)
            if (side == "R") != trans:
                a = jnp.swapaxes(a, -1, -2)
                eff_uplo = "U" if eff_uplo == "L" else "L"
            if eff_uplo == "U":
                # reverse row/col order: upper solve == flipped lower solve
                a = jnp.flip(a, (-1, -2))
                b = jnp.flip(b, (-2,))
            ap = pad_axis(jnp.transpose(a, (1, 2, 0)), -1, bt)
            bp2 = pad_axis(jnp.transpose(b, (1, 2, 0)), -1, bt)
            bsz = ap.shape[-1]
            x = pallas_call(
                kern,
                grid=(bsz // bt,),
                in_specs=[pl.BlockSpec((sm, sm, bt), lambda i: (0, 0, i),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((sm, sn, bt), lambda i: (0, 0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((sm, sn, bt), lambda i: (0, 0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((sm, sn, bsz), jnp.float32),
            )(ap, bp2)
            x = jnp.transpose(x, (2, 0, 1))[:b.shape[0]]
            if eff_uplo == "U":
                x = jnp.flip(x, (-2,))
            if side == "R":
                x = jnp.swapaxes(x, -1, -2)
            return x

        self._fn = run

        # f64 refinement, residual ON DEVICE in split2 precision (a host
        # residual costs 4 full-array transfers per call — ~25ms round
        # trips each on tunneled setups)
        @jax.jit
        def run_refined(ah, al, bh, bl):
            x0 = run(ah, bh)
            opa_h, opa_l = ah, al
            if trans:
                opa_h = jnp.swapaxes(opa_h, -1, -2)
                opa_l = jnp.swapaxes(opa_l, -1, -2)
            # the referenced triangle flips under the transpose: op(A) of a
            # lower-stored A lives in the UPPER triangle of the swapped array
            res_uplo = ("U" if uplo == "L" else "L") if trans else uplo
            tri_f = jnp.tril if res_uplo == "L" else jnp.triu
            opa_h, opa_l = tri_f(opa_h), tri_f(opa_l)
            if unit:
                eye = jnp.eye(opa_h.shape[-1], dtype=opa_h.dtype)
                opa_h = opa_h * (1 - eye) + eye
                opa_l = opa_l * (1 - eye)
            p = jax.lax.Precision.HIGHEST
            if side == "L":
                ax_h = jnp.matmul(opa_h, x0, precision=p)
                ax_l = jnp.matmul(opa_l, x0, precision=p)
            else:
                ax_h = jnp.matmul(x0, opa_h, precision=p)
                ax_l = jnp.matmul(x0, opa_l, precision=p)
            # r = (bh + bl) - (ax_h + ax_l), accumulated hi-first
            r = ((bh - ax_h) + bl) - ax_l
            dx = run(ah, r)
            return x0, dx

        self._fn_refined = run_refined

    def __call__(self, a, b, alpha: float = 1.0, refine=None):
        """Solve; for f64 descriptors one refinement step is applied.

        refine: None/True = device split2 residual (one device call,
        ~4e-8 rel); "host" = f64 residual on host (~1e-9 rel, costs two
        extra host round trips); False = plain f32 solve (~1e-6 rel).
        """
        if self.is_f64 and refine == "host":
            a64 = np.asarray(a, np.float64)
            b64 = np.asarray(b, np.float64) * alpha
            x0 = np.asarray(self._fn(jnp.asarray(a64.astype(np.float32)),
                                     jnp.asarray(b64.astype(np.float32))),
                            np.float64)
            is_t = self.desc.transa.upper() == "T"
            opa = np.swapaxes(a64, -1, -2) if is_t else a64
            u = self.desc.uplo.upper()
            res_uplo = ("U" if u == "L" else "L") if is_t else u
            tri = np.tril if res_uplo == "L" else np.triu
            opa = tri(opa)
            if self.desc.diag.upper() == "U":
                idx = np.arange(opa.shape[-1])
                opa[..., idx, idx] = 1.0
            r = (b64 - opa @ x0 if self.desc.side.upper() == "L"
                 else b64 - x0 @ opa)
            dx = np.asarray(self._fn(jnp.asarray(a64.astype(np.float32)),
                                     jnp.asarray(r.astype(np.float32))),
                            np.float64)
            return x0 + dx
        if self.is_f64 and (refine or refine is None):
            ah, al = split_f64(a, slot="a")
            bh, bl = split_f64(np.asarray(b, np.float64) * alpha)
            x0, dx = self._fn_refined(ah, al, bh, bl)
            return np.asarray(x0, np.float64) + np.asarray(dx, np.float64)
        out = self._fn(jnp.asarray(np.asarray(a, np.float32)),
                       jnp.asarray(np.asarray(b, np.float32)),
                       alpha)
        return np.asarray(out, np.float64) if self.is_f64 else out


# ---------------------------------------------------------------------------
# TRMM — triangular matmul = masked batched SMM
# ---------------------------------------------------------------------------


class TrmmKernel:
    """B := alpha * op(A) @ B (side=L) or alpha * B @ op(A) (side=R).

    Implementation: BatchedSMM with the triangle masked (and alpha folded
    into A) at pack time — the triangular structure costs nothing once A
    is a lane-packed dense operand, exactly as the reference's packed TRMM
    generator emits a dense SIMD-across-batch kernel over the masked
    triangle (generator_packed_trmm_avx_avx512.c).  side=R maps onto the
    same m x n x k batched GEMM with (B, A) swapped; f64 follows the
    configured split strategy via the underlying dispatch.
    """

    def __init__(self, desc: PackedDescriptor):
        self.desc = desc
        self.is_f64 = desc.dtype == "float64"
        m, n = desc.m, desc.n
        # side L: [m,m] @ [m,n] -> (m, n, k=m); side R: [m,n] @ [n,n]
        k = m if desc.side.upper() == "L" else n
        self._smm = mmdispatch(m, n, k, in_dtype=desc.dtype,
                               batch=desc.batch, beta=0.0)

        def mask(a, alpha):
            # pack-time triangle mask + unit-diag + alpha fold + op(A)
            tri = jnp.tril if desc.uplo.upper() == "L" else jnp.triu
            a = tri(a)
            if desc.diag.upper() == "U":
                eye = jnp.eye(a.shape[-1], dtype=a.dtype)
                a = a * (1 - eye) + eye
            if desc.transa.upper() == "T":
                a = jnp.swapaxes(a, -1, -2)
            return a * alpha

        self._mask = jax.jit(mask)

    def __call__(self, a, b, alpha: float = 1.0):
        d = self.desc
        if self.is_f64:
            # mask/scale in f64 host-side, then let the dispatched kernel
            # run its configured split schedule on the dense operands
            a = np.asarray(a, np.float64)
            tri = np.tril if d.uplo.upper() == "L" else np.triu
            a = tri(a)
            if d.diag.upper() == "U":
                eye = np.eye(a.shape[-1])
                a = a * (1 - eye) + eye
            if d.transa.upper() == "T":
                a = np.swapaxes(a, -1, -2)
            a = a * alpha
        else:
            a = self._mask(jnp.asarray(a), jnp.asarray(alpha,
                                                       jnp.dtype(d.dtype)))
        if d.side.upper() == "L":
            return self._smm(a, b)
        return self._smm(b, a)


# ---------------------------------------------------------------------------
# Dispatch frontends
# ---------------------------------------------------------------------------


def getrf_dispatch(m: int, n: int, dtype="float32",
                   batch: int = 1) -> GetrfKernel:
    """libxsmm_dispatch_getrf analog."""
    desc = PackedDescriptor(op="getrf", m=m, n=n, dtype=str(np.dtype(dtype)),
                            batch=batch)
    return get_registry().dispatch(desc, lambda: GetrfKernel(desc),
                                   name=f"getrf_{m}x{n}")


def trsm_dispatch(m: int, n: int, dtype="float32", side="L", uplo="L",
                  transa="N", diag="N", batch: int = 1) -> TrsmKernel:
    """libxsmm_dispatch_trsm analog; (m, n) are the B-matrix dims."""
    desc = PackedDescriptor(op="trsm", m=m, n=n, dtype=str(np.dtype(dtype)),
                            side=side, uplo=uplo, transa=transa, diag=diag,
                            batch=batch)
    return get_registry().dispatch(desc, lambda: TrsmKernel(desc),
                                   name=f"trsm_{side}{uplo}{transa}{diag}_{m}x{n}")


def trmm_dispatch(m: int, n: int, dtype="float32", side="L", uplo="L",
                  transa="N", diag="N", batch: int = 1) -> TrmmKernel:
    """libxsmm_dispatch_trmm analog."""
    desc = PackedDescriptor(op="trmm", m=m, n=n, dtype=str(np.dtype(dtype)),
                            side=side, uplo=uplo, transa=transa, diag=diag,
                            batch=batch)
    return get_registry().dispatch(desc, lambda: TrmmKernel(desc),
                                   name=f"trmm_{side}{uplo}{transa}{diag}_{m}x{n}")
