"""Fixed-structure sparse x dense kernels (the spgemm domain).

Reference: src/generator_spgemm*.c JITs kernels with the nonzero structure
unrolled into the instruction stream — CSR A-sparse SOA
(generator_spgemm_csr_asparse_soa.c: per-row broadcast of A values times
dense-B SOA columns), register-resident A values
(generator_spgemm_csr_asparse_reg.c), and B-sparse variants.  Runtime
entries: libxsmm_create_xcsr_soa / libxsmm_create_dcsr_reg
(libxsmm_main.c:2423-2583).

TPU-native design — two strategies chosen at create time (exactly the
fsspmdm pattern, libxsmm_fsspmdm.c:119-140):

* **"unroll"** — the trace-time analog of instruction-stream unrolling: the
  CSR structure and values are Python-level constants when the Pallas kernel
  is traced, so each output row becomes a literal chain of scalar*row FMAs
  on the VPU.  The N (column) dimension is the vector dimension, reshaped
  [K, N] -> [K, 8, N/8] so each B row occupies full (8,128) vector registers
  ("SOA": one problem column set per lane).  Compile time grows with nnz, so
  this path is gated at XSMM_SPARSE_UNROLL_MAX nonzeros.

* **"dense"** — densify A and run the MXU.  For operator matrices (small
  M,K; wide dense B) the traffic is B + C reads/writes either way, so the
  dense MXU product IS the bandwidth-roofline implementation on TPU; the
  zeros cost only free MXU flops.  This mirrors the reference's dense
  fallback (libxsmm_fsspmdm.c:132-140) but on TPU it is usually the *faster*
  path, not the fallback.

FP64 values use the two-float split; sparse values are compile-time
constants so their hi/lo parts cost nothing extra to stage.

FP64 *stream schedules* (round 4): in the streaming regime the kernel is
pure HBM traffic, and the v5e bus is shared (no read/write duplex — see
documentation/perf_notes.md "HBM mixed-ratio study"), so bytes ARE time.
The two-float split lets the B-lo read and the C-lo write be dropped
independently — every schedule keeps the split-A constants (free) and the
separate lo accumulator, and all land at ~1e-7 rel-Frobenius vs f64 gold
(the f32 rounding of the hi accumulator dominates; same analysis as the
batched-SMM split2_fast study, perf_notes "f64 schedule study"):

  schedule       B streams  C streams  bytes/elem   rel err (23^3-style gate)
  "split2"       bh+bl      ch+cl      8 in, 8 out  ~9e-8   (default)
  "split2_fast"  bh+bl      hi+lo      8 in, 4 out  ~1e-7
  "split2_wout"  bh         ch+cl      4 in, 8 out  ~6e-8 extra from b-lo
  "fold"         bh         hi+lo      4 in, 4 out  traffic-minimal, ~2x
                                                    faster streaming
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import get_config
from ..core.descriptors import SparseDescriptor
from ..core.registry import get_registry
from ..utils.mtx import Csc, Csr
from .pallas_util import cdiv, pallas_call, round_up

UNROLL_MAX = int(os.environ.get("XSMM_SPARSE_UNROLL_MAX", 8192))
_SUB = 8  # sublanes per B-row tile

# f64 stream schedules: name -> (b_lo read?, c_lo written?)
F64_SCHEDULES = {"split2": (True, True), "split2_fast": (True, False),
                 "split2_wout": (False, True), "fold": (False, False)}


def _as_csr(a: Union[np.ndarray, Csr], tol: float = 0.0) -> Csr:
    if isinstance(a, Csr):
        return a
    return Csr.from_dense(np.asarray(a), tol)


def _split_const(v: float):
    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    return float(hi), float(lo)


class CsrSpgemm:
    """Compiled kernel computing C[M,N] = A_sparse[M,K] @ B[K,N].

    Call: kernel(b) with b [K, N] (f32) or numpy f64 (split internally when
    the descriptor dtype is float64).  N is fixed per kernel (shape-keyed
    like every dispatch descriptor).
    """

    def __init__(self, csr: Csr, n: int, dtype="float32",
                 strategy: str = "auto", f64_schedule: str = "split2"):
        self.csr = csr
        self.n = n
        self.dtype = jnp.dtype(dtype) if str(dtype) != "float64" else np.dtype("float64")
        self.is_f64 = str(dtype) == "float64"
        if f64_schedule not in F64_SCHEDULES:
            raise ValueError(f"unknown f64 schedule {f64_schedule!r}; "
                             f"one of {sorted(F64_SCHEDULES)}")
        self.f64_schedule = f64_schedule
        self.b_lo, self.c_lo = (F64_SCHEDULES[f64_schedule] if self.is_f64
                                else (False, False))
        if strategy == "auto":
            strategy = "unroll" if csr.nnz <= UNROLL_MAX else "dense"
        self.strategy = strategy
        self.bn = None  # set by the unroll builder
        self._fn = (self._build_unroll() if strategy == "unroll"
                    else self._build_dense())
        self._fn_acc_cache = None

    @property
    def stream_bytes(self):
        """(read, write) HBM bytes per call — the schedule's honest byte
        model (B streams in, C streams out; A is baked constants)."""
        per = 4 * self.n
        rd = self.csr.k * per * ((1 + self.b_lo) if self.is_f64 else 1)
        wr = self.csr.m * per * ((1 + self.c_lo) if self.is_f64 else 1)
        return rd, wr

    # -- dense/MXU strategy --------------------------------------------------
    def _build_dense(self):
        a_dense = self.csr.toarray()
        if self.is_f64:
            ah = jnp.asarray(a_dense.astype(np.float32))
            al = jnp.asarray((a_dense - a_dense.astype(np.float32)
                              .astype(np.float64)).astype(np.float32))
            b_lo, c_lo = self.b_lo, self.c_lo

            @jax.jit
            def run(*bs):
                p = jax.lax.Precision.HIGHEST
                bh = bs[0]
                hi = jnp.matmul(ah, bh, precision=p)
                lo = jnp.matmul(al, bh, precision=p)
                if b_lo:
                    lo = lo + jnp.matmul(ah, bs[1], precision=p)
                return (hi, lo) if c_lo else hi + lo
            return run

        a_j = jnp.asarray(a_dense.astype(self.dtype))

        @jax.jit
        def run(b):
            return jnp.matmul(a_j, b, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST
                              ).astype(self.dtype)
        return run

    # -- trace-unrolled strategy ----------------------------------------------
    def _build_unroll(self):
        """Flat [K,N]/[M,N] blocks; the SOA view is taken INSIDE the kernel.

        B/C stay 2D in HBM and the [K,bn] block is reshaped to
        [K, 8, bn/8] in VMEM so each B row fills whole (8,128) vregs.  An
        XLA-side reshape would relayout the full arrays through HBM — that
        extra pass measured 407 GB/s end-to-end vs 1121 GB/s (VMEM-resident
        regime; see perf_notes 'VMEM residency') for the
        in-kernel view (v5e, 150x150 operator, f64).  No compiler_params:
        a raised scoped-VMEM limit halves DMA pipelining (pallas_util).
        """
        csr, n = self.csr, self.n
        m, k = csr.m, csr.k
        f64 = self.is_f64
        # lane-block: multiple of 8*128 so the in-kernel SOA view tiles
        # exactly; sized to the default 16MB scoped-VMEM budget.
        unit = _SUB * 128
        per_col = (k + m) * 4 * (2 if f64 else 1) * 2
        # Initial lane block: never pad more than one 8x128 unit beyond N
        # (small-N operators like N=16 SeisSol panels would otherwise pad
        # B/C out to 2048 columns of wasted traffic); shrink under VMEM
        # pressure but keep whole units so the in-kernel SOA view tiles.
        bn = min(2048, max(unit, round_up(n, unit)))
        while bn > unit and bn * per_col > 14 * 1024 * 1024:
            bn = max(unit, bn // 2 // unit * unit)
        # lane-block override (the LIBXSMM_TGEMM_N-style tiling env knob)
        import os as _os
        env_bn = int(_os.environ.get("XSMM_SPGEMM_BN", 0))
        if env_bn:
            bn = max(unit, env_bn // unit * unit)
        self.bn = bn  # lane tile (introspection: fsspmdm n_chunksize)
        np_pad = round_up(n, bn)
        grid = (np_pad // bn,)

        rows = [(csr.row_ptr[i], csr.row_ptr[i + 1]) for i in range(m)]
        cols = csr.col_idx
        vals = csr.values

        if not f64:
            fvals = [float(v) for v in vals]

            def kernel(b_ref, c_ref):
                bw = b_ref.shape[1]
                b = b_ref[:].reshape(k, _SUB, bw // _SUB)
                for i, (s, e) in enumerate(rows):
                    if s == e:
                        c_ref[i] = jnp.zeros((bw,), jnp.float32)
                        continue
                    acc = fvals[s] * b[int(cols[s])]
                    for p in range(s + 1, e):
                        acc = acc + fvals[p] * b[int(cols[p])]
                    c_ref[i] = acc.reshape(bw)

            @jax.jit
            def run(b):
                b = b.astype(jnp.float32)
                if n != np_pad:
                    b = jnp.pad(b, ((0, 0), (0, np_pad - n)))
                out = pallas_call(
                    kernel,
                    grid=grid,
                    in_specs=[pl.BlockSpec((k, bn), lambda i: (0, i),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((m, bn), lambda i: (0, i),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((m, np_pad), jnp.float32),
                    cost_estimate=pl.CostEstimate(
                        flops=2 * csr.nnz * np_pad,
                        bytes_accessed=(k + m) * np_pad * 4,
                        transcendentals=0),
                )(b)
                return out[:, :n].astype(self.dtype)
            return run

        # f64: values split into hi/lo constants; B arrives as bh (+ bl per
        # schedule), C leaves as (ch, cl) or folded hi+lo (see module doc).
        splits = [_split_const(v) for v in vals]
        b_lo, c_lo = self.b_lo, self.c_lo

        def kernel64(*refs):
            bh_ref = refs[0]
            bl_ref = refs[1] if b_lo else None
            out_refs = refs[1 + b_lo:]
            bw = bh_ref.shape[1]
            bh = bh_ref[:].reshape(k, _SUB, bw // _SUB)
            bl = bl_ref[:].reshape(k, _SUB, bw // _SUB) if b_lo else None
            for i, (s, e) in enumerate(rows):
                if s == e:
                    for r in out_refs:
                        r[i] = jnp.zeros((bw,), jnp.float32)
                    continue
                vh, vl = splits[s]
                c0 = int(cols[s])
                hi = vh * bh[c0]
                lo = vl * bh[c0]
                if b_lo:
                    lo = lo + vh * bl[c0]
                for p in range(s + 1, e):
                    vh, vl = splits[p]
                    c_ = int(cols[p])
                    hi = hi + vh * bh[c_]
                    lo = lo + (vh * bl[c_] + vl * bh[c_] if b_lo
                               else vl * bh[c_])
                if c_lo:
                    out_refs[0][i] = hi.reshape(bw)
                    out_refs[1][i] = lo.reshape(bw)
                else:
                    out_refs[0][i] = (hi + lo).reshape(bw)

        n_out = 2 if c_lo else 1
        flop_mult = 6 if b_lo else 4

        @jax.jit
        def run64(*bs):
            bs = list(bs)
            if n != np_pad:
                bs = [jnp.pad(b, ((0, 0), (0, np_pad - n))) for b in bs]
            out = pallas_call(
                kernel64,
                grid=grid,
                in_specs=[pl.BlockSpec((k, bn), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)] * len(bs),
                out_specs=[pl.BlockSpec((m, bn), lambda i: (0, i),
                                        memory_space=pltpu.VMEM)] * n_out,
                out_shape=[jax.ShapeDtypeStruct((m, np_pad),
                                                jnp.float32)] * n_out,
                cost_estimate=pl.CostEstimate(
                    flops=flop_mult * csr.nnz * np_pad,
                    bytes_accessed=(len(bs) * k + n_out * m) * np_pad * 4,
                    transcendentals=0),
            )(*bs)
            if c_lo:
                return out[0][:, :n], out[1][:, :n]
            return out[0][:, :n]
        return run64

    # -- accumulate (beta=1) variant ------------------------------------------
    def _build_acc(self):
        """C += A @ B with the addition fused INTO the unrolled kernel via
        input/output aliasing — the ring-SpMM step form.  A separate XLA add
        would re-stream the whole C (read+read+write); here the prior C block
        is already in VMEM as the aliased output block (one read + one write,
        same traffic as beta=0 plus the unavoidable C read).

        Reference analog: beta=1 GEMM flag (LIBXSMM_GEMM_FLAG_BETA_0 absent),
        src/generator_gemm_common.c.
        """
        if self.strategy != "unroll":
            fn = self._fn
            if not self.is_f64:
                return jax.jit(lambda c, b: c + fn(b))
            if self.c_lo:
                return jax.jit(lambda ch, cl, *bs:
                               (lambda r: (ch + r[0], cl + r[1]))(fn(*bs)))
            return jax.jit(lambda c, *bs: c + fn(*bs))

        csr, n, bn = self.csr, self.n, self.bn
        m, k = csr.m, csr.k
        np_pad = round_up(n, bn)
        grid = (np_pad // bn,)
        rows = [(csr.row_ptr[i], csr.row_ptr[i + 1]) for i in range(m)]
        cols = csr.col_idx
        b_lo, c_lo = self.b_lo, self.c_lo
        n_out = 2 if c_lo else 1

        if not self.is_f64:
            fvals = [float(v) for v in csr.values]

            def kernel(cin_ref, b_ref, c_ref):
                bw = b_ref.shape[1]
                b = b_ref[:].reshape(k, _SUB, bw // _SUB)
                for i, (s, e) in enumerate(rows):
                    if s == e:
                        # aliased buffers: keep the prior C row (explicit
                        # copy is a no-op on-chip, correct in interpret)
                        c_ref[i] = cin_ref[i]
                        continue
                    acc = fvals[s] * b[int(cols[s])]
                    for p in range(s + 1, e):
                        acc = acc + fvals[p] * b[int(cols[p])]
                    c_ref[i] = cin_ref[i] + acc.reshape(bw)

            @jax.jit
            def run(c, b):
                b = b.astype(jnp.float32)
                if n != np_pad:
                    b = jnp.pad(b, ((0, 0), (0, np_pad - n)))
                    c = jnp.pad(c, ((0, 0), (0, np_pad - n)))
                out = pallas_call(
                    kernel,
                    grid=grid,
                    in_specs=[pl.BlockSpec((m, bn), lambda i: (0, i),
                                           memory_space=pltpu.VMEM),
                              pl.BlockSpec((k, bn), lambda i: (0, i),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((m, bn), lambda i: (0, i),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((m, np_pad), jnp.float32),
                    input_output_aliases={0: 0},
                    cost_estimate=pl.CostEstimate(
                        flops=2 * csr.nnz * np_pad,
                        bytes_accessed=(k + 2 * m) * np_pad * 4,
                        transcendentals=0),
                )(c, b)
                return out[:, :n]
            return run

        splits = [_split_const(v) for v in csr.values]

        def kernel64(*refs):
            cin_refs = refs[:n_out]
            bh_ref = refs[n_out]
            bl_ref = refs[n_out + 1] if b_lo else None
            out_refs = refs[n_out + 1 + b_lo:]
            bw = bh_ref.shape[1]
            bh = bh_ref[:].reshape(k, _SUB, bw // _SUB)
            bl = bl_ref[:].reshape(k, _SUB, bw // _SUB) if b_lo else None
            for i, (s, e) in enumerate(rows):
                if s == e:
                    for q in range(n_out):
                        out_refs[q][i] = cin_refs[q][i]
                    continue
                vh, vl = splits[s]
                c0 = int(cols[s])
                hi = vh * bh[c0]
                lo = vl * bh[c0]
                if b_lo:
                    lo = lo + vh * bl[c0]
                for p in range(s + 1, e):
                    vh, vl = splits[p]
                    c_ = int(cols[p])
                    hi = hi + vh * bh[c_]
                    lo = lo + (vh * bl[c_] + vl * bh[c_] if b_lo
                               else vl * bh[c_])
                if c_lo:
                    out_refs[0][i] = cin_refs[0][i] + hi.reshape(bw)
                    out_refs[1][i] = cin_refs[1][i] + lo.reshape(bw)
                else:
                    out_refs[0][i] = cin_refs[0][i] + (hi + lo).reshape(bw)

        n_in_b = 2 if b_lo else 1

        @jax.jit
        def run64(*ops):
            cs, bs = list(ops[:n_out]), list(ops[n_out:])
            if n != np_pad:
                cs = [jnp.pad(c, ((0, 0), (0, np_pad - n))) for c in cs]
                bs = [jnp.pad(b, ((0, 0), (0, np_pad - n))) for b in bs]
            out = pallas_call(
                kernel64,
                grid=grid,
                in_specs=([pl.BlockSpec((m, bn), lambda i: (0, i),
                                        memory_space=pltpu.VMEM)] * n_out
                          + [pl.BlockSpec((k, bn), lambda i: (0, i),
                                          memory_space=pltpu.VMEM)] * n_in_b),
                out_specs=[pl.BlockSpec((m, bn), lambda i: (0, i),
                                        memory_space=pltpu.VMEM)] * n_out,
                out_shape=[jax.ShapeDtypeStruct((m, np_pad),
                                                jnp.float32)] * n_out,
                input_output_aliases={j: j for j in range(n_out)},
                cost_estimate=pl.CostEstimate(
                    flops=(6 if b_lo else 4) * csr.nnz * np_pad,
                    bytes_accessed=(n_in_b * k + 3 * n_out * m // 2)
                    * np_pad * 4,
                    transcendentals=0),
            )(*cs, *bs)
            if c_lo:
                return out[0][:, :n], out[1][:, :n]
            return out[0][:, :n]
        return run64

    @property
    def acc_fn(self):
        """fn(c, b) -> c + A@B (f32) / fn(ch[, cl], bh[, bl]) per schedule."""
        if self._fn_acc_cache is None:
            self._fn_acc_cache = self._build_acc()
        return self._fn_acc_cache

    def __call__(self, b):
        if self.is_f64:
            b = np.asarray(b, np.float64)
            bh = b.astype(np.float32)
            bs = [jnp.asarray(bh)]
            if self.b_lo:
                bs.append(jnp.asarray(
                    (b - bh.astype(np.float64)).astype(np.float32)))
            out = self._fn(*bs)
            if self.c_lo:
                return (np.asarray(out[0], np.float64)
                        + np.asarray(out[1], np.float64))
            return np.asarray(out, np.float64)
        return self._fn(b)


class CscBSpgemm:
    """C[M,N] = A_dense[M,K] @ B_sparse[K,N]  (csc_bsparse_soa analog).

    Implemented via the transpose identity C^T = B^T A^T: B^T in CSR runs
    through CsrSpgemm with the M dimension as the vector axis.
    """

    def __init__(self, csc: Csc, m: int, dtype="float32",
                 strategy: str = "auto"):
        self.csc = csc
        self.m = m
        bt_csr = Csr(csc.k, csc.m, csc.col_ptr, csc.row_idx, csc.values)
        self._inner = CsrSpgemm(bt_csr, m, dtype=dtype, strategy=strategy)
        self.strategy = self._inner.strategy
        self.is_f64 = self._inner.is_f64

    def __call__(self, a):
        at = np.swapaxes(np.asarray(a), -1, -2) if self.is_f64 \
            else jnp.swapaxes(a, -1, -2)
        ct = self._inner(at)
        return np.swapaxes(ct, -1, -2) if self.is_f64 \
            else jnp.swapaxes(ct, -1, -2)


# ---------------------------------------------------------------------------
# Dispatch frontends (libxsmm_create_xcsr_soa / dcsr_reg analogs)
# ---------------------------------------------------------------------------


def create_csr_soa(a, n: int, dtype="float32", strategy: str = "auto",
                   tol: float = 0.0,
                   f64_schedule: str = "split2") -> CsrSpgemm:
    """Sparse-A (CSR or dense-with-zeros) x dense-B kernel, cached by
    structure digest (libxsmm_create_xcsr_soa, libxsmm_main.c:2423)."""
    csr = _as_csr(a, tol)
    if f64_schedule not in F64_SCHEDULES:
        raise ValueError(f"unknown f64 schedule {f64_schedule!r}; "
                         f"one of {sorted(F64_SCHEDULES)}")
    sched_id = sorted(F64_SCHEDULES).index(f64_schedule)
    desc = SparseDescriptor(kind="csr_asparse", m=csr.m, n=n, k=csr.k,
                            dtype=str(np.dtype(dtype) if dtype == "float64"
                                      else jnp.dtype(dtype)),
                            structure_digest=csr.structure_digest(),
                            flags={"auto": 0, "unroll": 1, "dense": 2}[strategy]
                            | (sched_id << 4))
    return get_registry().dispatch(
        desc, lambda: CsrSpgemm(csr, n, dtype, strategy, f64_schedule),
        name=f"spgemm_csr_{csr.m}x{n}x{csr.k}_nnz{csr.nnz}")


def create_dcsr_reg(a, n: int, strategy: str = "unroll",
                    f64_schedule: str = "split2") -> CsrSpgemm:
    """FP64 register-sparse analog (libxsmm_create_dcsr_reg): values baked
    into the kernel as hi/lo constant pairs."""
    return create_csr_soa(a, n, dtype="float64", strategy=strategy,
                          f64_schedule=f64_schedule)


def create_csc_soa(b, m: int, dtype="float32", strategy: str = "auto",
                   tol: float = 0.0) -> CscBSpgemm:
    """Dense-A x sparse-B kernel (libxsmm_create_xcsc_soa analog)."""
    if not isinstance(b, Csc):
        b = Csc.from_dense(np.asarray(b), tol)
    desc = SparseDescriptor(kind="csc_bsparse", m=m, n=b.k, k=b.m,
                            dtype=str(np.dtype(dtype) if dtype == "float64"
                                      else jnp.dtype(dtype)),
                            structure_digest=Csr(
                                b.k, b.m, b.col_ptr, b.row_idx,
                                b.values).structure_digest(),
                            flags={"auto": 0, "unroll": 1, "dense": 2}[strategy])
    return get_registry().dispatch(
        desc, lambda: CscBSpgemm(b, m, dtype, strategy),
        name=f"spgemm_csc_{m}x{b.k}x{b.m}_nnz{b.nnz}")
