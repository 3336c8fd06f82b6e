"""Dynamic-sparsity sparse x dense multiply (spmdm).

Reference: src/libxsmm_spmdm.c — two-phase API for DNN sparse weights:
libxsmm_spmdm_init sizes block structure (bm/bk/bn, spmdm.h:42-60),
createSparseSlice converts dense A into blocked CSR slices in parallel, then
compute does CSR x dense-B per block (hand-written per-ISA intrinsic paths).
fp32 and bf16-input variants (libxsmm_spmdm.h:98-127:
libxsmm_spmdm_createSparseSlice_bfloat16_thread /
libxsmm_spmdm_compute_bfloat16_thread — bf16 inputs, fp32 accumulation).
Here ``in_dtype="bfloat16"`` selects the same contract: A is rounded to
bf16 at slice time (the reference's input IS bf16), ELL values are stored
as the exact f32 image of those bf16 values, B stays bf16 through the
gather with the multiply-accumulate promoted to f32 in-register, and the
dense strategy runs the native-bf16 MXU pass with
preferred_element_type=f32.

TPU-native design: the structure changes per call, so trace-time unrolling
is impossible (shapes must be static under jit).  Two strategies:

* **"dense"**: the slice phase is a threshold/pass-through and compute is
  a masked MXU matmul.  At DNN sparsity levels (50-90%) on TPU this is the
  bandwidth/MXU roofline path — skipping multiplies saves nothing when the
  MXU is systolic.

* **"ell"**: the slice phase packs A into fixed-width ELL (per-row top-R
  values + column indices, R = max row population rounded up) — static
  shapes, so one compiled kernel serves every structure with the same R cap.
  The pack is a vectorized stable-argsort left-pack (no Python row loop;
  <1ms at 1024x1024 on host).  Compute gathers B rows by index (XLA
  dynamic-gather) and accumulates.  Wins only at extreme sparsity where
  reading dense A dominates.

* **"auto"** (default): packs ELL and keeps it only below the measured
  dense/ELL crossover (SpmdmHandle.ELL_CROSSOVER, measured on v5e — see
  documentation/perf_notes.md "spmdm crossover"); otherwise dense.

The handle caches compiled fns per (shape, dtype, R) like the reference
caches its generated code paths per ISA.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_util import round_up


@dataclasses.dataclass
class SparseSlice:
    """The createSparseSlice output (ELL-packed or dense pass-through).

    ``transa`` records the layout A was supplied in (libxsmm passes the
    same flag again at compute time, libxsmm_spmdm.h:91,109); the slice is
    stored normalized to logical [M,K], so compute only validates the echo.
    """

    kind: str                      # "dense" | "ell"
    a: Optional[jax.Array] = None  # dense [M,K] (logical, transa-normalized)
    values: Optional[jax.Array] = None   # [M, R]
    cols: Optional[jax.Array] = None     # [M, R] int32
    nnz: int = 0
    transa: bool = False


class SpmdmHandle:
    """libxsmm_spmdm_handle analog: fixed (M, N, K, dtypes), dynamic A."""

    def __init__(self, m: int, n: int, k: int, in_dtype="float32",
                 strategy: str = "auto"):
        if strategy not in ("auto", "dense", "ell"):
            raise ValueError(f"unknown spmdm strategy: {strategy}")
        self.m, self.n, self.k = m, n, k
        self.in_dtype = jnp.dtype(in_dtype)
        self.strategy = strategy
        # block sizes for parity with reference (bm/bk/bn, spmdm.h:42-60);
        # on TPU blocking is XLA's job, these are informational
        self.bm, self.bk, self.bn = 128, 128, 128
        self._dense_fn = jax.jit(self._dense_compute,
                                 static_argnames=("transb", "transc",
                                                  "has_beta"))
        self._ell_fns = {}

    # Measured ELL-vs-dense crossover (v5e, M=K=1024 N=2048 f32): the
    # gather-based ELL compute loses to the HIGHEST-precision dense MXU
    # matmul at EVERY DNN sparsity level (8.4x slower even at 2% density —
    # ELL time scales with R * M * N gather traffic while the dense matmul
    # is one MXU pass); extrapolated break-even is ~0.5% density.  auto
    # therefore picks dense for everything DNN-shaped (see
    # documentation/perf_notes.md "spmdm crossover").
    ELL_CROSSOVER = 0.005

    # -- phase 1: createSparseSlice -------------------------------------------
    def create_sparse_slice(self, a, tol: float = 0.0,
                            transa: bool = False) -> SparseSlice:
        """Convert dense A [M,K] into the compute representation.

        ``transa=True`` means A is supplied as [K,M] column-major-style and
        the logical operand is its transpose (the reference's 'T' char,
        libxsmm_spmdm.h:91); normalization happens here so every compute
        strategy sees logical [M,K].

        The ELL pack has no Python row loop: a single-pass C++ pack
        (native/spmdm.cpp, ~1ms at 1024x1024) with a vectorized numpy
        fallback (~9ms) — usable for per-step dynamic sparsity.
        strategy="auto" packs ELL only when the padded width R clears the
        measured crossover; otherwise it falls back to the dense
        pass-through.
        """
        if transa:
            a = jnp.asarray(a).T
        if self.strategy == "dense":
            a = jnp.asarray(a, self.in_dtype)
            if tol:
                a = jnp.where(jnp.abs(a) > tol, a, 0)
            # keep nnz as a device scalar: an eager int() here would block
            # on a host round-trip (~25ms tunneled) in the per-step path
            nnz = jnp.count_nonzero(a)
            return SparseSlice(kind="dense", a=a, nnz=nnz, transa=transa)

        if self.in_dtype == jnp.bfloat16:
            # reference bf16 slice contract: the input IS bf16; round
            # first so ELL values are the exact f32 image of bf16 values
            a = jnp.asarray(a).astype(jnp.bfloat16)
        a_np = np.ascontiguousarray(np.asarray(a), np.float32)

        # native single-pass pack (rowmax probe first so "auto" can bail
        # to dense without packing)
        from ..core import native_bridge
        lib = native_bridge.get_lib()
        if lib is not None and getattr(lib, "xsmm_has_ell", False):
            import ctypes
            rmax = lib.xsmm_ell_rowmax(
                a_np.ctypes.data_as(ctypes.c_void_p),
                self.m, self.k, float(tol))
            r = max(1, int(round_up(max(int(rmax), 1), 8)))
            if self.strategy == "auto" and r > self.ELL_CROSSOVER * self.k:
                nz = a_np if not tol else np.where(
                    np.abs(a_np) > tol, a_np, 0)
                return SparseSlice(kind="dense",
                                   a=jnp.asarray(nz, self.in_dtype),
                                   nnz=int(np.count_nonzero(nz)),
                                   transa=transa)
            vals, cols, nnz_total, r = native_bridge.ell_pack_native(
                a_np, float(tol), r=r)  # r precomputed: skip the re-probe
            return SparseSlice(kind="ell", values=jnp.asarray(vals),
                               cols=jnp.asarray(cols), nnz=nnz_total,
                               transa=transa)

        if tol:
            a_np = np.where(np.abs(a_np) > tol, a_np, 0)
        mask = a_np != 0
        counts = mask.sum(axis=1)
        r = max(1, int(round_up(int(counts.max() or 1), 8)))
        if self.strategy == "auto" and r > self.ELL_CROSSOVER * self.k:
            return SparseSlice(kind="dense",
                               a=jnp.asarray(a_np, self.in_dtype),
                               nnz=int(counts.sum()), transa=transa)
        # numpy fallback: left-pack with a computed-position scatter
        # (row-major np.nonzero order gives position = global index minus
        # the row's start) — ~9ms at 1024x1024 vs 25ms for a stable-argsort
        # pack; the reference's analog is the parallel createSparseSlice
        # (libxsmm_spmdm.c:540)
        nnz_total = int(counts.sum())
        rows, colsrc = np.nonzero(mask)
        row_start = np.concatenate(([0], np.cumsum(counts[:-1])))
        pos = np.arange(nnz_total) - row_start[rows]
        vals = np.zeros((self.m, r), np.float32)
        vals[rows, pos] = a_np[mask]
        # padded cols stay 0 (< K, so the gather is in-bounds; the zero
        # value annihilates the contribution)
        cols = np.zeros((self.m, r), np.int32)
        cols[rows, pos] = colsrc
        return SparseSlice(kind="ell", values=jnp.asarray(vals),
                           cols=jnp.asarray(cols), nnz=nnz_total,
                           transa=transa)

    # -- phase 2: compute ------------------------------------------------------
    def _dense_compute(self, a, b, c, *, transb, transc, has_beta):
        bb = b.T if transb else b
        dot_dtype = self.in_dtype
        if self.in_dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
            # CPU DotThunk lacks bf16 x bf16 = f32 for the non-canonical
            # dots the trans flags produce; computing in f32 from the
            # bf16-rounded inputs is bit-identical contract semantics
            # (bf16 values are exact in f32, accumulation is f32 either
            # way).  TPU keeps the native bf16 MXU pass.
            a = a.astype(jnp.bfloat16).astype(jnp.float32)
            bb = bb.astype(jnp.bfloat16).astype(jnp.float32)
            dot_dtype = jnp.float32
        prec = (jax.lax.Precision.HIGHEST
                if self.in_dtype == jnp.float32 else None)
        out = jnp.matmul(a.astype(dot_dtype), bb.astype(dot_dtype),
                         preferred_element_type=jnp.float32,
                         precision=prec)
        if transc:
            out = out.T
        if has_beta:
            out = out + c.astype(jnp.float32)
        return out

    def _ell_compute_fn(self, r: int, transb: bool, transc: bool,
                        has_beta: bool):
        key = (r, transb, transc, has_beta)
        if key not in self._ell_fns:
            @jax.jit
            def fn(values, cols, b, c):
                bl = b.T if transb else b   # logical [K, N]
                def body(j, acc):
                    cj = jax.lax.dynamic_index_in_dim(cols, j, 1, False)
                    vj = jax.lax.dynamic_index_in_dim(values, j, 1, True)
                    rows = jnp.take(bl, cj, axis=0)             # [M, N]
                    # bf16 B promotes to the f32 accumulator in-register
                    # (the reference's bf16->fp32 upconvert-accumulate,
                    # libxsmm_spmdm.h:115-127) — no separate B pass
                    return acc + vj * rows.astype(jnp.float32)
                if has_beta:   # accumulate into C (in its LOGICAL layout)
                    acc0 = (c.T if transc else c).astype(jnp.float32)
                else:
                    acc0 = jnp.zeros((self.m, bl.shape[1]), jnp.float32)
                out = jax.lax.fori_loop(0, r, body, acc0)
                return out.T if transc else out
            self._ell_fns[key] = fn
        return self._ell_fns[key]

    def compute(self, slice_: SparseSlice, b, transa: Optional[bool] = None,
                transb: bool = False, transc: bool = False,
                beta: float = 0.0, c=None):
        """C = A_slice @ B [+ beta*C] (libxsmm_spmdm_compute_*_thread analog).

        ``transa`` echoes the slice-time flag (the reference passes it to
        both phases, libxsmm_spmdm.h:106-117); the slice is already
        normalized, so a mismatching echo is an error, not a re-transpose.
        ``transb``: B is supplied [N,K], logical operand is B^T.
        ``transc``: C is produced (and read, under beta=1) as [N,M].
        ``beta`` in {0, 1} (the reference supports exactly these,
        libxsmm_spmdm.c kernel dispatch); alpha is ignored like the
        reference (libxsmm_spmdm.h:105 note).  Output is always f32
        (the reference's C is float* for both fp32 and bf16 variants).
        """
        if transa is not None and bool(transa) != slice_.transa:
            raise ValueError(
                f"transa={transa} does not match the slice-time flag "
                f"({slice_.transa}); pass transa to create_sparse_slice")
        if beta not in (0, 1, 0.0, 1.0):
            raise ValueError(f"spmdm supports beta in {{0,1}}, got {beta}")
        has_beta = bool(beta)
        if has_beta and c is None:
            raise ValueError("beta=1 requires c")
        if slice_.kind == "dense":
            return self._dense_fn(slice_.a, b,
                                  c if has_beta else jnp.zeros((), jnp.float32),
                                  transb=transb, transc=transc,
                                  has_beta=has_beta)
        fn = self._ell_compute_fn(int(slice_.values.shape[1]),
                                  transb, transc, has_beta)
        return fn(slice_.values, slice_.cols,
                  jnp.asarray(b).astype(self.in_dtype),
                  c if has_beta else jnp.zeros((), jnp.float32))

    def __call__(self, a, b, tol: float = 0.0):
        return self.compute(self.create_sparse_slice(a, tol), b)


def spmdm_init(m: int, n: int, k: int, in_dtype="float32",
               strategy: str = "auto") -> SpmdmHandle:
    """libxsmm_spmdm_init analog.  strategy: "auto" (measured ELL/dense
    crossover), "dense", or "ell"."""
    return SpmdmHandle(m, n, k, in_dtype=in_dtype, strategy=strategy)
