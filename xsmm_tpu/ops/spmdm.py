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
    """The createSparseSlice output (ELL-packed or dense pass-through)."""

    kind: str                      # "dense" | "ell"
    a: Optional[jax.Array] = None  # dense [M,K]
    values: Optional[jax.Array] = None   # [M, R]
    cols: Optional[jax.Array] = None     # [M, R] int32
    nnz: int = 0


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
        self._dense_fn = jax.jit(self._dense_compute)
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
    def create_sparse_slice(self, a, tol: float = 0.0) -> SparseSlice:
        """Convert dense A [M,K] into the compute representation.

        The ELL pack has no Python row loop: a single-pass C++ pack
        (native/spmdm.cpp, ~1ms at 1024x1024) with a vectorized numpy
        fallback (~9ms) — usable for per-step dynamic sparsity.
        strategy="auto" packs ELL only when the padded width R clears the
        measured crossover; otherwise it falls back to the dense
        pass-through.
        """
        if self.strategy == "dense":
            a = jnp.asarray(a, self.in_dtype)
            if tol:
                a = jnp.where(jnp.abs(a) > tol, a, 0)
            # keep nnz as a device scalar: an eager int() here would block
            # on a host round-trip (~25ms tunneled) in the per-step path
            nnz = jnp.count_nonzero(a)
            return SparseSlice(kind="dense", a=a, nnz=nnz)

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
                                   nnz=int(np.count_nonzero(nz)))
            vals, cols, nnz_total, r = native_bridge.ell_pack_native(
                a_np, float(tol), r=r)  # r precomputed: skip the re-probe
            return SparseSlice(kind="ell", values=jnp.asarray(vals),
                               cols=jnp.asarray(cols), nnz=nnz_total)

        if tol:
            a_np = np.where(np.abs(a_np) > tol, a_np, 0)
        mask = a_np != 0
        counts = mask.sum(axis=1)
        r = max(1, int(round_up(int(counts.max() or 1), 8)))
        if self.strategy == "auto" and r > self.ELL_CROSSOVER * self.k:
            return SparseSlice(kind="dense",
                               a=jnp.asarray(a_np, self.in_dtype),
                               nnz=int(counts.sum()))
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
                           cols=jnp.asarray(cols), nnz=nnz_total)

    # -- phase 2: compute ------------------------------------------------------
    def _dense_compute(self, a, b):
        prec = (jax.lax.Precision.HIGHEST
                if self.in_dtype == jnp.float32 else None)
        return jnp.matmul(a.astype(self.in_dtype), b.astype(self.in_dtype),
                          preferred_element_type=jnp.float32,
                          precision=prec)

    def _ell_compute_fn(self, r: int):
        if r not in self._ell_fns:
            @jax.jit
            def fn(values, cols, b):
                def body(j, acc):
                    cj = jax.lax.dynamic_index_in_dim(cols, j, 1, False)
                    vj = jax.lax.dynamic_index_in_dim(values, j, 1, True)
                    rows = jnp.take(b, cj, axis=0)              # [M, N]
                    # bf16 B promotes to the f32 accumulator in-register
                    # (the reference's bf16->fp32 upconvert-accumulate,
                    # libxsmm_spmdm.h:115-127) — no separate B pass
                    return acc + vj * rows.astype(jnp.float32)
                acc0 = jnp.zeros((self.m, b.shape[1]), jnp.float32)
                return jax.lax.fori_loop(0, r, body, acc0)
            self._ell_fns[r] = fn
        return self._ell_fns[r]

    def compute(self, slice_: SparseSlice, b):
        """C = A_slice @ B (libxsmm_spmdm_compute_*_thread analog)."""
        if slice_.kind == "dense":
            return self._dense_fn(slice_.a, b)
        fn = self._ell_compute_fn(int(slice_.values.shape[1]))
        return fn(slice_.values, slice_.cols,
                  jnp.asarray(b).astype(self.in_dtype))

    def __call__(self, a, b, tol: float = 0.0):
        return self.compute(self.create_sparse_slice(a, tol), b)


def spmdm_init(m: int, n: int, k: int, in_dtype="float32",
               strategy: str = "auto") -> SpmdmHandle:
    """libxsmm_spmdm_init analog.  strategy: "auto" (measured ELL/dense
    crossover), "dense", or "ell"."""
    return SpmdmHandle(m, n, k, in_dtype=in_dtype, strategy=strategy)
