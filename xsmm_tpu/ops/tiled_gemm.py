"""Tiled large-GEMM frontend — the libxsmm_gemm_handle analog.

Reference: libxsmm_gemm_handle_init (src/libxsmm_gemm.c:790) plans tile
sizes km/kn/kk from arch tables (:317-427); libxsmm_gemm_thread (:1067)
executes a thread's tile range with copy-in/out; env knobs LIBXSMM_TGEMM_M/N/K
override the plan.

TPU-native design: the "thread team" is the Pallas grid; tiles stream
HBM->VMEM through the Mosaic pipeline (the copy-in/out of tile panels is the
pipeline's double buffering — no explicit matcopy needed); the microkernel is
the 128x128 MXU.  Per-shape plans are cached in the registry like every other
kernel.  XSMM_TGEMM_M/N/K env vars override tile sizes (config.py).

The K loop is the innermost grid dimension with revisiting ("arbitrary"
semantics): the output block stays resident in VMEM across K steps and is
accumulated in place — the analog of the reference's k-loop around the
microkernel with C tile held in registers.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import get_config
from ..core.descriptors import GemmDescriptor, gemm_flags
from ..core.registry import get_registry
from .pallas_util import cdiv, pallas_call, round_up
from .smm import _mxu_precision


def _plan_tiles(m: int, n: int, k: int, itemsize: int):
    """Tile-size planning (the internal_gemm_vwidth/mlimit table analog).

    Defaults target the MXU shape: 1024x1024 C tiles with K panels of 512
    measured 170 TF bf16 on v5e at 4096^3 (86% of peak; 512^3 tiles gave
    153 TF).  The f32 accumulator tile rides VMEM scratch on top of the
    double-buffered in/out blocks, hence the budget check below.
    """
    cfg = get_config()

    def pick(dim: int, cap: int) -> int:
        """Largest tile <= cap that minimizes padding waste (a 1024 tile on
        a 2560 dim pads 20% and measured 2x slower than an exact 512)."""
        if dim <= 128:
            return 128
        best, best_waste = 128, None
        for cand in (1024, 768, 512, 384, 256, 128):
            if cand > cap:
                continue
            waste = round_up(dim, cand) - dim
            if best_waste is None or waste < best_waste or (
                    waste == best_waste and cand > best):
                best, best_waste = cand, waste
        return best

    bm = cfg.tgemm_m or pick(m, 1024)
    bn = cfg.tgemm_n or pick(n, 1024)
    bk = cfg.tgemm_k or pick(k, 512)
    # shrink until blocks fit the VMEM budget (double-buffered in/out
    # + the f32 accumulator scratch)
    budget = 24 * 1024 * 1024
    while (2 * (bm * bk + bk * bn + bm * bn) * itemsize
           + 4 * bm * bn) > budget:
        big = max(bm, bn, bk)
        if bm == big and bm > 128:
            bm //= 2
        elif bn == big and bn > 128:
            bn //= 2
        elif bk > 128:
            bk //= 2
        else:
            break
    return bm, bn, bk


def _matmul_kernel(a_ref, b_ref, c_ref, acc_ref, *, nk: int, precision):
    """Grid (mi, ni, ki): C[mi,ni] += A[mi,ki] @ B[ki,ni] on the MXU."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)

    @pl.when(ki == nk - 1)
    def _():
        c_ref[:] = acc_ref[:].astype(c_ref.dtype)


class TiledGemm:
    """Planned large matmul: C = A @ B (+ C0), MXU-tiled Pallas kernel."""

    def __init__(self, m: int, n: int, k: int, in_dtype="float32",
                 out_dtype=None, precision=None):
        self.m, self.n, self.k = m, n, k
        self.in_dtype = jnp.dtype(in_dtype)
        self.out_dtype = jnp.dtype(out_dtype or in_dtype)
        self.precision = (precision if precision is not None
                          else _mxu_precision(str(self.in_dtype)))
        self.bm, self.bn, self.bk = _plan_tiles(m, n, k,
                                                self.in_dtype.itemsize)
        self._fn = jax.jit(self._build())

    def _build(self):
        m, n, k = self.m, self.n, self.k
        bm, bn, bk = self.bm, self.bn, self.bk
        mp, np_, kp = round_up(m, bm), round_up(n, bn), round_up(k, bk)
        nk = kp // bk
        kern = functools.partial(_matmul_kernel, nk=nk,
                                 precision=self.precision)

        def run(a, b, c0=None):
            a = a.astype(self.in_dtype)
            b = b.astype(self.in_dtype)
            if (m, k) != (mp, kp):
                a = jnp.pad(a, ((0, mp - m), (0, kp - k)))
            if (k, n) != (kp, np_):
                b = jnp.pad(b, ((0, kp - k), (0, np_ - n)))
            out = pallas_call(
                kern,
                grid=(mp // bm, np_ // bn, nk),
                in_specs=[
                    pl.BlockSpec((bm, bk), lambda i, j, q: (i, q),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk, bn), lambda i, j, q: (q, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bm, bn), lambda i, j, q: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((mp, np_), self.out_dtype),
                scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary"),
                    vmem_limit_bytes=100 * 1024 * 1024),
                cost_estimate=pl.CostEstimate(
                    flops=2 * mp * np_ * kp,
                    bytes_accessed=(mp * kp + kp * np_ + mp * np_)
                    * self.in_dtype.itemsize,
                    transcendentals=0),
            )(a, b)
            out = out[:m, :n]
            if c0 is not None:
                out = out + c0.astype(self.out_dtype)
            return out

        return run

    def __call__(self, a, b, c0=None):
        if c0 is not None:
            return self._fn(a, b, c0)
        return self._fn(a, b)


def gemm_handle(m: int, n: int, k: int, in_dtype="float32", out_dtype=None,
                beta: float = 0.0) -> TiledGemm:
    """Create/cache a tiled-GEMM plan (libxsmm_gemm_handle_init analog)."""
    desc = GemmDescriptor(m=m, n=n, k=k, in_dtype=str(jnp.dtype(in_dtype)),
                          out_dtype=str(jnp.dtype(out_dtype or in_dtype)),
                          flags=gemm_flags(beta=beta), batch=0)  # batch=0 tags tiled
    return get_registry().dispatch(
        desc, lambda: TiledGemm(m, n, k, in_dtype, out_dtype),
        name=f"tgemm_{m}x{n}x{k}")


def xgemm(a, b, c0=None):
    """Big-GEMM convenience (libxsmm_?gemm large path / _omp analog)."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, f"inner dims mismatch: {k} vs {k2}"
    h = gemm_handle(m, n, k, in_dtype=a.dtype,
                    beta=0.0 if c0 is None else 1.0)
    return h(a, b, c0)
