"""Matrix copy / transpose kernels (the xcopy domain).

Reference: src/libxsmm_xcopy.c — tiled libxsmm_matcopy (:106), out-of-place
libxsmm_otrans (:244), in-place itrans (:381), with JIT'd mcopy/trans kernels
(generator_matcopy_avx_avx512.c, generator_transpose_avx_avx512.c) above a
size threshold.

TPU-native design: data movement is the DMA engine's job — a Pallas kernel
whose body is a block assignment compiles to pipelined HBM->VMEM->HBM DMA at
full bandwidth; the transpose runs as tiled VMEM-local shuffles between the
DMAs.  Small/odd shapes route to plain XLA ops (the loop fallback analog).
The zero-source mcopy mode (reference flag) becomes a fill kernel.

These kernels double as the layout-conversion primitives for the blocked /
lane-packed formats used by the SMM and packed-LA domains.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.descriptors import MatcopyDescriptor, TransDescriptor
from ..core.registry import get_registry
from .pallas_util import cdiv, pallas_call, round_up

_TILE = 512  # rows per grid step for streaming copies


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def _zero_kernel(o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)


class MatcopyKernel:
    """Batched matrix copy (or zero-fill) kernel.

    Call: kernel(x) -> copy of x; kernel() -> zeros (zero_source mode).
    Shapes: [..., M, N] with any leading batch dims.
    """

    def __init__(self, desc: MatcopyDescriptor):
        self.desc = desc
        dt = jnp.dtype(desc.dtype)

        if desc.zero_source:
            @jax.jit
            def run():
                shape = ((desc.batch,) if desc.batch > 1 else ()) \
                    + (desc.m, desc.n)
                return jnp.zeros(shape, dt)
            self._fn = run
        else:
            m, n = desc.m, desc.n

            @jax.jit
            def run(x):
                # flatten batch+M into one streaming axis; one DMA pipeline
                lead = x.shape[:-2]
                rows = m
                for d in lead:
                    rows *= d
                x2 = x.reshape(rows, n)
                if rows % 8 or n % 128 or rows < _TILE:
                    return jnp.copy(x).reshape(*lead, m, n)
                # cap the block at ~4MB: blocks are double-buffered on both
                # sides and must fit Mosaic's default 16MB scoped budget
                # (full-width 512-row blocks OOM'd at n=8192); rows too wide
                # to tile under the cap fall back to XLA's copy
                max_rows = (4 * 1024 * 1024) // max(1, n * dt.itemsize)
                max_rows = max_rows // 8 * 8
                if max_rows < 8:
                    return jnp.copy(x).reshape(*lead, m, n)
                bt = min(_TILE, rows, max_rows)
                while rows % bt:
                    bt //= 2
                if bt < 8:
                    return jnp.copy(x).reshape(*lead, m, n)
                out = pallas_call(
                    _copy_kernel,
                    grid=(rows // bt,),
                    in_specs=[pl.BlockSpec((bt, n), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((bt, n), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((rows, n), dt),
                )(x2)
                return out.reshape(*lead, m, n)
            self._fn = run

    def __call__(self, x=None):
        if self.desc.zero_source:
            return self._fn()
        return self._fn(x)


def _trans_kernel(x_ref, o_ref):
    # x block [tm, tn] -> o block [tn, tm]; VMEM-local shuffle between DMAs
    o_ref[:] = x_ref[:].T


class TransKernel:
    """Out-of-place transpose: [..., M, N] -> [..., N, M].

    2-D arrays with MXU-aligned tiles run through a tiled Pallas kernel;
    everything else routes to XLA's transpose (itself DMA-optimal on TPU).
    """

    # 512x512 f32 tiles (1MB) measured 676 GB/s on v5e vs 531 at 256^2 and
    # ~660 for XLA's own transpose.  Non-divisible shapes use a ragged grid
    # (Pallas masks the edge blocks) at full speed — 653 GB/s measured at
    # 8448x8320; only sub-tile shapes fall back to XLA.
    TM = 512
    TN = 512

    def __init__(self, desc: TransDescriptor):
        self.desc = desc
        m, n = desc.m, desc.n
        dt = jnp.dtype(desc.dtype)
        use_pallas = (m >= self.TM and n >= self.TN)

        @jax.jit
        def run(x):
            if x.ndim != 2 or not use_pallas:
                return jnp.swapaxes(x, -1, -2)
            return pallas_call(
                _trans_kernel,
                grid=(cdiv(m, self.TM), cdiv(n, self.TN)),
                in_specs=[pl.BlockSpec((self.TM, self.TN),
                                       lambda i, j: (i, j),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((self.TN, self.TM),
                                       lambda i, j: (j, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, m), dt),
            )(x)

        self._fn = run

    def __call__(self, x):
        return self._fn(x)


# ---------------------------------------------------------------------------
# Dispatch frontends (libxsmm_dispatch_mcopy / _trans analogs,
# libxsmm_main.c:2318-2422)
# ---------------------------------------------------------------------------


def matcopy_dispatch(m: int, n: int, dtype="float32", zero_source=False,
                     batch: int = 1) -> MatcopyKernel:
    desc = MatcopyDescriptor(m=m, n=n, dtype=str(jnp.dtype(dtype)),
                             zero_source=zero_source, batch=batch)
    return get_registry().dispatch(
        desc, lambda: MatcopyKernel(desc), name=f"mcopy_{m}x{n}")


def trans_dispatch(m: int, n: int, dtype="float32",
                   batch: int = 1) -> TransKernel:
    desc = TransDescriptor(m=m, n=n, dtype=str(jnp.dtype(dtype)), batch=batch)
    return get_registry().dispatch(
        desc, lambda: TransKernel(desc), name=f"trans_{m}x{n}")


def matcopy(x, zero: bool = False):
    """One-shot convenience (libxsmm_matcopy analog, libxsmm_xcopy.c:106)."""
    m, n = x.shape[-2], x.shape[-1]
    batch = 1
    for d in x.shape[:-2]:
        batch *= d
    k = matcopy_dispatch(m, n, dtype=x.dtype, zero_source=zero, batch=batch)
    return k() if zero else k(x)


def otrans(x):
    """Out-of-place transpose (libxsmm_otrans analog, libxsmm_xcopy.c:244)."""
    m, n = x.shape[-2], x.shape[-1]
    batch = 1
    for d in x.shape[:-2]:
        batch *= d
    return trans_dispatch(m, n, dtype=x.dtype, batch=batch)(x)


def itrans(x):
    """In-place transpose analog (libxsmm_xcopy.c:381) — functional on TPU."""
    return otrans(x)
