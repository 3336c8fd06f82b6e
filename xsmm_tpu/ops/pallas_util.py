"""Shared Pallas helpers: interpret-mode selection, padding, lane packing."""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..core import platform

LANES = 128
SUBLANES = 8


def pallas_call(*args, **kwargs):
    """pl.pallas_call with interpret mode auto-selected per platform.

    On non-TPU backends kernels run in the Pallas interpreter — the analog of
    the reference's plain-C ``noarch`` fallback (generator_gemm_noarch.c),
    giving a functional path on any machine for validation.

    IMPORTANT perf note (measured on v5e): setting
    ``compiler_params=CompilerParams(vmem_limit_bytes=...)`` HALVES streaming
    pipeline throughput (1282 -> 652 GB/s on the unrolled spgemm kernel
    in its VMEM-resident regime — see perf_notes 'VMEM residency',
    identical outputs) — the raised scoped-VMEM limit suppresses Mosaic's
    deep DMA multiple-buffering.  Only pass a vmem limit when the kernel's
    blocks cannot compile under the default 16MB scoped budget AND the
    kernel is compute-bound enough not to care (e.g. the MXU tiled GEMM);
    never blanket-apply it.
    """
    kwargs.setdefault("interpret", platform.interpret_mode())
    return pl.pallas_call(*args, **kwargs)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def pad_axis(x: jax.Array, axis: int, to_multiple: int) -> jax.Array:
    size = x.shape[axis]
    target = round_up(size, to_multiple)
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


def pack_lanes(x: jax.Array, lane_multiple: int = LANES) -> jax.Array:
    """[B, ...dims] -> [...dims, Bp]: move batch to the lane (last) axis.

    The TPU analog of the reference's SOA/packed layout (SIMD across the
    batch): one lane per problem instance.  B is padded to a lane multiple.
    """
    x = jnp.moveaxis(x, 0, -1)
    return pad_axis(x, -1, lane_multiple)


def unpack_lanes(x: jax.Array, batch: int) -> jax.Array:
    """Inverse of pack_lanes: [...dims, Bp] -> [B, ...dims]."""
    x = jnp.moveaxis(x, -1, 0)
    return x[:batch]
