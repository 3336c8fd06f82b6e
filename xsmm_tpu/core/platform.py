"""Platform detection — the CPUID analog.

Reference: src/libxsmm_cpuid_x86.c:85 detects the x86 ISA tier and
libxsmm_main.c:1027 lets LIBXSMM_TARGET override it.  On TPU the "ISA" is the
JAX backend + TPU generation; the override forces Pallas interpreter mode so
the same kernels run (slowly, bit-accurately) on CPU — the analog of the
reference's ``noarch`` plain-C fallback (generator_gemm.c:277-280) used for
cross-platform validation.
"""

from __future__ import annotations

import functools

import jax

from .config import get_config


@functools.lru_cache(maxsize=None)
def backend() -> str:
    cfg = get_config()
    if cfg.target:
        return cfg.target
    return jax.default_backend()


def is_tpu() -> bool:
    return backend() == "tpu"


def interpret_mode() -> bool:
    """Whether pallas_call should run in interpreter mode.

    True on non-TPU backends (the noarch fallback) unless explicitly
    overridden via XSMM_INTERPRET / config.interpret.
    """
    cfg = get_config()
    if cfg.interpret is not None:
        return cfg.interpret
    return not is_tpu()


@functools.lru_cache(maxsize=None)
def target_name() -> str:
    """Analog of libxsmm_cpuid_name (libxsmm_cpuid_x86.c:164)."""
    if not is_tpu():
        return backend()
    d = jax.devices()[0]
    return getattr(d, "device_kind", "tpu")


@functools.lru_cache(maxsize=None)
def mxu_shape() -> tuple:
    """(sublane, lane) native tile of the matrix unit."""
    return (128, 128)


@functools.lru_cache(maxsize=None)
def vpu_shape() -> tuple:
    return (8, 128)


def min_tile(dtype) -> tuple:
    """Minimum (sublane, lane) tile for a dtype (pallas_guide: tiling table)."""
    import jax.numpy as jnp

    d = jnp.dtype(dtype)
    if d.itemsize >= 4:
        return (8, 128)
    if d.itemsize == 2:
        return (16, 128)
    return (32, 128)


def reset_platform_cache() -> None:
    backend.cache_clear()
    target_name.cache_clear()
