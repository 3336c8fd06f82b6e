"""Runtime configuration for xsmm_tpu.

TPU-native analog of LIBXSMM's env-var config surface
(reference: src/libxsmm_main.c:562-677 reads LIBXSMM_VERBOSE, LIBXSMM_TARGET,
LIBXSMM_SYNC, LIBXSMM_SCRATCH_*; src/libxsmm_gemm.c:319-435 reads the
LIBXSMM_TGEMM_* / LIBXSMM_GEMM_* tiling knobs).

We expose the same knobs under the ``XSMM_`` prefix with TPU-apt semantics:
compile-time is trace-time, the "target" is the JAX backend, and tiling
overrides steer Pallas block shapes instead of x86 register blocking.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except (TypeError, ValueError):
        return default


def _env_str(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclasses.dataclass
class Config:
    """Process-wide configuration (reference: libxsmm_main.c:546-705 internal_init)."""

    # Verbosity: 0 silent, 1 errors, 2 warnings+stats at exit, >=3 debug.
    # (reference: LIBXSMM_VERBOSE, libxsmm_main.c:562, README.md:189-203)
    verbose: int = 0

    # Target override: "tpu", "cpu", or "" = autodetect via jax.default_backend().
    # The analog of LIBXSMM_TARGET (libxsmm_main.c:617-621): forcing codegen for
    # a platform other than the one detected.
    target: str = ""

    # FP64 strategy on TPU (no native f64 MXU).  See ops/smm.py module
    # docstring + documentation/perf_notes.md "f64 schedule study": at small
    # K every f32-accumulating schedule measures ~1e-7 rel-Frobenius (the
    # hi-accumulator rounding dominates), so the default is the fastest one.
    #   "split2_fast" - AhBh + AhBl products, lo in scratch (9.9e-8 @ 23^3)
    #   "split2"      - all three split products, dual output (9.4e-8)
    #   "float32"     - hi-only product (1.0e-7)
    #   "native"      - XLA f64 emulation (requires jax_enable_x64)
    f64_strategy: str = "split2_fast"

    # Dispatch cache capacity (reference: 131072-slot registry, libxsmm_main.h:38).
    registry_capacity: int = 131072

    # Per-thread MRU cache size (reference: LIBXSMM_CACHE_MAXSIZE = 4,
    # libxsmm_main.c:120-142).
    cache_maxsize: int = 4

    # Tiled-GEMM tile overrides, 0 = auto (reference: LIBXSMM_TGEMM_M/N/K,
    # libxsmm_gemm.c:383-427).
    tgemm_m: int = 0
    tgemm_n: int = 0
    tgemm_k: int = 0

    # Threshold above which plain dispatch defers to the tiled/XLA path
    # ((M*N*K)^(1/3) <= 64 is "small"; reference README.md:11).
    gemm_threshold: int = 64 * 64 * 64

    # AOT shape list: comma-separated "MxNxK[:dtype]" specs compiled at init,
    # the analog of build-time MNK= static specialization (Makefile:674-700).
    aot_shapes: str = ""

    # Pivot count up to which getrf/trsm trace-time-unroll their pivot
    # loops into static-slice kernels (6.2x/2.7x measured over the masked
    # fori kernels; compile time grows ~linearly with the count).
    getrf_unroll: int = 64

    # Batched-SMM backend: "pallas" (lane-packed VPU kernel, default —
    # measurement mechanistically confirmed) or "xla" (batched dot_general
    # on the MXU; measured faster standalone but collapses when composed —
    # see samples/magazine_driver.py and documentation/perf_notes.md).
    smm_backend: str = "pallas"

    # Force Pallas interpreter mode (for CPU testing / debugging).
    interpret: Optional[bool] = None

    # Use the native C++ registry backend when available.
    use_native: bool = True

    @staticmethod
    def from_env() -> "Config":
        return Config(
            verbose=_env_int("XSMM_VERBOSE", 0),
            target=_env_str("XSMM_TARGET", ""),
            f64_strategy=_env_str("XSMM_F64", "split2_fast"),
            registry_capacity=_env_int("XSMM_REGISTRY_CAPACITY", 131072),
            cache_maxsize=_env_int("XSMM_CACHE_MAXSIZE", 4),
            tgemm_m=_env_int("XSMM_TGEMM_M", 0),
            tgemm_n=_env_int("XSMM_TGEMM_N", 0),
            tgemm_k=_env_int("XSMM_TGEMM_K", 0),
            gemm_threshold=_env_int("XSMM_GEMM_THRESHOLD", 64 * 64 * 64),
            aot_shapes=_env_str("XSMM_AOT_SHAPES", ""),
            getrf_unroll=_env_int("XSMM_GETRF_UNROLL", 64),
            smm_backend=_env_str("XSMM_SMM_BACKEND", "pallas"),
            interpret=(None if "XSMM_INTERPRET" not in os.environ
                       else bool(_env_int("XSMM_INTERPRET", 0))),
            use_native=bool(_env_int("XSMM_NATIVE", 1)),
        )


_CONFIG: Optional[Config] = None


def get_config() -> Config:
    global _CONFIG
    if _CONFIG is None:
        _CONFIG = Config.from_env()
    return _CONFIG


_GENERATION = 0


def config_generation() -> int:
    """Monotone counter bumped by every set_config: lets front caches
    (ops/smm._dispatch memo) invalidate when config changes affect what a
    descriptor builds (e.g. f64_strategy, smm_backend)."""
    return _GENERATION


def set_config(**kwargs) -> Config:
    """Override config fields programmatically (tests, notebooks)."""
    global _GENERATION
    cfg = get_config()
    for k, v in kwargs.items():
        if not hasattr(cfg, k):
            raise AttributeError(f"unknown config field: {k}")
        setattr(cfg, k, v)
    _GENERATION += 1
    if "target" in kwargs or "interpret" in kwargs:
        # platform detection caches backend(); invalidate so target
        # overrides take effect after first use
        from . import platform
        platform.reset_platform_cache()
    return cfg


def set_verbosity(level: int) -> int:
    """Analog of libxsmm_set_verbosity (libxsmm_main.c:1101-1113)."""
    cfg = get_config()
    prev, cfg.verbose = cfg.verbose, int(level)
    return prev
