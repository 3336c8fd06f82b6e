"""xsmm_tpu — a TPU-native small/sparse matrix kernel framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of LIBXSMM
(reference: /root/reference, v1.12 line): shape-specialized kernel dispatch
with a persistent registry, batched/batch-reduce small GEMM, sparse x dense
kernels with trace-time structure unrolling, packed batched factorizations,
copy/transpose kernels, DNN layer primitives, and multi-host scaling over
ICI/DCN collectives.

Architecture map (see SURVEY.md section 7): the x86 JIT backend's role —
emitting a perfect inner kernel per shape descriptor — is played by tracing
parameterized Pallas kernels compiled by Mosaic/XLA, cached forever in a
descriptor-keyed registry (the internal_find_code analog).
"""

import os

from .core.config import Config, get_config, set_config, set_verbosity
from .core.descriptors import (
    GemmDescriptor, GemmFlags, MatcopyDescriptor, PackedDescriptor, Prefetch,
    SparseDescriptor, TransDescriptor, gemm_flags,
)
from .core.registry import finalize, get_registry
from .core import platform
from .ops.smm import (
    BatchedSMM, BatchReduceGemm, XlaGemm,
    bmmdispatch, bmmdispatch_reducebatch, bsmmdispatch,
    bsmmdispatch_reducebatch, dmmdispatch, dmmdispatch_reducebatch,
    join_f64, mmdispatch, smmdispatch, smmdispatch_reducebatch, split_f64,
    wimmdispatch, wsmmdispatch,
)
from .ops.xcopy import itrans, matcopy, matcopy_dispatch, otrans, trans_dispatch
from .ops.tiled_gemm import TiledGemm, gemm_handle, xgemm
from .ops.spgemm import (CsrSpgemm, create_csc_soa, create_csr_soa,
                         create_dcsr_reg)
from .ops.fsspmdm import Fsspmdm, dfsspmdm_create, sfsspmdm_create
from .ops.spmdm import SpmdmHandle, spmdm_init
from .ops.blocked_gemm import BlockedGemmHandle, blocked_gemm_handle
from .ops.mmbatch import gemm_batch, mmbatch, mmbatch_begin
from .ops.packed import (GetrfKernel, TrmmKernel, TrsmKernel, getrf_dispatch,
                         pgemm_dispatch, trmm_dispatch, trsm_dispatch)
from .utils.matdiff import MatdiffInfo, check, matdiff
from .utils.mtx import Csc, Csr, read_mtx, write_mtx
from .utils.dataset import DataLoader, write_dataset
from .utils import mathx, mhd, rng, scratch, timer, trace

__version__ = "0.1.0"


def enable_compile_cache(path: str = "") -> str:
    """Arm JAX's persistent compilation cache.

    The analog of the reference's build-time static kernel specialization
    (MNK= make key, Makefile:674-700) combined with its forever-lived JIT
    registry: once a descriptor's kernel is compiled on a machine, later
    processes load the binary instead of re-running Mosaic/XLA — this is
    what amortizes the trace-unrolled sparse kernels' compile cost.
    """
    import jax

    path = path or os.environ.get("XSMM_CACHE_DIR",
                                  os.path.expanduser("~/.xsmm_tpu_cache"))
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path


def init():
    """Analog of libxsmm_init (libxsmm_main.c:708): eager bring-up.

    Reads env config, creates the registry, arms the persistent compilation
    cache, and AOT-compiles any shapes listed in XSMM_AOT_SHAPES
    ("MxNxK[:dtype][:batch],...") — the analog of build-time MNK= static
    specialization (Makefile:674-700).
    """
    cfg = get_config()
    reg = get_registry()
    try:
        enable_compile_cache()
    except Exception:
        pass
    if cfg.aot_shapes:
        for spec in cfg.aot_shapes.split(","):
            spec = spec.strip()
            if not spec:
                continue
            parts = spec.split(":")
            m, n, k = (int(x) for x in parts[0].lower().split("x"))
            dtype = parts[1] if len(parts) > 1 else "float32"
            batch = int(parts[2]) if len(parts) > 2 else 1
            mmdispatch(m, n, k, in_dtype=dtype, batch=batch, beta=0.0)
            reg.stats.nsta += 1
    return reg


def get_registry_info():
    """Analog of libxsmm_get_registry_info (libxsmm_main.c:2092)."""
    return get_registry().info()


def get_kernel_info(descriptor):
    """Analog of libxsmm_get_mmkernel_info (libxsmm_main.c:1969): the
    per-kernel introspection record (name, shape, dtype, working-set
    estimate, hit count) for a registered descriptor, or None.

    Front-memo hits on the typed frontends (mmdispatch) bypass the
    registry probe for speed and are not counted per kernel; the
    aggregate HIT stat still covers them."""
    return get_registry().kernel_info(descriptor)


def registry_kernels():
    """Enumerate every registered kernel, hottest first (the reference's
    registry walk, libxsmm_main.c:2092)."""
    return get_registry().kernels()
