"""Offline kernel generator CLI — the libxsmm_gemm_generator analog.

Reference: src/libxsmm_generator_gemm_driver.c — a standalone binary that
emits dense/sparse kernels for *static* builds, with three code types
(generator_gemm.c:294-386): 2 = binary JIT, 1 = assembly text (.s),
0 = C inline-asm.

TPU-native mapping: "binary" = AOT-compile into JAX's persistent
compilation cache so later processes load instead of compiling (the MNK=
static-specialization role, Makefile:674-700); the two text modes become
the compiler's own IR dumps — StableHLO (the portable "source" form) and
optimized HLO (the post-XLA "assembly" form) — written to a file for
offline inspection/validation, exactly how the reference's text modes are
used by samples/generator/validation.c.

Usage:
  python -m xsmm_tpu.tools.generator gemm M N K [--dtype float32]
      [--batch B] [--batch-reduce] [--code-type compiled|hlo|stablehlo]
      [--out FILE]
  python -m xsmm_tpu.tools.generator spgemm MTX_FILE N [--dtype float64]
      [--code-type ...] [--out FILE]
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _abstract_args(kernel, desc) -> Tuple:
    """Shape-only example args for lowering the kernel's packed/hot path."""
    from ..ops.smm import BatchedSMM, BatchReduceGemm, XlaGemm

    f32 = jnp.float32
    if isinstance(kernel, BatchedSMM):
        bt = kernel.bt
        m, n, k = desc.m, desc.n, desc.k
        a = jax.ShapeDtypeStruct((m, k, bt), f32)
        b = jax.ShapeDtypeStruct((k, n, bt), f32)
        if kernel.strategy == "split2":
            ops = (a, a, b, b)
            beta_ops = (jax.ShapeDtypeStruct((m, n, bt), f32),) * 2
        elif kernel.strategy == "split2_fast":
            ops = (a, b, b)
            beta_ops = (jax.ShapeDtypeStruct((m, n, bt), f32),)
        elif kernel.strategy == "float32":
            ops = (a, b)
            beta_ops = (jax.ShapeDtypeStruct((m, n, bt), f32),)
        else:
            dt = jnp.dtype(desc.in_dtype)
            a = jax.ShapeDtypeStruct((m, k, bt), dt)
            b = jax.ShapeDtypeStruct((k, n, bt), dt)
            ops = (a, b)
            beta_ops = (jax.ShapeDtypeStruct((m, n, bt), dt),)
        if desc.beta:
            ops = ops + beta_ops
        return kernel._packed_fn, ops
    if isinstance(kernel, BatchReduceGemm):
        dt = f32 if kernel.is_f64 else jnp.dtype(desc.in_dtype)
        a = jax.ShapeDtypeStruct((max(desc.batch, 1), desc.m, desc.k), dt)
        b = jax.ShapeDtypeStruct((max(desc.batch, 1), desc.k, desc.n), dt)
        return kernel._fn, (a, b)
    # XlaGemm (keeps the requested batch as a leading dim when present)
    dt = f32 if kernel.is_f64 else jnp.dtype(desc.in_dtype)
    lead = (desc.batch,) if desc.batch > 1 else ()
    a = jax.ShapeDtypeStruct(lead + (desc.m, desc.k), dt)
    b = jax.ShapeDtypeStruct(lead + (desc.k, desc.n), dt)
    if kernel.is_f64:
        return kernel._fn_split2, (a, a, b, b)
    return kernel._fn, (a, b)


def generate_gemm(m: int, n: int, k: int, dtype: str = "float32",
                  batch: int = 1, batch_reduce: bool = False,
                  code_type: str = "compiled") -> str:
    """Build + lower one GEMM kernel; returns text (or a status line)."""
    from .. import enable_compile_cache, mmdispatch
    from ..core.descriptors import GemmDescriptor, gemm_flags

    enable_compile_cache()
    kern = mmdispatch(m, n, k, in_dtype=dtype, batch=batch,
                      batch_reduce=batch_reduce, beta=0.0)
    desc = GemmDescriptor(m=m, n=n, k=k, in_dtype=str(jnp.dtype(dtype)),
                          out_dtype=str(jnp.dtype(dtype)),
                          flags=gemm_flags("N", "N", 0.0, batch_reduce),
                          batch=batch)
    fn, args = _abstract_args(kern, desc)
    lowered = fn.lower(*args)
    if code_type == "stablehlo":
        return lowered.as_text()
    compiled = lowered.compile()
    if code_type == "hlo":
        return compiled.as_text()
    mem = compiled.memory_analysis()
    return (f"compiled gemm_{dtype}_{m}x{n}x{k}_b{batch}"
            f"{'_br' if batch_reduce else ''} into the persistent cache"
            f" (argument_size={getattr(mem, 'argument_size_in_bytes', '?')}"
            f" temp_size={getattr(mem, 'temp_size_in_bytes', '?')})\n")


def generate_spgemm(mtx_path: str, n: int, dtype: str = "float64",
                    code_type: str = "compiled") -> str:
    """Build + lower one sparse-A kernel from a MatrixMarket file."""
    from .. import create_csr_soa, enable_compile_cache, read_mtx

    enable_compile_cache()
    a = read_mtx(mtx_path)
    kern = create_csr_soa(a, n, dtype=dtype)
    f32 = jnp.float32
    k = a.shape[1]
    b = jax.ShapeDtypeStruct((k, n), f32)
    args = (b, b) if kern.is_f64 else (b,)
    lowered = kern._fn.lower(*args)
    if code_type == "stablehlo":
        return lowered.as_text()
    compiled = lowered.compile()
    if code_type == "hlo":
        return compiled.as_text()
    return (f"compiled spgemm[{mtx_path}] {a.shape[0]}x{n}x{k} "
            f"nnz={int(np.count_nonzero(a))} strategy={kern.strategy} "
            f"into the persistent cache\n")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="xsmm_tpu.tools.generator",
                                description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gemm")
    g.add_argument("m", type=int)
    g.add_argument("n", type=int)
    g.add_argument("k", type=int)
    g.add_argument("--dtype", default="float32")
    g.add_argument("--batch", type=int, default=1)
    g.add_argument("--batch-reduce", action="store_true")
    g.add_argument("--code-type", default="compiled",
                   choices=["compiled", "hlo", "stablehlo"])
    g.add_argument("--out", default="")

    s = sub.add_parser("spgemm")
    s.add_argument("mtx")
    s.add_argument("n", type=int)
    s.add_argument("--dtype", default="float64")
    s.add_argument("--code-type", default="compiled",
                   choices=["compiled", "hlo", "stablehlo"])
    s.add_argument("--out", default="")

    args = p.parse_args(argv)
    if args.cmd == "gemm":
        text = generate_gemm(args.m, args.n, args.k, args.dtype, args.batch,
                             args.batch_reduce, args.code_type)
    else:
        text = generate_spgemm(args.mtx, args.n, args.dtype, args.code_type)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {len(text)} bytes to {args.out}")
    else:
        sys.stdout.write(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
