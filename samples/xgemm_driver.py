#!/usr/bin/env python
"""Tiled big-GEMM driver (samples/xgemm analog, DeepBench-style sizes).

  python samples/xgemm_driver.py [m n k] [dtype]
"""

import sys

import jax
import jax.numpy as jnp

from _common import measure
import xsmm_tpu as xt
from xsmm_tpu.ops.tiled_gemm import TiledGemm

DEEPBENCH = [(1760, 128, 1760), (2048, 64, 2048), (2560, 64, 2560),
             (4096, 128, 4096)]


def main():
    a = sys.argv[1:]
    shapes = [(int(a[0]), int(a[1]), int(a[2]))] if len(a) >= 3 else \
        (DEEPBENCH if xt.platform.is_tpu() else [(256, 64, 256)])
    dtype = a[3] if len(a) > 3 else "bfloat16"
    key = jax.random.PRNGKey(0)
    for (m, n, k) in shapes:
        A = jax.random.normal(key, (m, k)).astype(jnp.dtype(dtype))
        B = jax.random.normal(key, (k, n)).astype(jnp.dtype(dtype))
        h = TiledGemm(m, n, k, in_dtype=dtype)
        measure(h._fn, A, B, flops=2 * m * n * k,
                label=f"xgemm {dtype} {m}x{n}x{k} "
                      f"(tiles {h.bm},{h.bn},{h.bk})", probe="elem")


if __name__ == "__main__":
    main()
