#!/usr/bin/env python
"""Batched-SMM backend comparison (samples/magazine analog).

The reference's "magazine" sample (Parallel Universe #34) compares LIBXSMM
against Blaze/Eigen/BLAS on batched small GEMMs.  The TPU-native
equivalents to compare against are XLA's own batched-matmul lowerings:

  xsmm    - this framework's lane-packed VPU kernel (pre-packed hot path)
  einsum  - jnp.einsum('bmk,bkn->bmn') on standard layout
  vmap    - jax.vmap(jnp.matmul) on standard layout
  dot     - jax.lax.dot_general with a batch dimension

Measurement caveat (documentation/perf_notes.md): the XLA rows are
chained-loop numbers where XLA may fuse the probe reduction into the dot
epilogue and skip materializing outputs — they are upper bounds; the xsmm
row is an opaque custom call whose outputs are genuinely produced.
Composite XLA expressions over these dots behave erratically (a single add
of two batched-dot outputs measured 4x slower than the dots themselves).

Usage: python samples/magazine_driver.py [batch] [shape ...]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from _common import measure
import xsmm_tpu as xt

P = jax.lax.Precision.HIGHEST


def main():
    args = sys.argv[1:]
    nums = [a for a in args if a.isdigit()]
    batch = int(nums[0]) if nums else (65536 if xt.platform.is_tpu() else 256)
    shapes = [tuple(int(v) for v in s.split("x"))
              for s in args if "x" in s] or \
        [(5, 5, 5), (13, 13, 13), (23, 23, 23), (32, 32, 32)]

    key = jax.random.PRNGKey(0)
    for (m, n, k) in shapes:
        flops = 2 * m * n * k * batch
        a = jax.random.normal(key, (batch, m, k), jnp.float32)
        b = jax.random.normal(jax.random.PRNGKey(1), (batch, k, n),
                              jnp.float32)

        kern = xt.smmdispatch(m, n, k, batch=batch, beta=0.0)
        if isinstance(kern, xt.BatchedSMM):
            ap, bp = kern.pack_a(a), kern.pack_b(b)
            measure(kern._packed_fn, ap, bp, flops=flops,
                    label=f"{m}x{n}x{k} b{batch} xsmm  ", probe="elem")
        else:
            measure(kern._fn, a, b, flops=flops,
                    label=f"{m}x{n}x{k} b{batch} xsmm/xla")

        measure(jax.jit(lambda a, b: jnp.einsum(
            "bmk,bkn->bmn", a, b, precision=P)), a, b, flops=flops,
            label=f"{m}x{n}x{k} b{batch} einsum")
        measure(jax.jit(jax.vmap(
            lambda x, y: jnp.matmul(x, y, precision=P))), a, b, flops=flops,
            label=f"{m}x{n}x{k} b{batch} vmap  ")
        measure(jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))), precision=P)),
            a, b, flops=flops, label=f"{m}x{n}x{k} b{batch} dot   ")
        print()


if __name__ == "__main__":
    main()
