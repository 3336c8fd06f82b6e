#!/usr/bin/env python
"""Batched SMM benchmark sweep (samples/smm/dispatched.cpp analog).

Sweeps small shapes through the dispatch cache and prints GFLOPS per shape,
for f32 and f64 (two-float split). Usage:
  python samples/smm_bench.py [batch] [shape ...]   shapes like 23x23x23
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from _common import measure
import xsmm_tpu as xt


def main():
    args = sys.argv[1:]
    batch = int(args[0]) if args else (65536 if xt.platform.is_tpu() else 512)
    shapes = [tuple(int(v) for v in s.split("x")) for s in args[1:]] or \
        [(4, 4, 4), (13, 13, 13), (23, 23, 23), (32, 32, 32), (64, 64, 64)]

    key = jax.random.PRNGKey(0)
    for (m, n, k) in shapes:
        flops = 2 * m * n * k * batch
        nbytes = (m * k + k * n + m * n) * batch * 4
        kern = xt.smmdispatch(m, n, k, batch=batch, beta=0.0)
        if isinstance(kern, xt.BatchedSMM):
            # packed layouts: A m-leading [M,K,B], B k-leading [K,N,B]
            a = jax.random.normal(key, (m, k, batch), jnp.float32)
            b = jax.random.normal(key, (k, n, batch), jnp.float32)
            measure(kern._packed_fn, a, b, flops=flops, nbytes=nbytes,
                    label=f"f32 {m}x{n}x{k} b{batch}", probe="elem")
        else:
            a = jax.random.normal(key, (batch, m, k), jnp.float32)
            b = jax.random.normal(key, (batch, k, n), jnp.float32)
            measure(kern._fn, a, b, flops=flops, nbytes=nbytes,
                    label=f"f32/xla {m}x{n}x{k} b{batch}")

        kern64 = xt.dmmdispatch(m, n, k, batch=batch, beta=0.0)
        if isinstance(kern64, xt.BatchedSMM):
            ops = [jax.random.normal(jax.random.PRNGKey(i),
                                     (m, k, batch) if i < 2 else (k, n, batch),
                                     jnp.float32) * (1e-8 if i % 2 else 1.0)
                   for i in range(4)]
            measure(kern64._packed_fn, *ops, flops=flops, nbytes=2 * nbytes,
                    label=f"f64 {m}x{n}x{k} b{batch}", probe="elem")
        else:
            ops = [jax.random.normal(jax.random.PRNGKey(i),
                                     (batch, m, k) if i < 2 else (batch, k, n),
                                     jnp.float32) * (1e-8 if i % 2 else 1.0)
                   for i in range(4)]
            measure(kern64._fn_split2, *ops, flops=flops, nbytes=2 * nbytes,
                    label=f"f64/xla {m}x{n}x{k} b{batch}")


if __name__ == "__main__":
    main()
