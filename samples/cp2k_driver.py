#!/usr/bin/env python
"""CP2K stacked small-GEMM reproducer (samples/cp2k/cp2k.cpp analog).

CP2K's DBCSR multiplies stacks of small blocks accumulating into C tiles —
the batch-reduce GEMM pattern: C += sum_i A_i @ B_i.
  python samples/cp2k_driver.py [m n k stack]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from _common import measure
import xsmm_tpu as xt


def main():
    a = sys.argv[1:]
    m, n, k = (int(a[0]), int(a[1]), int(a[2])) if len(a) >= 3 else (23, 23, 23)
    stack = int(a[3]) if len(a) > 3 else (16384 if xt.platform.is_tpu() else 256)

    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (stack, m, k), jnp.float32)
    B = jax.random.normal(key, (stack, k, n), jnp.float32)

    kern = xt.smmdispatch_reducebatch(m, n, k, beta=0.0)
    c = np.asarray(kern(A, B))
    gold = np.einsum("bmk,bkn->bmn", np.asarray(A, np.float64),
                     np.asarray(B, np.float64)).sum(axis=0)
    xt.check(gold, c, 1e-3, what="cp2k brgemm")

    flops = 2 * m * n * k * stack
    nbytes = (m * k + k * n) * stack * 4
    measure(kern._fn, A, B, flops=flops, nbytes=nbytes,
            label=f"brgemm {m}x{n}x{k} stack={stack}")


if __name__ == "__main__":
    main()
