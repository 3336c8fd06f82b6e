#!/usr/bin/env python
"""Independent cross-check of the mixed-traffic wire ceiling (VERDICT r4
item #8): reproduce the Pallas wire kernel's ~640-670 GB/s aggregate
mixed-traffic cap with XLA-NATIVE elementwise chains — no Pallas anywhere
— so the config2 gate no longer rests solely on the author's own kernel.

Protocol: device_bench fori_loop chains where every written array is the
next iteration's input (the only way pure XLA guarantees the write: an
output consumed only by a probe gets strength-reduced away, perf_notes
"VMEM residency").  All arrays 1536x65536 f32 = 402.7MB — nothing
resident.  Compute is 1 add/element, far below the ~4 ops/element VPU
threshold: pure stream.

  1r:1w   x' = x + c                  806 MB/iter
  2r:1w   z  = x + y (x<-z, y fixed) 1209 MB/iter
  3r:1w   w  = x+y1+y2 (x<-w)        1612 MB/iter
  2r:2w   (a',b') = (a+b, a*c)       1612 MB/iter

Pallas wire reference on the same chip (perf_notes "HBM mixed-ratio
study"): ~640-670 GB/s aggregate at every ratio/stream count.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import xsmm_tpu as xt
from xsmm_tpu.utils.timer import device_bench

xt.enable_compile_cache()

M, N = 1536, 65536
MB = M * N * 4 / 1e6  # 402.7 MB per array


def arrs(n):
    return [jax.random.normal(jax.random.PRNGKey(i), (M, N), jnp.float32)
            for i in range(n)]


def run_case(name, fn, feedback, args, bytes_per_iter):
    dt, info = device_bench(fn, *args, feedback=feedback, probe="elem",
                            stats=True)
    return {"case": name, "mb_per_iter": round(bytes_per_iter / 1e6, 1),
            "aggregate_gbps": round(bytes_per_iter / dt / 1e9, 1),
            "spread": round(info["spread"], 3)}


def main():
    out = []
    c = jnp.float32(1.0000001)

    # 1r:1w
    x, = arrs(1)
    out.append(run_case(
        "xla_1r1w", jax.jit(lambda x: x * c),
        lambda o, a: (o,), (x,), 2 * M * N * 4))

    # 2r:1w
    x, y = arrs(2)
    out.append(run_case(
        "xla_2r1w", jax.jit(lambda x, y: x + y),
        lambda o, a: (o, a[1]), (x, y), 3 * M * N * 4))

    # 3r:1w
    x, y1, y2 = arrs(3)
    out.append(run_case(
        "xla_3r1w", jax.jit(lambda x, y1, y2: x + y1 + y2),
        lambda o, a: (o, a[1], a[2]), (x, y1, y2), 4 * M * N * 4))

    # 2r:2w
    a, b = arrs(2)
    out.append(run_case(
        "xla_2r2w", jax.jit(lambda a, b: (a + b, a * c)),
        lambda o, args_: o, (a, b), 4 * M * N * 4))

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
