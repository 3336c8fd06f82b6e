#!/usr/bin/env python
"""Dispatch-latency microbenchmark — samples/utilities/dispatch analog.

  python samples/dispatch_driver.py [n_kernels] [iters]

"The dispatch path is the product" (libxsmm_main.c:1697-1732: TLS-cache
hit is a few ns, registry probe a CRC32 + SIMD key diff).  This driver
times the TPU registry's equivalents host-side (dispatch latency is a
host-side property — no chip involved):

  mru-hit    repeated dispatch of ONE descriptor (thread-local MRU front
             cache, the LIBXSMM_CACHE_MAXSIZE=4 TLS cache analog)
  table-hit  round-robin over more descriptors than the MRU holds, so
             every dispatch misses the MRU and probes the main table
             (native CRC32C index / Python dict)
  build      first-dispatch cost of a fresh descriptor (builder
             construction; XLA device compilation stays lazy and is NOT
             in the dispatch path — the analog of JIT'd-code reuse)
  stress     N distinct descriptors inserted back-to-back (registry
             scaling; reference registry is 131072 slots)

Prints one `DISPATCH {json}` line for bench_all capture.
"""

import json
import sys
import time

from _common import np  # noqa: F401  (path setup)
import xsmm_tpu as xt
from xsmm_tpu.core.registry import get_registry


def _time_loop(fn, iters):
    t0 = time.perf_counter_ns()
    for _ in range(iters):
        fn()
    return (time.perf_counter_ns() - t0) / iters


def main():
    a = sys.argv[1:]
    n_kernels = int(a[0]) if a else 4096
    iters = int(a[1]) if len(a) > 1 else 20000

    reg = get_registry()

    # mru-hit: one hot descriptor
    xt.smmdispatch(23, 23, 23, batch=64, beta=0.0)  # warm
    mru_ns = _time_loop(
        lambda: xt.smmdispatch(23, 23, 23, batch=64, beta=0.0), iters)

    # table-hit: 16 descriptors > cache_maxsize(4) round-robin
    shapes = [(8 + i, 8 + i, 8 + i) for i in range(16)]
    for m, n, k in shapes:
        xt.smmdispatch(m, n, k, batch=64, beta=0.0)  # warm/inserted
    idx = [0]

    def probe():
        m, n, k = shapes[idx[0] & 15]
        idx[0] += 1
        xt.smmdispatch(m, n, k, batch=64, beta=0.0)

    table_ns = _time_loop(probe, iters)

    # build: fresh descriptors, builder runs (no device compile)
    t0 = time.perf_counter_ns()
    n_build = 256
    for i in range(n_build):
        xt.smmdispatch(100 + i, 7, 7, batch=32, beta=0.0)
    build_us = (time.perf_counter_ns() - t0) / n_build / 1e3

    # stress: n_kernels distinct inserts
    t0 = time.perf_counter_ns()
    for i in range(n_kernels):
        xt.smmdispatch(3 + (i % 61), 3 + ((i // 61) % 61),
                       5 + (i // 3721), batch=16, beta=0.0)
    stress_s = (time.perf_counter_ns() - t0) / 1e9
    info = reg.info()

    doc = {
        "mru_hit_ns": round(mru_ns, 1),
        "table_hit_ns": round(table_ns, 1),
        "build_us": round(build_us, 1),
        "stress_kernels": n_kernels,
        "stress_us_per_insert": round(stress_s / n_kernels * 1e6, 2),
        "registry_size": info.get("size", 0),
        "backend": "native" if reg._native is not None else "python",
    }
    print(f"dispatch mru-hit   : {doc['mru_hit_ns']:.0f} ns/call")
    print(f"dispatch table-hit : {doc['table_hit_ns']:.0f} ns/call")
    print(f"dispatch build     : {doc['build_us']:.1f} us/kernel")
    print(f"registry stress    : {n_kernels} kernels, "
          f"{doc['stress_us_per_insert']:.2f} us/insert "
          f"({doc['registry_size']} registered, {doc['backend']} index)")
    # per-kernel introspection (VERDICT r3 #9): the hottest entries, the
    # libxsmm_get_mmkernel_info / registry-walk analog
    hot = xt.registry_kernels()[:5]
    for rec in hot:
        print("kernel {name}: {m}x{n}x{k} {dtype} batch={batch} "
              "hits={hits} ~{nbytes_est}B".format(**rec))
    doc["hottest"] = [{k: rec[k] for k in
                       ("name", "m", "n", "k", "dtype", "hits")}
                      for rec in hot]
    print("DISPATCH " + json.dumps(doc))


if __name__ == "__main__":
    main()
