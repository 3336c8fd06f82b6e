#!/usr/bin/env python
"""HBM mixed-ratio streaming study (round 4, config #2 roofline audit).

Question: can v5e HBM overlap read and write streams ("duplex"), i.e. is
t = max(rd/bw_r, wr/bw_w) ever achievable, or is the bus shared and the
honest roofline t = (rd+wr)/bw_mix(ratio)?

Method: one Pallas kernel family parameterized by (rows_read, rows_written)
per column block — same streaming structure as the unrolled CSR spgemm
(grid over column blocks, whole-row panels in VMEM) but zero compute beyond
a row-group sum (so every input row is genuinely read and every output row
genuinely written).  Working sets >= 4x VMEM so nothing is resident
(perf_notes "VMEM residency").  probe="elem" (opaque custom call).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_hbm_duplex.py
"""

import json
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from xsmm_tpu.ops.pallas_util import pallas_call  # noqa: E402
from xsmm_tpu.utils.timer import device_bench  # noqa: E402

BN = 2048  # column block (8 lane units) — spgemm-like


def ratio_kernel(mr: int, mw: int):
    """Reads an [mr, BN] block, writes an [mw, BN] block per grid step."""
    if mr >= mw:
        g = mr // mw

        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:].reshape(g, mw, BN).sum(0)
    else:
        g = mw // mr

        def kernel(x_ref, o_ref):
            o_ref[:] = jnp.broadcast_to(
                x_ref[:][None], (g, mr, BN)).reshape(mw, BN)
    return kernel


def bench_ratio(mr: int, mw: int, n: int):
    x = jax.random.normal(jax.random.PRNGKey(0), (mr, n), jnp.float32)

    @jax.jit
    def run(x):
        return pallas_call(
            ratio_kernel(mr, mw),
            grid=(n // BN,),
            in_specs=[pl.BlockSpec((mr, BN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((mw, BN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mw, n), jnp.float32))(x)

    dt = device_bench(run, x, probe="elem")
    rd, wr = mr * n * 4, mw * n * 4
    agg = (rd + wr) / dt / 1e9
    return {"mr": mr, "mw": mw, "read_mb": rd >> 20, "write_mb": wr >> 20,
            "agg_gbps": round(agg, 1),
            "read_gbps": round(rd / dt / 1e9, 1),
            "write_gbps": round(wr / dt / 1e9, 1)}


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    # total working set ~600-770MB per case (>> 128MB VMEM); keep
    # (mr+mw)*BN*4 under ~8MB so Mosaic's double buffering fits the 16MB
    # scoped budget (the first run OOM'd at mr+mw=1152)
    cases = [
        ("read-only", 1024, 8, 131072),
        ("write-only", 8, 1024, 131072),
        ("1:1", 512, 512, 131072),
        ("2:1", 512, 256, 262144),
        ("4:1", 512, 128, 262144),
        ("1:2", 256, 512, 262144),
        ("1:4", 128, 512, 262144),
    ]
    # spgemm-like small row-blocks (~0.75-1.5MB/block): tests whether the
    # mixed-ratio ceiling depends on block depth (the r3 spgemm kernel
    # sustained 799-831 GB/s aggregate at 1:2 / 3:2 ratios where the 4MB
    # blocks above measure 660-713)
    cases += [
        ("1:1-small", 96, 96, 524288),
        ("1:2-small", 96, 192, 393216),
        ("2:1-small", 192, 96, 393216),
    ]
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    if only:
        cases = [c for c in cases if c[0] in only]
    out = []
    for name, mr, mw, n in cases:
        row = {"case": name, **bench_ratio(mr, mw, n)}
        print(json.dumps(row), flush=True)
        out.append(row)
    print("SUMMARY " + json.dumps(out))


if __name__ == "__main__":
    main()
