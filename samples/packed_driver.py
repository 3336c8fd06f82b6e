#!/usr/bin/env python
"""Packed batched LA driver (samples/packed analogs): pgemm/getrf/trsm/trmm.

  python samples/packed_driver.py [m] [batch]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from _common import measure
import xsmm_tpu as xt
from xsmm_tpu.ops import packed


def main():
    a = sys.argv[1:]
    m = int(a[0]) if a else 16
    batch = int(a[1]) if len(a) > 1 else (8192 if xt.platform.is_tpu() else 256)

    rng = np.random.default_rng(0)
    A = rng.standard_normal((batch, m, m)).astype(np.float32)
    for i in range(m):
        A[:, i, i] += m
    B = rng.standard_normal((batch, m, m)).astype(np.float32)

    # pgemm
    kern = packed.pgemm_dispatch(m, m, m, batch=batch)
    Aj, Bj = jnp.asarray(A), jnp.asarray(B)
    if isinstance(kern, xt.BatchedSMM):
        measure(kern._packed_fn, kern.pack_a(Aj), kern.pack_b(Bj),
                flops=2 * m ** 3 * batch, label=f"pgemm {m}^3 b{batch}",
                probe="elem")
    # getrf
    kg = packed.getrf_dispatch(m, m, batch=batch)
    lu = np.asarray(kg(A), np.float64)
    l = np.tril(lu, -1) + np.eye(m)
    xt.check(A, l @ np.triu(lu), 1e-3, what="getrf")
    ap = jnp.asarray(np.transpose(A, (1, 2, 0)).copy())
    dt = measure(kg._packed_fn, ap, flops=int(2 / 3 * m ** 3) * batch,
                 label=f"getrf {m}x{m} b{batch}", probe="elem")
    if xt.platform.is_tpu():
        # VPU schedule models of the unrolled slice kernel: per pivot k the
        # trailing update touches (M-k-1) outer rows x ceil((N-k-1)/8)
        # sublane-regs x bt/128 lane-regs.  Two bounds (perf_notes.md "getrf
        # schedule"): ALU-only (2 ops: mul+sub) and ALU+mem (adds the
        # VMEM ld/st of the RMW, which at 2 ALU : 2 mem per vreg cannot
        # hide behind compute the way the SMM's 8:2 ratio does).  The
        # kernel lands between them (nearer the mem-aware bound).
        bt = kg.bt
        lane_regs = bt // 128
        alu = mem = 0
        for k in range(m - 1):
            r_k = m - k - 1
            s_k = -(-(m - k - 1) // 8)
            alu += 2 * r_k * s_k * lane_regs          # trailing mul+sub
            mem += 2 * r_k * s_k * lane_regs          # trailing ld+st
            alu += 2 * r_k * lane_regs                # l mul + broadcast
            mem += 2 * r_k * lane_regs                # l ld+st
        f = int(2 / 3 * m ** 3) * batch / 1e9
        alu_s = alu / 4.0 / 0.94e9 * (batch / bt)
        mem_s = (alu + mem) / 4.0 / 0.94e9 * (batch / bt)
        print(f"getrf VPU models: ALU-only {f / alu_s:.1f} GF "
              f"({100 * alu_s / dt:.0f}% achieved), ALU+mem "
              f"{f / mem_s:.1f} GF ({100 * mem_s / dt:.0f}% achieved)")
    # trsm
    kt = packed.trsm_dispatch(m, m, batch=batch)
    x = np.asarray(kt(A, B), np.float64)
    xt.check(B, np.tril(A.astype(np.float64)) @ x, 1e-3, what="trsm")
    measure(kt._fn, Aj, Bj, flops=m ** 3 * batch,
            label=f"trsm L {m}x{m} b{batch}", probe="elem")
    # trmm — lane-packed BatchedSMM on the pack-time-masked triangle;
    # useful flops = the triangle's m^2*n MACs (half the dense product)
    km = packed.trmm_dispatch(m, m, batch=batch)
    c = np.asarray(km(A, B), np.float64)
    xt.check(np.tril(A.astype(np.float64)) @ B, c, 1e-3, what="trmm")
    if isinstance(km._smm, xt.BatchedSMM):
        s = km._smm
        am = km._mask(Aj, jnp.float32(1.0))
        measure(s._packed_fn, s.pack_a(am), s.pack_b(Bj),
                flops=m ** 3 * batch, label=f"trmm L {m}x{m} b{batch}",
                probe="elem")
    else:
        measure(lambda a_, b_: km._smm._fn(
            km._mask(a_, jnp.float32(1.0)), b_), Aj, Bj,
            flops=m ** 3 * batch, label=f"trmm L {m}x{m} b{batch} (xla)")


if __name__ == "__main__":
    main()
