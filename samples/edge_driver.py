#!/usr/bin/env python
"""SeisSol/EDGE earthquake-kernel driver (samples/edge, samples/seissol).

Reference workloads: sparse stiffness/flux operators x dense element data,
A-sparse CSR ("asparse_srsoa.c") and B-sparse CSC ("bsparse_scsoa.c") SOA
kernels on the EDGE matrices (samples/edge/mats/*.mtx).

  python samples/edge_driver.py [mtx ...] [n_cols]

Defaults to a representative set of the reference's tet4 operators when
mounted.  Validation: 1e-3 rel-Frobenius vs numpy f64 gold.
"""

import glob
import os
import sys

import numpy as np

from _common import measure
import xsmm_tpu as xt

REF = "/root/reference/samples/edge/mats"
DEFAULTS = [
    "tet4_5_stiffV_2_csr.mtx",
    "tet4_2_fluxL_3_csr.mtx",
    "tet4_4_fluxN_10_csc.mtx",
]


def main():
    args = sys.argv[1:]
    n = int(args[-1]) if args and args[-1].isdigit() else \
        (65536 if xt.platform.is_tpu() else 1024)
    paths = [p for p in args if not p.isdigit()]
    if not paths and os.path.isdir(REF):
        paths = [os.path.join(REF, f) for f in DEFAULTS
                 if os.path.exists(os.path.join(REF, f))]
    if not paths:
        print("no matrices found (pass .mtx paths)")
        return

    rng = np.random.default_rng(7)
    for p in paths:
        name = os.path.basename(p)
        a = xt.read_mtx(p)
        nnz = int(np.count_nonzero(a))
        if "csc" in name:
            # B-sparse: dense activations x sparse flux operator
            kern = xt.create_csc_soa(a, m=n, dtype="float64")
            x = rng.standard_normal((n, a.shape[0]))
            c = kern(x)
            gold = x @ a
            flops = 2 * nnz * n
        else:
            # A-sparse: sparse stiffness operator x dense element data
            kern = xt.create_dcsr_reg(a, n)
            x = rng.standard_normal((a.shape[1], n))
            c = kern(x)
            gold = a @ x
            flops = 2 * nnz * n
        info = xt.matdiff(gold, c)
        assert info.normf_rel < 1e-3, (name, info.normf_rel)
        inner = kern._inner if hasattr(kern, "_inner") else kern
        # time the compiled hot path on device-resident split operands
        xt_in = np.swapaxes(x, -1, -2) if "csc" in name else x
        bh, bl = xt.split_f64(xt_in)
        dt = measure(inner._fn, bh, bl, flops=flops,
                     label=f"{name} {a.shape[0]}x{a.shape[1]} nnz={nnz} "
                           f"[{inner.strategy}]",
                     probe="elem" if inner.strategy == "unroll" else "sum")
        print(f"  nnz/s = {nnz * n / dt / 1e9:.1f} G, err={info.normf_rel:.1e}")


if __name__ == "__main__":
    main()
