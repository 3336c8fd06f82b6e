#!/usr/bin/env python
"""PyFR/SeisSol-style sparse operator driver (pyfr_driver_asp_reg.c analog).

  python samples/pyfr_driver.py <mats...|synthetic> [n_cols]

Reads .mtx operator matrices (or generates PyFR-like synthetic operators),
builds the f64 CSR kernel (trace-unrolled when small, dense-MXU otherwise),
validates against numpy f64 gold at the 1e-3 gate, and prints GFLOPS + nnz/s.
"""

import glob
import os
import sys

import jax.numpy as jnp
import numpy as np

from _common import measure
import xsmm_tpu as xt
from xsmm_tpu.ops import spgemm


def synthetic_ops():
    """Shapes modeled on PyFR p-order operator matrices."""
    rng = np.random.default_rng(0)
    specs = [(105, 75, 0.11), (75, 105, 0.08), (150, 150, 0.05)]
    for i, (m, k, dens) in enumerate(specs):
        a = np.where(rng.random((m, k)) < dens,
                     rng.standard_normal((m, k)), 0.0)
        yield f"synthetic_{i}_{m}x{k}", a


def main():
    args = sys.argv[1:]
    n = int(args[-1]) if args and args[-1].isdigit() else \
        (65536 if xt.platform.is_tpu() else 2048)
    paths = [p for p in args if not p.isdigit()]
    mats = []
    for p in paths:
        for f in (glob.glob(p) or [p]):
            if f != "synthetic":
                mats.append((f, xt.read_mtx(f)))
    if not mats:
        # default to the reference's own operator matrices when present
        # (its canonical run is pyfr_driver_asp_reg mats/p3/hex/m6-sp.mtx,
        # samples/pyfr/test.sh); fall back to synthetic operators
        ref_mats = [
            "/root/reference/samples/pyfr/mats/p3/hex/m6-sp.mtx",
            "/root/reference/samples/pyfr/mats/p3/hex/m3-sp.mtx",
            "/root/reference/samples/pyfr/mats/p2/hex/m6-sp.mtx",
        ]
        for f in ref_mats:
            if os.path.exists(f):
                mats.append((os.path.basename(os.path.dirname(
                    os.path.dirname(f))) + "/" + os.path.basename(f),
                    xt.read_mtx(f)))
    if not mats:
        mats = list(synthetic_ops())

    for name, a in mats:
        m, k = a.shape
        nnz = int(np.count_nonzero(a))
        rng = np.random.default_rng(1)
        b = rng.standard_normal((k, n))
        kern = spgemm.create_csr_soa(a, n, dtype="float64")
        c = kern(b)
        info = xt.matdiff(a @ b, c)
        assert info.normf_rel < 1e-3, (name, info.normf_rel)
        bh = jnp.asarray(b.astype(np.float32))
        bl = jnp.asarray((b - np.asarray(bh, np.float64)).astype(np.float32))
        dt = measure(kern._fn, bh, bl, flops=2 * nnz * n,
                     nbytes=(k + m) * n * 8,
                     label=f"{name} nnz={nnz} [{kern.strategy}]",
                     probe="elem" if kern.strategy == "unroll" else "sum")
        print(f"  nnz/s = {nnz * n / dt / 1e9:.1f} G, err={info.normf_rel:.1e}")


if __name__ == "__main__":
    main()
