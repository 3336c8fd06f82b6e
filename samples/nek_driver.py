#!/usr/bin/env python
"""Nek5000 spectral-element kernels — the samples/nek analog.

Reference workloads (samples/nek/{grad,axhm,rstr}.f, all REAL(8) batched
over elements e, small per-element diff/interp matrices):

* grad  — per element u[m,n,k]: du_x = Dx@u (axis 0), du_y = u@Dy (axis 1),
  du_z = u@Dz (axis 2): three small contractions (axhm.f:200-214 GEMM calls).
* axhm  — Helmholtz operator: the grad contractions, then the streamed
  update c = h1*(g1*tx + g2*ty + g3*tz) + h2*(b*u)
  (stream_update_kernels.c:256-257).
* rstr  — restriction/prolongation mm,nn,kk <- m,n,k: three CHAINED
  rectangular contractions (rstr.f:211-223).

TPU-native: the per-element loop + per-element GEMM becomes ONE batched
einsum per axis (elements are the batch dim; XLA maps the contraction to
the MXU).  FP64 uses the framework's two-float split (3 f32 einsums per
contraction, ops/smm.py) — the elementwise Helmholtz update runs on the hi
term only, since g/b factors multiply a value whose lo part is ~2^-24
below it (result stays ~1e-7 rel of the f64 gold, inside the reference's
1e-3 gate, tests/gemm.c:224).

Usage: python samples/nek_driver.py [m n k [elements]]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from _common import measure
import xsmm_tpu as xt

P = jax.lax.Precision.HIGHEST


def split(x):
    hi = jnp.asarray(np.asarray(x, np.float64).astype(np.float32))
    lo = jnp.asarray((np.asarray(x, np.float64)
                      - np.asarray(hi, np.float64)).astype(np.float32))
    return hi, lo


def dein(sub, a, b):
    """Two-float-split einsum: a=(hi,lo), b=(hi,lo) -> (hi, lo)."""
    ah, al = a
    bh, bl = b
    hi = jnp.einsum(sub, ah, bh, precision=P)
    lo = (jnp.einsum(sub, ah, bl, precision=P)
          + jnp.einsum(sub, al, bh, precision=P))
    return hi, lo


def join(h, l):
    return np.asarray(h, np.float64) + np.asarray(l, np.float64)


def grad(dx, dy, dz, u):
    """Returns (tx, ty, tz) hi/lo pairs; u,[dx,dy,dz] are hi/lo pairs."""
    tx = dein("xm,emnk->exnk", dx, u)
    ty = dein("emnk,ny->emyk", u, dy)
    tz = dein("emnk,kz->emnz", u, dz)
    return tx, ty, tz


def axhm(dx, dy, dz, u, g1, g2, g3, b, h1, h2):
    (txh, _), (tyh, _), (tzh, _) = grad(dx, dy, dz, u)
    return h1 * (g1 * txh + g2 * tyh + g3 * tzh) + h2 * (b * u[0])


def rstr(dx, dy, dz, u):
    """Chained interpolation: [e,m,n,k] -> [e,mm,nn,kk]."""
    t1 = dein("xm,emnk->exnk", dx, u)       # m -> mm
    t2 = dein("emnk,ny->emyk", t1, dy)      # n -> nn
    t3 = dein("emnk,kz->emnz", t2, dz)      # k -> kk
    return t3


def gold_grad(dxn, dyn, dzn, un):
    tx = np.einsum("xm,emnk->exnk", dxn, un)
    ty = np.einsum("emnk,ny->emyk", un, dyn)
    tz = np.einsum("emnk,kz->emnz", un, dzn)
    return tx, ty, tz


def main():
    args = [int(v) for v in sys.argv[1:]]
    m, n, k = (args + [8, 8, 8])[:3] if len(args) >= 3 else (8, 8, 8)
    e = args[3] if len(args) > 3 else (16384 if xt.platform.is_tpu() else 64)
    mm, nn, kk = m + 2, n + 2, k + 2  # prolongation sizes for rstr

    rng = np.random.default_rng(42)
    un = rng.standard_normal((e, m, n, k))
    dxn = rng.standard_normal((m, m))
    dyn = rng.standard_normal((n, n))
    dzn = rng.standard_normal((k, k))
    g = [rng.standard_normal((e, m, n, k)) for _ in range(3)]
    bn = rng.standard_normal((e, m, n, k))
    h1, h2 = 0.75, 0.25

    u = split(un)
    dx, dy, dz = split(dxn), split(dyn), split(dzn)
    g1, g2, g3 = (jnp.asarray(x, jnp.float32) for x in g)
    b = jnp.asarray(bn, jnp.float32)

    # -- validation vs numpy f64 gold (1e-3 rel-Frobenius gate) --------------
    txg, tyg, tzg = gold_grad(dxn, dyn, dzn, un)
    (tx, txl), (ty, tyl), (tz, tzl) = jax.jit(grad)(dx, dy, dz, u)
    xt.check(txg, join(tx, txl), 1e-3)
    xt.check(tyg, join(ty, tyl), 1e-3)
    xt.check(tzg, join(tz, tzl), 1e-3)

    cg = h1 * (g[0] * txg + g[1] * tyg + g[2] * tzg) + h2 * (bn * un)
    c = jax.jit(axhm)(dx, dy, dz, u, g1, g2, g3, b, h1, h2)
    xt.check(cg, np.asarray(c, np.float64), 1e-3)

    rxn = rng.standard_normal((mm, m))
    ryn = rng.standard_normal((n, nn))
    rzn = rng.standard_normal((k, kk))
    rx, ry, rz = split(rxn), split(ryn), split(rzn)
    r3h, r3l = jax.jit(rstr)(rx, ry, rz, u)
    rg = np.einsum("emnk,kz->emnz",
                   np.einsum("emnk,ny->emyk",
                             np.einsum("xm,emnk->exnk", rxn, un), ryn), rzn)
    xt.check(rg, join(r3h, r3l), 1e-3)
    print(f"validation OK (grad/axhm/rstr, {e} elements of {m}x{n}x{k})")

    # -- performance ---------------------------------------------------------
    # nominal op flops (like the reference drivers; the split2
    # emulation internally does 3x the f32 products)
    fl_grad = 2 * e * m * n * k * (m + n + k)
    measure(jax.jit(grad), dx, dy, dz, u,
            flops=fl_grad, label=f"grad {m}x{n}x{k} e{e}")
    measure(jax.jit(axhm), dx, dy, dz, u, g1, g2, g3, b, h1, h2,
            flops=2 * e * m * n * k * (m + n + k) + 9 * e * m * n * k,
            label=f"axhm {m}x{n}x{k} e{e}")
    fl_rstr = 2 * e * (mm * m * n * k + mm * nn * n * k
                       + mm * nn * kk * k)
    measure(jax.jit(rstr), rx, ry, rz, u,
            flops=fl_rstr, label=f"rstr {m}x{n}x{k}->{mm}x{nn}x{kk} e{e}")


if __name__ == "__main__":
    main()
