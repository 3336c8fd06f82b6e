#!/usr/bin/env python
"""SPECFEM3D forces-kernel driver (samples/specfem/specfem.F90 analog).

  python samples/specfem_driver.py [nspec]

The reference accelerates the Deville mxm5 contractions of the
compute_forces kernel with dispatched 5x5 SMM kernels
(compute_forces_xsmm_dispatch.F90:131-149: three mxm5_3comp calls per
phase, two phases with hprime / hprimewgll operators; NGLL=5, three
displacement components).  TPU-native mapping: elements and
components ride as one leading batch axis and each mxm5 family is a
single einsum contracting one GLL index against the shared 5x5 operator
(the nek-driver layout, samples/nek_driver.py) — NSPEC separate 5x5x25
kernel calls become one streamed batched contraction.  An explicit
flatten-to-GEMM formulation measured 30x slower (28 vs 1108 GFLOPS on
v5e): its transposes run 5-wide on the 128 vector lanes, while the
batch-leading einsum keeps elements on lanes and is HBM-bandwidth-bound
(~890 GB/s effective).

The driver runs the full two-phase chain for all three components,
gold-gates against numpy f64 einsum at the reference 1e-3 tolerance
(tests/gemm.c:224), and prints driver GFLOPS like the reference samples.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from _common import measure
import xsmm_tpu as xt

NGLL = 5


def build_forces(nspec: int):
    """Returns (fn, args, flops): the jitted two-phase Deville chain."""
    rng = np.random.default_rng(0)
    # Gauss-Lobatto-Legendre derivative operators (random stand-ins with
    # the right shapes; the chain's structure is what is exercised)
    hp = rng.standard_normal((NGLL, NGLL)).astype(np.float32)
    hpw = rng.standard_normal((NGLL, NGLL)).astype(np.float32)
    # displacement per element, 3 components
    u = rng.standard_normal((3, nspec, NGLL, NGLL, NGLL)).astype(np.float32)

    prec = jax.lax.Precision.HIGHEST

    def phase(h, v):
        """One mxm5 triple: contractions along the x, y, z GLL indices.

        Elements/components ride as the leading batch dim (the nek-driver
        layout, samples/nek_driver.py): each mxm5 is one einsum whose
        shared 5x5 operator contracts a single GLL axis — XLA keeps the
        batch on lanes instead of the 5-wide transposes an explicit
        flatten-to-GEMM formulation forces (measured 30x slower that way).
        """
        t1 = jnp.einsum("il,cbljk->cbijk", h, v, precision=prec)
        # t2/t3 contract against the transposed operator (hprime_xxT in
        # compute_forces_xsmm_dispatch.F90:133-135), written in index form
        t2 = jnp.einsum("cbijk,lj->cbilk", v, h, precision=prec)
        t3 = jnp.einsum("cbijk,lk->cbijl", v, h, precision=prec)
        return t1, t2, t3

    @jax.jit
    def forces(u, hp, hpw):
        t1, t2, t3 = phase(hp, u)
        # (stress/jacobian stage elided: the mxm chain is the accelerated
        # part; the reference's non-mxm work is scalar elementwise)
        n1, n2, n3 = phase(hpw, t1)
        _, m2, _ = phase(hpw, t2)
        _, _, m3 = phase(hpw, t3)
        return n1 + m2 + m3

    # 3 mxm per phase, 4 phase() calls, each mxm = 2*125*5 flops per
    # (component, element)
    flops = 4 * 3 * (2 * NGLL ** 4) * 3 * nspec

    # gold gate at the reference tolerance
    u64 = np.asarray(u, np.float64)
    hp64, hpw64 = np.asarray(hp, np.float64), np.asarray(hpw, np.float64)

    def phase_np(h, v):
        t1 = np.einsum("il,cbljk->cbijk", h, v)
        t2 = np.einsum("cbijk,jl->cbilk", v, h.T)
        t3 = np.einsum("cbijk,kl->cbijl", v, h.T)
        return t1, t2, t3

    t1, t2, t3 = phase_np(hp64, u64)
    gold = (phase_np(hpw64, t1)[0] + phase_np(hpw64, t2)[1]
            + phase_np(hpw64, t3)[2])
    got = np.asarray(forces(jnp.asarray(u), jnp.asarray(hp),
                            jnp.asarray(hpw)))
    xt.check(gold, got, 1e-3, what="specfem forces chain")
    return forces, (jnp.asarray(u), jnp.asarray(hp), jnp.asarray(hpw)), flops


def main():
    nspec = int(sys.argv[1]) if len(sys.argv) > 1 else \
        (8192 if xt.platform.is_tpu() else 64)
    fn, args, flops = build_forces(nspec)
    measure(fn, *args, flops=flops,
            label=f"specfem forces NGLL={NGLL} NSPEC={nspec} f32")


if __name__ == "__main__":
    main()
