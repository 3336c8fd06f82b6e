"""Sparse kernel tests (reference: samples/pyfr, samples/edge, spmdm tests).

Validation pattern: sparse kernel result vs dense numpy f64 gold, gated at
the 1e-3 rel-Frobenius tolerance on PyFR/SeisSol-style operator matrices.
"""

import os
import tempfile

import numpy as np
import pytest

import xsmm_tpu as xt
from xsmm_tpu.ops import fsspmdm, spgemm, spmdm
from xsmm_tpu.utils.mtx import Csc, Csr, read_mtx, write_mtx


def make_operator(rng, m, k, density=0.1):
    """PyFR-style operator matrix: structured sparsity, f64 values."""
    a = rng.standard_normal((m, k))
    mask = rng.random((m, k)) < density
    return np.where(mask, a, 0.0)


# ---------------------------------------------------------------- mtx io ----

def test_mtx_roundtrip(rng):
    a = make_operator(rng, 17, 23, 0.2)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.mtx")
        write_mtx(p, a)
        b = read_mtx(p)
    assert np.allclose(a, b)


def test_csr_from_dense_roundtrip(rng):
    a = make_operator(rng, 11, 13, 0.3)
    csr = Csr.from_dense(a)
    assert csr.nnz == np.count_nonzero(a)
    assert np.array_equal(csr.toarray(), a)


def test_csc_roundtrip(rng):
    a = make_operator(rng, 9, 12, 0.25)
    assert np.array_equal(Csc.from_dense(a).toarray(), a)


def test_structure_digest_distinguishes(rng):
    a = make_operator(rng, 8, 8, 0.4)
    b = a.copy()
    b[b != 0] *= 1.0000001  # same structure, different values
    assert Csr.from_dense(a).structure_digest() != \
        Csr.from_dense(b).structure_digest()


# ------------------------------------------------------------- spgemm -------

@pytest.mark.parametrize("strategy", ["unroll", "dense"])
def test_csr_asparse_f32(rng, strategy):
    m, k, n = 24, 32, 256
    a = make_operator(rng, m, k, 0.15).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    kern = spgemm.create_csr_soa(a, n, dtype="float32", strategy=strategy)
    c = np.asarray(kern(b))
    gold = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    xt.check(gold, c, 1e-3, what=f"csr_asparse f32 {strategy}")


@pytest.mark.parametrize("strategy", ["unroll", "dense"])
def test_csr_asparse_f64(rng, strategy):
    m, k, n = 16, 20, 128
    a = make_operator(rng, m, k, 0.2)
    b = rng.standard_normal((k, n))
    kern = spgemm.create_dcsr_reg(a, n, strategy=strategy)
    c = kern(b)
    info = xt.matdiff(a @ b, c)
    assert info.normf_rel < 1e-5, (strategy, info.normf_rel)


@pytest.mark.parametrize("sched", sorted(spgemm.F64_SCHEDULES))
def test_csr_f64_schedules(rng, sched):
    """All four f64 stream schedules (B-lo read / C-lo write independently
    dropped) land ~1e-7 — the hi accumulator's f32 rounding dominates, same
    analysis as the batched-SMM split2_fast study (perf_notes)."""
    m, k, n = 16, 20, 128
    a = make_operator(rng, m, k, 0.2)
    b = rng.standard_normal((k, n))
    kern = spgemm.create_dcsr_reg(a, n, f64_schedule=sched)
    info = xt.matdiff(a @ b, kern(b))
    assert info.normf_rel < 1e-5, (sched, info.normf_rel)
    rd, wr = kern.stream_bytes
    assert rd == k * n * 4 * (2 if kern.b_lo else 1)
    assert wr == m * n * 4 * (2 if kern.c_lo else 1)


@pytest.mark.parametrize("strategy", ["unroll", "dense"])
def test_csr_accumulate_f32(rng, strategy):
    """beta=1 form: C += A@B fused into the kernel via in/out aliasing
    (the ring-SpMM step; reference beta=1 GEMM flag analog)."""
    import jax.numpy as jnp
    m, k, n = 16, 12, 200
    a = make_operator(rng, m, k, 0.25).astype(np.float32)
    a[5, :] = 0.0  # empty row must pass prior C through
    b = rng.standard_normal((k, n)).astype(np.float32)
    c0 = rng.standard_normal((m, n)).astype(np.float32)
    kern = spgemm.create_csr_soa(a, n, strategy=strategy)
    got = np.asarray(kern.acc_fn(jnp.asarray(c0), jnp.asarray(b)))
    gold = c0.astype(np.float64) + a.astype(np.float64) @ b.astype(np.float64)
    xt.check(gold, got, 1e-3, what=f"csr acc {strategy}")


@pytest.mark.parametrize("sched", ["split2", "fold"])
def test_csr_accumulate_f64(rng, sched):
    import jax.numpy as jnp
    m, k, n = 12, 16, 128
    a = make_operator(rng, m, k, 0.25)
    b = rng.standard_normal((k, n))
    c0 = rng.standard_normal((m, n)).astype(np.float32)
    kern = spgemm.create_dcsr_reg(a, n, f64_schedule=sched)
    bh = jnp.asarray(b, jnp.float32)
    bs = [bh] + ([jnp.asarray(b - np.asarray(bh, np.float64), jnp.float32)]
                 if kern.b_lo else [])
    if kern.c_lo:
        oh, ol = kern.acc_fn(jnp.asarray(c0), jnp.zeros((m, n), jnp.float32),
                             *bs)
        got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
    else:
        got = np.asarray(kern.acc_fn(jnp.asarray(c0), *bs), np.float64)
    gold = c0.astype(np.float64) + a @ b
    info = xt.matdiff(gold, got)
    assert info.normf_rel < 1e-5, (sched, info.normf_rel)


def test_csr_empty_rows(rng):
    a = make_operator(rng, 8, 8, 0.3).astype(np.float32)
    a[3, :] = 0.0  # fully empty row
    b = rng.standard_normal((8, 128)).astype(np.float32)
    kern = spgemm.create_csr_soa(a, 128, strategy="unroll")
    c = np.asarray(kern(b))
    assert not c[3].any()
    xt.check(np.asarray(a, np.float64) @ np.asarray(b, np.float64), c, 1e-3)


def test_csr_unpadded_n(rng):
    """N not a multiple of the 1024 SOA tile."""
    m, k, n = 12, 16, 300
    a = make_operator(rng, m, k, 0.25).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    kern = spgemm.create_csr_soa(a, n, strategy="unroll")
    xt.check(np.asarray(a, np.float64) @ np.asarray(b, np.float64),
             np.asarray(kern(b)), 1e-3)


def test_csc_bsparse(rng):
    m, k, n = 64, 20, 24
    a = rng.standard_normal((m, k)).astype(np.float32)
    bsp = make_operator(rng, k, n, 0.2).astype(np.float32)
    kern = spgemm.create_csc_soa(bsp, m, strategy="unroll")
    c = np.asarray(kern(a))
    xt.check(np.asarray(a, np.float64) @ np.asarray(bsp, np.float64), c, 1e-3)


def test_spgemm_cached(rng):
    a = make_operator(rng, 8, 8, 0.3)
    k1 = spgemm.create_csr_soa(a, 64)
    k2 = spgemm.create_csr_soa(a, 64)
    assert k1 is k2
    # different values -> different kernel (values are baked in)
    a2 = a * 2.0
    assert spgemm.create_csr_soa(a2, 64) is not k1


def test_auto_strategy_thresholds(rng):
    small = make_operator(rng, 8, 8, 0.5)
    kern = spgemm.create_csr_soa(small, 64, strategy="auto")
    assert kern.strategy == "unroll"


# ------------------------------------------------------------ fsspmdm -------

def test_fsspmdm_f64(rng):
    m, k, n = 15, 21, 96
    a = make_operator(rng, m, k, 0.3)
    h = fsspmdm.dfsspmdm_create(m, n, k, a)
    b = rng.standard_normal((k, n))
    c = h.execute(b)
    assert xt.matdiff(a @ b, c).normf_rel < 1e-5


def test_fsspmdm_f32(rng):
    m, k, n = 10, 12, 64
    a = make_operator(rng, m, k, 0.4).astype(np.float32)
    h = fsspmdm.sfsspmdm_create(m, n, k, a)
    b = rng.standard_normal((k, n)).astype(np.float32)
    xt.check(np.asarray(a, np.float64) @ np.asarray(b, np.float64),
             np.asarray(h(b)), 1e-3)


# -------------------------------------------------------------- spmdm -------

@pytest.mark.parametrize("strategy", ["dense", "ell"])
def test_spmdm_dynamic(rng, strategy):
    m, k, n = 32, 48, 64
    h = spmdm.spmdm_init(m, n, k, strategy=strategy)
    b = rng.standard_normal((k, n)).astype(np.float32)
    for trial in range(2):  # dynamic: different structure every call
        a = make_operator(rng, m, k, 0.2 + 0.1 * trial).astype(np.float32)
        sl = h.create_sparse_slice(a)
        assert sl.nnz == np.count_nonzero(a)
        c = np.asarray(h.compute(sl, b))
        xt.check(np.asarray(a, np.float64) @ np.asarray(b, np.float64),
                 c, 1e-3, what=f"spmdm {strategy} trial{trial}")


def test_spmdm_bf16(rng):
    import jax.numpy as jnp
    m, k, n = 16, 24, 32
    h = spmdm.spmdm_init(m, n, k, in_dtype="bfloat16")
    a = make_operator(rng, m, k, 0.3).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    c = np.asarray(h(a, b))
    ab = np.asarray(a.astype(jnp.bfloat16), np.float64)
    bb = np.asarray(b.astype(jnp.bfloat16), np.float64)
    xt.check(ab @ bb, c, 1e-2, what="spmdm bf16")


def test_spmdm_bf16_ell(rng):
    """bf16-input ELL path (libxsmm_spmdm_createSparseSlice_bfloat16_thread
    / _compute_bfloat16_thread, libxsmm_spmdm.h:98-127): A rounded to bf16
    at slice time, B bf16 through the gather, f32 accumulation.  Gold is
    the f64 product of the bf16-rounded inputs, so the gate checks the
    accumulate path, not the input rounding."""
    import jax.numpy as jnp
    m, k, n = 16, 24, 32
    h = spmdm.spmdm_init(m, n, k, in_dtype="bfloat16", strategy="ell")
    a = make_operator(rng, m, k, 0.2).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    sl = h.create_sparse_slice(a)
    assert sl.kind == "ell"
    ab = np.asarray(a.astype(jnp.bfloat16), np.float64)
    # ELL values must be exact f32 images of the bf16-rounded A
    assert sl.nnz == np.count_nonzero(ab)
    c = np.asarray(h.compute(sl, b))
    bb = np.asarray(b.astype(jnp.bfloat16), np.float64)
    xt.check(ab @ bb, c, 1e-3, what="spmdm bf16 ell")


@pytest.mark.parametrize("strategy", ["dense", "ell"])
@pytest.mark.parametrize("in_dtype", ["float32", "bfloat16"])
def test_spmdm_trans_beta_matrix(rng, strategy, in_dtype):
    """Full transa x transb x transc x beta matrix
    (libxsmm_spmdm_compute_*_thread signature, libxsmm_spmdm.h:106-127:
    transa at slice time + echoed at compute, transb/transc/beta at
    compute; beta in {0,1}, C always f32)."""
    import itertools
    import jax.numpy as jnp
    m, k, n = 16, 24, 32
    h = spmdm.spmdm_init(m, n, k, in_dtype=in_dtype, strategy=strategy)
    a = make_operator(rng, m, k, 0.2).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    c0 = rng.standard_normal((m, n)).astype(np.float32)
    if in_dtype == "bfloat16":
        ag = np.asarray(a.astype(jnp.bfloat16), np.float64)
        bg = np.asarray(b.astype(jnp.bfloat16), np.float64)
        tol = 1e-2
    else:
        ag, bg, tol = np.asarray(a, np.float64), np.asarray(b, np.float64), 1e-3
    for ta, tb, tc, beta in itertools.product(
            (False, True), (False, True), (False, True), (0, 1)):
        sl = h.create_sparse_slice(a.T if ta else a, transa=ta)
        gold = ag @ bg
        if tc:
            gold = gold.T
        if beta:
            gold = gold + np.asarray(c0.T if tc else c0, np.float64)
        out = h.compute(sl, b.T if tb else b, transa=ta, transb=tb,
                        transc=tc, beta=beta,
                        c=(c0.T if tc else c0) if beta else None)
        assert out.dtype == jnp.float32
        xt.check(gold, np.asarray(out), tol,
                 what=f"spmdm {strategy}/{in_dtype} "
                      f"ta={ta} tb={tb} tc={tc} beta={beta}")
    with pytest.raises(ValueError):  # mismatched transa echo
        h.compute(h.create_sparse_slice(a, transa=False), b, transa=True)
    with pytest.raises(ValueError):  # unsupported beta
        h.compute(h.create_sparse_slice(a), b, beta=0.5, c=c0)


def test_reference_pyfr_operator():
    """Validate on the reference's own canonical PyFR matrix when present
    (samples/pyfr/test.sh runs mats/p3/hex/m6-sp.mtx)."""
    import os
    import pytest
    path = "/root/reference/samples/pyfr/mats/p3/hex/m6-sp.mtx"
    if not os.path.exists(path):
        pytest.skip("reference matrices not mounted")
    a = xt.read_mtx(path)
    n = 1024
    rng = np.random.default_rng(3)
    b = rng.standard_normal((a.shape[1], n))
    kern = xt.create_dcsr_reg(a, n)
    xt.check(a @ b, kern(b), 1e-3, what="p3/hex/m6-sp reference operator")
