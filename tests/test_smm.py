"""SMM kernel correctness vs float64 gold (reference: tests/gemm.c).

The canonical pattern: compute with the dispatched kernel, compare against a
compiler/numpy gold GEMM with libxsmm_matdiff, gate at rel-Frobenius < 1e-3
(tests/gemm.c:219-248).  Shapes sweep the reference's sml/med buckets.
"""

import numpy as np
import pytest

import xsmm_tpu as xt

TOL = 1e-3
B = 8  # small batch: tests run in Pallas interpreter mode on CPU


def gold_bmm(a, b):
    return np.einsum("bmk,bkn->bmn", np.asarray(a, np.float64),
                     np.asarray(b, np.float64))


@pytest.mark.parametrize("m,n,k", [(1, 1, 1), (5, 3, 7), (13, 13, 13),
                                   (23, 23, 23), (16, 48, 8), (64, 64, 64)])
def test_batched_f32_shapes(rng, m, n, k):
    a = rng.standard_normal((B, m, k), dtype=np.float32)
    b = rng.standard_normal((B, k, n), dtype=np.float32)
    kern = xt.smmdispatch(m, n, k, batch=B, beta=0.0)
    c = np.asarray(kern(a, b))
    assert c.shape == (B, m, n)
    xt.check(gold_bmm(a, b), c, TOL, what=f"f32 {m}x{n}x{k}")


def test_beta_one_accumulates(rng):
    m = n = k = 13
    a = rng.standard_normal((B, m, k), dtype=np.float32)
    b = rng.standard_normal((B, k, n), dtype=np.float32)
    c0 = rng.standard_normal((B, m, n)).astype(np.float32)
    kern = xt.smmdispatch(m, n, k, batch=B, beta=1.0)
    c = np.asarray(kern(a, b, c0))
    xt.check(gold_bmm(a, b) + c0, c, TOL, what="beta=1")


def test_beta_one_requires_c(rng):
    kern = xt.smmdispatch(4, 4, 4, batch=B, beta=1.0)
    a = rng.standard_normal((B, 4, 4), dtype=np.float32)
    with pytest.raises(ValueError):
        kern(a, a)


def test_invalid_alpha_beta():
    with pytest.raises(ValueError):
        xt.smmdispatch(4, 4, 4, alpha=2.0)
    with pytest.raises(ValueError):
        xt.smmdispatch(4, 4, 4, beta=0.5)


@pytest.mark.parametrize("transa,transb", [("T", "N"), ("N", "T"), ("T", "T")])
def test_transposes(rng, transa, transb):
    m, n, k = 11, 7, 5
    a = rng.standard_normal((B, m, k), dtype=np.float32)
    b = rng.standard_normal((B, k, n), dtype=np.float32)
    at = np.swapaxes(a, 1, 2).copy() if transa == "T" else a
    bt = np.swapaxes(b, 1, 2).copy() if transb == "T" else b
    kern = xt.smmdispatch(m, n, k, batch=B, beta=0.0,
                          transa=transa, transb=transb)
    xt.check(gold_bmm(a, b), np.asarray(kern(at, bt)), TOL)


def test_f64_split2_accuracy(rng):
    """split2 must be orders of magnitude inside the 1e-3 gate."""
    m = n = k = 23
    a = rng.standard_normal((B, m, k))
    b = rng.standard_normal((B, k, n))
    prev = xt.get_config().f64_strategy
    try:
        xt.set_config(f64_strategy="split2")
        kern = xt.dmmdispatch(m, n, k, batch=B, beta=0.0)
        c = kern(a, b)
    finally:
        xt.set_config(f64_strategy=prev)
    assert c.dtype == np.float64
    info = xt.matdiff(gold_bmm(a, b), c)
    assert info.normf_rel < 1e-5, info.normf_rel


@pytest.mark.parametrize("strategy", ["split2", "split2_fast", "float32"])
def test_f64_strategy_accuracy(rng, strategy):
    """Every f64 schedule sits ~4 orders inside the 1e-3 gate (the f32
    hi-accumulator rounding bounds them all; see perf_notes.md)."""
    m = n = k = 23
    a = rng.standard_normal((B, m, k))
    b = rng.standard_normal((B, k, n))
    c0 = rng.standard_normal((B, m, n))
    prev = xt.get_config().f64_strategy
    try:
        xt.set_config(f64_strategy=strategy)
        kern = xt.dmmdispatch(m, n, k, batch=B, beta=0.0)
        c = kern(a, b)
        kern1 = xt.dmmdispatch(m, n, k, batch=B, beta=1.0)
        c1 = kern1(a, b, c0)
    finally:
        xt.set_config(f64_strategy=prev)
    assert c.dtype == np.float64
    gold = gold_bmm(a, b)
    assert xt.matdiff(gold, c).normf_rel < 1e-6
    assert xt.matdiff(gold + c0, c1).normf_rel < 1e-6


def test_f64_beta_one(rng):
    m = n = k = 13
    a = rng.standard_normal((B, m, k))
    b = rng.standard_normal((B, k, n))
    c0 = rng.standard_normal((B, m, n))
    kern = xt.dmmdispatch(m, n, k, batch=B, beta=1.0)
    xt.check(gold_bmm(a, b) + c0, kern(a, b, c0), 1e-5)


def test_bf16(rng):
    import jax.numpy as jnp
    m = n = k = 16
    a = rng.standard_normal((B, m, k), dtype=np.float32)
    b = rng.standard_normal((B, k, n), dtype=np.float32)
    ab, bb = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    kern = xt.bsmmdispatch(m, n, k, batch=B, beta=0.0)
    c = np.asarray(kern(ab, bb))
    assert c.dtype == np.float32
    gold = gold_bmm(np.asarray(ab, np.float64), np.asarray(bb, np.float64))
    xt.check(gold, c, 1e-6, what="bf16 inputs, f32 accumulate")


def test_i16_exact(rng):
    m = n = k = 9
    a = rng.integers(-100, 100, (B, m, k)).astype(np.int16)
    b = rng.integers(-100, 100, (B, k, n)).astype(np.int16)
    kern = xt.wimmdispatch(m, n, k, batch=B, beta=0.0)
    c = np.asarray(kern(a, b))
    assert c.dtype == np.int32
    gold = np.einsum("bmk,bkn->bmn", a.astype(np.int64),
                     b.astype(np.int64)).astype(np.int32)
    assert np.array_equal(c, gold)


def test_batch_reduce(rng):
    m, n, k = 14, 10, 6
    nb = 12
    a = rng.standard_normal((nb, m, k), dtype=np.float32)
    b = rng.standard_normal((nb, k, n), dtype=np.float32)
    kern = xt.smmdispatch_reducebatch(m, n, k, beta=0.0)
    c = np.asarray(kern(a, b))
    assert c.shape == (m, n)
    xt.check(gold_bmm(a, b).sum(axis=0), c, 1e-5)


def test_batch_reduce_beta1(rng):
    m = n = k = 8
    nb = 5
    a = rng.standard_normal((nb, m, k), dtype=np.float32)
    b = rng.standard_normal((nb, k, n), dtype=np.float32)
    c0 = rng.standard_normal((m, n)).astype(np.float32)
    kern = xt.smmdispatch_reducebatch(m, n, k, beta=1.0)
    xt.check(gold_bmm(a, b).sum(axis=0) + c0, np.asarray(kern(a, b, c0)), 1e-5)


def test_large_routes_to_xla(rng):
    """Beyond the threshold the dispatch returns the XLA/MXU path."""
    kern = xt.smmdispatch(256, 256, 256, batch=4, beta=0.0)
    assert isinstance(kern, xt.XlaGemm)
    a = rng.standard_normal((4, 256, 256), dtype=np.float32)
    b = rng.standard_normal((4, 256, 256), dtype=np.float32)
    xt.check(gold_bmm(a, b), np.asarray(kern(a, b)), TOL)


def test_single_matrix_gemm(rng):
    """batch=1 / 2-D operands (plain libxsmm_?mm analog)."""
    kern = xt.smmdispatch(32, 16, 8, beta=0.0)
    a = rng.standard_normal((32, 8), dtype=np.float32)
    b = rng.standard_normal((8, 16), dtype=np.float32)
    c = np.asarray(kern(a, b))
    gold = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    xt.check(gold, c, TOL)


def test_packed_path_matches_full(rng):
    m = n = k = 12
    a = rng.standard_normal((B, m, k), dtype=np.float32)
    b = rng.standard_normal((B, k, n), dtype=np.float32)
    kern = xt.smmdispatch(m, n, k, batch=B, beta=0.0)
    assert isinstance(kern, xt.BatchedSMM)
    cp = kern.packed(kern.pack_a(a), kern.pack_b(b))
    c2 = np.asarray(kern.unpack_c(cp, B))
    xt.check(gold_bmm(a, b), c2, TOL)


def test_dispatch_cached():
    k1 = xt.smmdispatch(6, 6, 6, batch=B, beta=0.0)
    k2 = xt.smmdispatch(6, 6, 6, batch=B, beta=0.0)
    assert k1 is k2


@pytest.mark.parametrize("strategy", ["split2", "split2_fast", "float32"])
def test_f64_xlagemm_strategies(rng, strategy):
    """Large f64 shapes route to XlaGemm (MXU); every strategy schedule
    must hold the gate there too, with and without the C operand."""
    m = n = k = 96  # beyond gemm_threshold at batch=1 path? force via threshold
    prev_s = xt.get_config().f64_strategy
    prev_t = xt.get_config().gemm_threshold
    try:
        xt.set_config(f64_strategy=strategy, gemm_threshold=8)
        kern = xt.dmmdispatch(m, n, k, batch=4, beta=0.0)
        from xsmm_tpu.ops.smm import XlaGemm
        assert isinstance(kern, XlaGemm)
        a = rng.standard_normal((4, m, k))
        b = rng.standard_normal((4, k, n))
        c = kern(a, b)
        assert c.dtype == np.float64
        xt.check(gold_bmm(a, b), c, 1e-6)
        kern1 = xt.dmmdispatch(m, n, k, batch=4, beta=1.0)
        c0 = rng.standard_normal((4, m, n))
        xt.check(gold_bmm(a, b) + c0, kern1(a, b, c0), 1e-6)
    finally:
        xt.set_config(f64_strategy=prev_s, gemm_threshold=prev_t)


@pytest.mark.parametrize("strategy", ["split2", "split2_fast", "float32"])
def test_f64_batch_reduce_strategies(rng, strategy):
    """The batch-reduce path honors the f64 schedule config too."""
    m, n, k = 14, 10, 6
    nb = 5
    a = rng.standard_normal((nb, m, k))
    b = rng.standard_normal((nb, k, n))
    prev = xt.get_config().f64_strategy
    try:
        xt.set_config(f64_strategy=strategy)
        kern = xt.dmmdispatch_reducebatch(m, n, k, beta=0.0)
        c = kern(a, b)
    finally:
        xt.set_config(f64_strategy=prev)
    assert c.dtype == np.float64
    xt.check(gold_bmm(a, b).sum(axis=0), c, 1e-6)


def test_f64_native_strategy(rng):
    """XSMM_F64=native must run a REAL f64 XLA matmul (ADVICE r2 medium:
    it silently degraded to hi-only f32).  With x64 enabled the result is
    exact to f64 matmul; without x64 it must raise, not degrade."""
    m = n = k = 23
    a = rng.standard_normal((B, m, k))
    b = rng.standard_normal((B, k, n))
    prev = xt.get_config().f64_strategy
    try:
        xt.set_config(f64_strategy="native")
        kern = xt.dmmdispatch(m, n, k, batch=B, beta=0.0)
        from xsmm_tpu.ops.smm import XlaGemm
        assert isinstance(kern, XlaGemm)  # no lane-packed f32 remap
        import jax
        if not jax.config.jax_enable_x64:
            with pytest.raises(RuntimeError, match="x64"):
                kern(a, b)
            jax.config.update("jax_enable_x64", True)
        try:
            c = kern(a, b)
            gold = np.matmul(a, b)
            # true f64 compute: ~1e-15 class, far below any split schedule
            err = np.linalg.norm(c - gold) / np.linalg.norm(gold)
            assert err < 1e-13, err
        finally:
            jax.config.update("jax_enable_x64", False)
    finally:
        xt.set_config(f64_strategy=prev)


def test_f64_batched_beta1_keeps_c_low_half(rng):
    """BatchedSMM beta=1 must re-add C's low f32 half host-side (ADVICE
    r2: split2_fast dropped it, truncating accumulate chains to f32)."""
    m = n = k = 8
    a = rng.standard_normal((B, m, k)) * 1e-8
    b = rng.standard_normal((B, k, n)) * 1e-8
    c0 = rng.standard_normal((B, m, n))  # |C| >> |A@B|: low half matters
    prev = xt.get_config().f64_strategy
    try:
        xt.set_config(f64_strategy="split2_fast")
        kern = xt.dmmdispatch(m, n, k, batch=B, beta=1.0)
        from xsmm_tpu.ops.smm import BatchedSMM
        assert isinstance(kern, BatchedSMM)
        c = kern(a, b, c0)
    finally:
        xt.set_config(f64_strategy=prev)
    gold = c0 + np.matmul(a, b)
    # C's f32-rounding error is ~6e-8 * |C|; keeping the low half must
    # leave the result at the A@B-rounding scale instead
    err = np.abs(c - gold).max()
    assert err < 1e-12, err
