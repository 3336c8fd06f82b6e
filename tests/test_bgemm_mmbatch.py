"""Blocked GEMM + mmbatch/interceptor tests."""

import jax.numpy as jnp
import numpy as np
import pytest

import xsmm_tpu as xt
from xsmm_tpu.ops.blocked_gemm import ORDERS, blocked_gemm_handle
from xsmm_tpu.ops import mmbatch as mb


def gold(a, b):
    return np.asarray(a, np.float64) @ np.asarray(b, np.float64)


def test_bgemm_exact_blocks(rng):
    h = blocked_gemm_handle(128, 128, 128, bm=32, bn=32, bk=32)
    a = rng.standard_normal((128, 128)).astype(np.float32)
    b = rng.standard_normal((128, 128)).astype(np.float32)
    xt.check(gold(a, b), np.asarray(h(a, b)), 1e-3)


def test_bgemm_ragged(rng):
    h = blocked_gemm_handle(100, 90, 75, bm=32, bn=32, bk=32)
    a = rng.standard_normal((100, 75)).astype(np.float32)
    b = rng.standard_normal((75, 90)).astype(np.float32)
    c = np.asarray(h(a, b))
    assert c.shape == (100, 90)
    xt.check(gold(a, b), c, 1e-3)


def test_bgemm_beta(rng):
    h = blocked_gemm_handle(64, 64, 64)
    a = rng.standard_normal((64, 64)).astype(np.float32)
    b = rng.standard_normal((64, 64)).astype(np.float32)
    c0 = rng.standard_normal((64, 64)).astype(np.float32)
    xt.check(gold(a, b) + c0, np.asarray(h(a, b, c0)), 1e-3)


def test_bgemm_blocked_layout_roundtrip(rng):
    h = blocked_gemm_handle(64, 48, 32, bm=16, bn=16, bk=16)
    c = rng.standard_normal((64, 48)).astype(np.float32)
    assert np.allclose(np.asarray(h.copyout_c(h.copyin_c(c))), c)


def test_bgemm_orders():
    for o in ORDERS:
        blocked_gemm_handle(32, 32, 32, order=o)
    with pytest.raises(AssertionError):
        blocked_gemm_handle(32, 32, 32, order="zzz")


def test_gemm_batch(rng):
    a = [rng.standard_normal((12, 8)).astype(np.float32) for _ in range(6)]
    b = [rng.standard_normal((8, 10)).astype(np.float32) for _ in range(6)]
    c = np.asarray(mb.gemm_batch(a, b))
    goldc = np.stack([gold(x, y) for x, y in zip(a, b)])
    xt.check(goldc, c, 1e-3)


def test_mmbatch_recording(rng):
    a = jnp.asarray(rng.standard_normal((4, 8, 8)).astype(np.float32))
    with mb.mmbatch_begin() as calls:
        _ = jnp.matmul(a, a)
        _ = jnp.matmul(a[0], a[0])
    assert len(calls) == 2
    assert calls[0].batch == 4 and calls[0].m == 8
    assert calls[1].batch == 1
    # patched function restored
    assert jnp.matmul.__name__ == "matmul"


def test_mmbatch_einsum_recording(rng):
    a = jnp.asarray(rng.standard_normal((4, 8, 8)).astype(np.float32))
    with mb.mmbatch_begin() as calls:
        c1 = jnp.einsum("bij,bjk->bik", a, a)   # recorded (batched matmul)
        c2 = jnp.einsum("ij,jk->ik", a[0], a[0])  # recorded (plain matmul)
        c3 = jnp.einsum("bij,bij->b", a, a)     # passes through unrecorded
    assert len(calls) == 2
    assert calls[0].batch == 4 and calls[0].m == 8 and calls[0].k == 8
    assert calls[1].batch == 1
    assert jnp.einsum.__name__ == "einsum"  # restored
    gold = np.einsum("bij,bjk->bik", np.asarray(a, np.float64),
                     np.asarray(a, np.float64))
    xt.check(gold, np.asarray(c1), 1e-3)
    xt.check(gold[0], np.asarray(c2), 1e-3)
    assert np.isfinite(np.asarray(c3)).all()


def test_mmbatch_reroute(rng):
    a = jnp.asarray(rng.standard_normal((4, 8, 8)).astype(np.float32))
    with mb.mmbatch_begin(record_only=False) as calls:
        c = jnp.matmul(a, a)
    goldc = np.einsum("bij,bjk->bik", np.asarray(a, np.float64),
                      np.asarray(a, np.float64))
    xt.check(goldc, np.asarray(c), 1e-3)
    assert calls


def test_mmbatch_nested_scope_raises():
    """Nested interception scopes must raise, not deadlock (ADVICE r2)."""
    with mb.mmbatch_begin():
        with pytest.raises(RuntimeError, match="nest"):
            with mb.mmbatch_begin():
                pass
    # flag cleared: a fresh scope works again
    with mb.mmbatch_begin() as calls:
        jnp.matmul(jnp.ones((2, 3, 4), jnp.float32),
                   jnp.ones((2, 4, 5), jnp.float32))
    assert len(calls) == 1


def test_mmbatch_einsum_output_subscripts(rng):
    """Transposed/reduced einsum outputs are NOT plain matmuls and must
    pass through unrecorded (ADVICE r2: output subscripts were ignored)."""
    a = jnp.asarray(rng.standard_normal((4, 8, 8)).astype(np.float32))
    with mb.mmbatch_begin() as calls:
        jnp.einsum("ij,jk->ki", a[0], a[0])    # transposed out: skip
        jnp.einsum("bij,bjk->ik", a, a)        # batch-reduced out: skip
        jnp.einsum("bij,bjk->bik", a, a)       # plain: recorded
        jnp.einsum("bij,bjk", a, a)            # implicit out: recorded
    assert len(calls) == 2
