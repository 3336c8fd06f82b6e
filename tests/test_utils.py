"""Utility module tests (reference: tests/{math,rng,mhd,hash}.c analogs)."""

import os
import tempfile

import numpy as np
import pytest

from xsmm_tpu.utils import mathx, mhd, rng, scratch


# ------------------------------------------------------------------ mathx ---

def test_isqrt():
    for x in (0, 1, 2, 3, 4, 15, 16, 17, 2 ** 31, 10 ** 12):
        r = mathx.isqrt_u64(x)
        assert r * r <= x < (r + 1) * (r + 1)
    assert mathx.isqrt2(16) == 4
    assert mathx.isqrt2(17) == 5


def test_icbrt():
    for x in (0, 1, 7, 8, 9, 26, 27, 28, 10 ** 9):
        r = mathx.icbrt_u64(x)
        assert r ** 3 <= x < (r + 1) ** 3


def test_sexp2():
    assert mathx.sexp2(3) == 8.0
    assert mathx.sexp2_u8(256) == 2.0
    assert mathx.sexp2_u8(0) == 1.0


def test_shuffle_coprime():
    for n in (2, 3, 10, 12, 100, 131072):
        c = mathx.shuffle(n)
        assert 1 <= c < max(n, 2)
        assert np.gcd(c, n) == 1
    # full period: shuffled indices are a permutation
    idx = mathx.shuffled_indices(97)
    assert sorted(idx.tolist()) == list(range(97))


# -------------------------------------------------------------------- rng ---

def test_rng_reproducible():
    rng.rng_set_seed(42)
    a = rng.rng_f32_seq(100)
    rng.rng_set_seed(42)
    b = rng.rng_f32_seq(100)
    assert np.array_equal(a, b)
    rng.rng_set_seed(43)
    c = rng.rng_f32_seq(100)
    assert not np.array_equal(a, c)


def test_rng_range_and_spread():
    rng.rng_set_seed(7)
    x = rng.rng_f32_seq(4096)
    assert (x >= 0).all() and (x < 1).all()
    assert 0.45 < x.mean() < 0.55
    assert x.std() > 0.25


# -------------------------------------------------------------------- mhd ---

def test_mhd_roundtrip(rng_fixture=None):
    r = np.random.default_rng(0)
    for dtype in (np.float32, np.uint8, np.int16, np.float64):
        data = (r.standard_normal((4, 6, 8)) * 100).astype(dtype)
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "img.mhd")
            mhd.mhd_write(p, data)
            back = mhd.mhd_read(p)
            assert back.dtype == data.dtype
            assert np.array_equal(back, data)


def test_mhd_compare():
    r = np.random.default_rng(0)
    a = r.standard_normal((8, 8)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        pa, pb = os.path.join(d, "a.mhd"), os.path.join(d, "b.mhd")
        mhd.mhd_write(pa, a)
        mhd.mhd_write(pb, a + 1e-6)
        ok, info = mhd.mhd_compare(pa, pb)
        assert ok
        mhd.mhd_write(pb, a + 1.0)
        ok, info = mhd.mhd_compare(pa, pb)
        assert not ok


# ---------------------------------------------------------------- scratch ---

def test_scratch_info():
    info = scratch.get_scratch_info()
    assert info.npools == 1
    assert info.size >= 0


def test_trace_scope_runs():
    import jax.numpy as jnp
    from xsmm_tpu.utils import trace
    with trace.scope("xsmm_test_scope"):
        x = jnp.ones((8, 8)) * 2
    assert float(x[0, 0]) == 2.0
    name = trace.kernel_name("smm", type("D", (), {
        "m": 4, "n": 5, "k": 6, "in_dtype": "float32", "batch": 2})())
    assert "4x5x6" in name and name.endswith(".smm")


def test_scratch_limit_parsing(monkeypatch):
    from xsmm_tpu.utils import scratch
    monkeypatch.setenv("XSMM_SCRATCH_LIMIT", "512M")
    assert scratch.scratch_limit() == 512 * 1024 * 1024
    monkeypatch.setenv("XSMM_SCRATCH_LIMIT", "2G")
    assert scratch.scratch_limit() == 2 * 1024 ** 3
    monkeypatch.setenv("XSMM_SCRATCH_LIMIT", "0")
    assert scratch.scratch_limit() == 0


def test_scratch_scope_reports():
    from xsmm_tpu.utils import scratch
    with scratch.scratch_scope("test") as rep:
        pass
    assert set(rep) >= {"peak_delta", "live_delta", "limit"}
    # strict enforcement with faked backend stats (CPU reports none)
    import pytest
    stats = iter([{"bytes_in_use": 0, "peak_bytes_in_use": 0},
                  {"bytes_in_use": 10, "peak_bytes_in_use": 100}])
    orig = scratch.device_memory_stats
    scratch.device_memory_stats = lambda device=None: next(stats)
    try:
        with pytest.raises(MemoryError, match="exceeds limit"):
            with scratch.scratch_scope("x", limit=50, strict=True):
                pass
    finally:
        scratch.device_memory_stats = orig


def test_host_staging_pool_reuse():
    import numpy as np
    from xsmm_tpu.utils.scratch import HostStagingPool
    pool = HostStagingPool(max_pools=4)
    b1 = pool.buffer((8, 8), np.float32, "a")
    b1[:] = 1.0
    b2 = pool.buffer((8, 8), np.float32, "a")
    assert b2 is b1                      # same thread, same key -> reuse
    assert pool.nreuse == 1 and pool.nmallocs == 1
    b3 = pool.buffer((8, 8), np.float32, "b")
    assert b3 is not b1                  # different slot
    # in-flight safety: mark + reuse blocks on the device array
    import jax.numpy as jnp
    d = jnp.zeros((8, 8), jnp.float32) + 1
    pool.mark_in_flight(b1, d)
    b4 = pool.buffer((8, 8), np.float32, "a")
    assert b4 is b1
    pool.clear()
    assert pool.buffer((8, 8), np.float32, "a") is not None
