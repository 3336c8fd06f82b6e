"""Tiled big-GEMM tests (reference: samples/xgemm, libxsmm_gemm.c tiled path)."""

import numpy as np
import pytest

import xsmm_tpu as xt
from xsmm_tpu.ops.tiled_gemm import TiledGemm, gemm_handle, xgemm


def gold(a, b):
    return np.asarray(a, np.float64) @ np.asarray(b, np.float64)


@pytest.mark.parametrize("m,n,k", [(256, 256, 256), (384, 128, 256),
                                   (200, 100, 50), (1, 1, 1), (129, 257, 65)])
def test_shapes(rng, m, n, k):
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    h = TiledGemm(m, n, k)
    c = np.asarray(h(a, b))
    assert c.shape == (m, n)
    xt.check(gold(a, b), c, 1e-3, what=f"tiled {m}x{n}x{k}")


def test_c0_accumulate(rng):
    m = n = k = 128
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    c0 = rng.standard_normal((m, n)).astype(np.float32)
    h = TiledGemm(m, n, k)
    xt.check(gold(a, b) + c0, np.asarray(h(a, b, c0)), 1e-3)


def test_bf16(rng):
    import jax.numpy as jnp
    m = n = k = 256
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    h = TiledGemm(m, n, k, in_dtype=jnp.bfloat16, out_dtype=jnp.float32)
    c = np.asarray(h(a, b))
    ab = np.asarray(a.astype(jnp.bfloat16), np.float64)
    bb = np.asarray(b.astype(jnp.bfloat16), np.float64)
    xt.check(gold(ab, bb), c, 1e-2, what="bf16 tiled")


def test_tile_plan_env_override():
    from xsmm_tpu.core.config import set_config
    set_config(tgemm_m=128, tgemm_n=256, tgemm_k=128)
    try:
        h = TiledGemm(512, 512, 512)
        assert (h.bm, h.bn, h.bk) == (128, 256, 128)
    finally:
        set_config(tgemm_m=0, tgemm_n=0, tgemm_k=0)


def test_handle_cached():
    h1 = gemm_handle(64, 64, 64)
    h2 = gemm_handle(64, 64, 64)
    assert h1 is h2


def test_xgemm_convenience(rng):
    a = rng.standard_normal((96, 64)).astype(np.float32)
    b = rng.standard_normal((64, 80)).astype(np.float32)
    xt.check(gold(a, b), np.asarray(xgemm(a, b)), 1e-3)
