"""Quantization utilities vs numpy gold (libxsmm_dnn_quantize semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import xsmm_tpu as xt
from xsmm_tpu.dnn import (RoundMode, dequantize, quantize, quantize_act,
                          quantize_fil)
from xsmm_tpu.ops.smm import wimmdispatch, wsmmdispatch


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _gold_scf(x, add_shift=0):
    # scf = 14 - add_shift - (max_exp - 127), libxsmm_dnn.c:2576
    max_exp = np.frexp(np.abs(x).max())[1] + 126  # biased exponent
    return 14 - add_shift - (max_exp - 127)


def test_scf_matches_reference_formula(rng):
    for scale in (1.0, 0.37, 129.0, 1e-3):
        x = (rng.standard_normal((64, 64)) * scale).astype(np.float32)
        q, scf = quantize(x)
        assert int(scf) == _gold_scf(x), (scale, int(scf), _gold_scf(x))
        # the largest magnitude lands in [2^13, 2^15): i16-filling
        assert 2 ** 13 <= np.abs(np.asarray(q)).max() < 2 ** 15


def test_nearest_matches_numpy_gold(rng):
    x = (rng.standard_normal((33, 17)) * 3.0).astype(np.float32)
    q, scf = quantize(x, round_mode=RoundMode.NEAREST)
    s = np.float32(2.0 ** int(scf))
    mag = np.abs(x.astype(np.float64) * s)
    gold = np.sign(x) * np.floor(mag + 0.5)
    assert np.array_equal(np.asarray(q, np.float64), gold)


def test_no_round_truncates(rng):
    x = (rng.standard_normal((64,)) * 2.0).astype(np.float32)
    q, scf = quantize(x, round_mode=RoundMode.NO_ROUND)
    s = 2.0 ** int(scf)
    gold = np.sign(x) * np.floor(np.abs(x.astype(np.float64)) * s)
    assert np.array_equal(np.asarray(q, np.float64), gold)


def test_roundtrip_error_bound(rng):
    x = (rng.standard_normal((128, 128)) * 0.5).astype(np.float32)
    for mode in (RoundMode.NEAREST, RoundMode.FPHW, RoundMode.BIAS):
        q, scf = quantize(x, round_mode=mode)
        back = np.asarray(dequantize(q, scf))
        step = 2.0 ** -int(scf)
        assert np.abs(back - x).max() <= step + 1e-12, mode


def test_stochastic_rounding_unbiased():
    x = np.full((2048,), 0.3e-4, np.float32)
    key = jax.random.PRNGKey(0)
    q, scf = quantize(x, round_mode=RoundMode.STOCH, key=key)
    back = np.asarray(dequantize(q, scf))
    # mean of stochastic roundtrip approximates x (IBM 2015 property)
    assert abs(back.mean() - 0.3e-4) < 0.02e-4
    with pytest.raises(ValueError, match="key"):
        quantize(x, round_mode=RoundMode.STOCH)


def test_add_shift(rng):
    x = rng.standard_normal((64,)).astype(np.float32)
    q0, scf0 = quantize(x, add_shift=0)
    q2, scf2 = quantize(x, add_shift=2)
    assert int(scf0) - int(scf2) == 2
    assert np.abs(np.asarray(q2)).max() < 2 ** 13  # headroom for sums


def test_quantize_feeds_wimm(rng):
    """The VERDICT r2 gap: producers for the i16 dispatchers.  q(a) @ q(b)
    on the wimm path, dequantized with scf_a+scf_b, must match the f32
    product to DFP16 accuracy."""
    B, M, N, K = 8, 16, 16, 16
    a = (rng.standard_normal((B, M, K)) * 0.7).astype(np.float32)
    b = (rng.standard_normal((B, K, N)) * 1.3).astype(np.float32)
    qa, scf_a = quantize_act(a)
    qb, scf_b = quantize_fil(b)
    kern = wimmdispatch(M, N, K, batch=B, beta=0.0)
    c_i32 = kern(np.asarray(qa), np.asarray(qb))
    c = np.asarray(c_i32, np.float64) * 2.0 ** -(int(scf_a) + int(scf_b))
    gold = np.matmul(a.astype(np.float64), b.astype(np.float64))
    err = np.linalg.norm(c - gold) / np.linalg.norm(gold)
    assert err < 1e-3, err  # inside the reference gate (tests/gemm.c:224)


def test_quantize_zero_tensor():
    q, scf = quantize(np.zeros((8, 8), np.float32))
    assert np.all(np.asarray(q) == 0)
    assert np.isfinite(np.asarray(dequantize(q, scf))).all()


def test_quantize_large_magnitude_saturates(rng):
    """max|x| >= 2^14 would need a negative scf (uint8 ABI): scf clamps
    to 0 and values saturate at the i16 range instead of dequantizing
    with a wrapped 2^-249 garbage scale (code-review r3 finding)."""
    x = (rng.standard_normal((64,)) * 1e6).astype(np.float32)
    q, scf = quantize(x)
    assert int(scf) == 0
    back = np.asarray(dequantize(q, scf))
    gold = np.clip(np.sign(x) * np.floor(np.abs(x.astype(np.float64)) + 0.5),
                   -32768, 32767)
    assert np.array_equal(back, gold)
