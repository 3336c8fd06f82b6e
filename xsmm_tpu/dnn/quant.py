"""DFP16 quantization utilities: f32 -> i16 with a shared scale factor.

Reference: libxsmm_dnn_quantize / _act / _fil / dequantize
(include/libxsmm_dnn.h:416-419, impl src/libxsmm_dnn.c:2440-2824) — the
producers for the i16 wimm/wsmm GEMM paths.  Semantics (dynamic fixed
point, DFP16): the tensor's max exponent picks one power-of-two scale

    scf = 14 - add_shift - (max_exp - 127)       (libxsmm_dnn.c:2576)

so the largest magnitude maps to ~2^14 and every element is
q = round_mode(x * 2^scf) stored as int16; dequantize is x = q * 2^-scf
(libxsmm_dnn.c:2813).  Rounding modes (libxsmm_dnn.h:353-357):

  NO_ROUND  - truncate the magnitude toward zero (mantissa chop)
  NEAREST   - round magnitude to nearest (guard bit)
  BIAS      - round magnitude up when either of the two guard bits is set
              (the reference's biased-rounding variant)
  STOCH     - stochastic rounding (IBM 2015), needs a PRNG key
  FPHW      - FP-multiply path: scf from frexp(max), q = roundf(x*2^scf)
              (round half away from zero, libxsmm_dnn.c:2524-2556)

TPU-native: one vectorized jnp pass (reduction for the max exponent + a
fused scale/round/cast epilogue).  The _act/_fil variants exist for API
parity: the reference versions additionally relayout into NCHWc / KCRS
blocked formats (cblk/kblk/lp_blk), which has no TPU analog — XLA owns
layout — so here they are the same per-tensor quantization.

The i16 results feed wimmdispatch/wsmmdispatch directly (i16 x i16 -> i32
accumulate on the MXU); scale factors compose as 2^-(scf_a + scf_b).
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class RoundMode(enum.IntEnum):
    """libxsmm_dnn.h:353-357 constants (values kept for parity)."""

    NO_ROUND = 80000
    BIAS = 80001
    STOCH = 80002
    NEAREST = 80003
    FPHW = 80004


def _max_exp(x) -> jax.Array:
    """Biased exponent of the largest |x| (0 for an all-zero tensor)."""
    ax = jnp.max(jnp.abs(x))
    bits = jax.lax.bitcast_convert_type(ax.astype(jnp.float32), jnp.uint32)
    return ((bits >> 23) & 0xFF).astype(jnp.int32)


@jax.jit
def _quantize_core(x, add_shift: jax.Array, mode: jax.Array, key):
    x = x.astype(jnp.float32)
    mexp = _max_exp(x)
    # scf = 14 - add_shift - (max_exp - 127)  (libxsmm_dnn.c:2576); the
    # FPHW path computes the same exponent via frexp: frexp's exponent is
    # (max_exp - 126), maxexp -= (15 - add_shift) -> -scf.
    # scf is a uint8 in the reference ABI: tensors with max|x| >= 2^14
    # would need a NEGATIVE scf (the reference only asserts in debug,
    # libxsmm_dnn.c:2556-2560, then wraps).  Clamp to 0 instead: such
    # values saturate at the i16 range — bounded error, never the
    # silent 2^-249 garbage a wrapped uint8 would dequantize with.
    scf = jnp.maximum(14 - add_shift - (mexp - 127), 0)
    scale = jnp.exp2(scf.astype(jnp.float32))
    s = x * scale
    mag = jnp.abs(s)
    sign = jnp.sign(s)
    q_chop = jnp.floor(mag)
    frac = mag - q_chop
    q_nearest = q_chop + (frac >= 0.5)
    # BIAS: round the magnitude up when either of the two bits below the
    # cut is set, i.e. the fractional part >= 0.25 (libxsmm_dnn.c:2482-88)
    q_bias = q_chop + (frac >= 0.25)
    if key is None:
        q_stoch = q_nearest
    else:
        p = jax.random.uniform(key, x.shape)
        q_stoch = q_chop + (p < frac)
    q_fphw = jnp.round(s)  # round half away from zero below
    q_fphw = jnp.where((mag - jnp.floor(mag)) == 0.5,
                       q_chop + 1.0, q_fphw)
    q = jnp.select(
        [mode == RoundMode.NO_ROUND, mode == RoundMode.NEAREST,
         mode == RoundMode.BIAS, mode == RoundMode.STOCH],
        [sign * q_chop, sign * q_nearest, sign * q_bias, sign * q_stoch],
        jnp.where(jnp.signbit(s), -jnp.abs(q_fphw), jnp.abs(q_fphw)))
    q = jnp.clip(q, -32768.0, 32767.0)
    return q.astype(jnp.int16), scf.astype(jnp.uint8)


def quantize(x, add_shift: int = 0,
             round_mode: RoundMode = RoundMode.NEAREST,
             key: Optional[jax.Array] = None
             ) -> Tuple[jax.Array, jax.Array]:
    """libxsmm_dnn_quantize analog: returns (i16 tensor, uint8 scf).

    STOCH mode requires an explicit PRNG ``key`` (the reference seeds
    rand() from the TSC; functional JAX makes the key explicit)."""
    if round_mode == RoundMode.STOCH and key is None:
        raise ValueError("STOCH rounding requires a PRNG key")
    if round_mode != RoundMode.STOCH:
        key = None
    return _quantize_core(jnp.asarray(x), jnp.int32(add_shift),
                          jnp.int32(round_mode), key)


def quantize_act(x, add_shift: int = 0,
                 round_mode: RoundMode = RoundMode.NEAREST,
                 key: Optional[jax.Array] = None):
    """libxsmm_dnn_quantize_act analog (NHWC activations).

    The reference also re-blocks into the NCHWc low-precision layout
    (cblk_f32/cblk_i16/lp_blk args, libxsmm_dnn.c:2580); layout is XLA's
    job on TPU, so this is the per-tensor quantization."""
    return quantize(x, add_shift, round_mode, key)


def quantize_fil(w, add_shift: int = 0,
                 round_mode: RoundMode = RoundMode.NEAREST,
                 key: Optional[jax.Array] = None):
    """libxsmm_dnn_quantize_fil analog (conv filters; see quantize_act)."""
    return quantize(w, add_shift, round_mode, key)


@jax.jit
def _dequantize_core(q, scf):
    return q.astype(jnp.float32) * jnp.exp2(-scf.astype(jnp.float32))


def dequantize(q, scf) -> jax.Array:
    """libxsmm_dnn_dequantize analog: i16 * 2^-scf -> f32."""
    return _dequantize_core(jnp.asarray(q), jnp.asarray(scf))
