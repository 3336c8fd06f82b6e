"""Scan-fused Pallas forward kernels for the RNN/LSTM/GRU cells.

Reference: the rnncell fwd templates run two batch-reduce GEMMs per
timestep from a persistent thread team with the weights hot in cache
(libxsmm_dnn_rnncell_st_lstm_fwd_nc_kcck.tpl.c:94-137).  The TPU-native
analog of "weights stay hot": ONE Pallas kernel whose grid is the T loop
(dimension_semantics 'arbitrary' = sequential), with

  - the recurrent weight R as a constant-index VMEM block — Mosaic's
    revolving-buffer logic DMAs it from HBM ONCE and keeps it resident
    across all T steps,
  - the hidden/cell state carried in VMEM scratch (never touches HBM),
  - the per-step zx panel streamed in and hs panel streamed out with
    automatic double buffering,
  - the gate elementwise math fused right behind the MXU matmul.

The input projection x@W for ALL steps is hoisted out as one flat
[T*N, C] MXU GEMM (the reference's "diffused" W.x overlap) — only h@R is
inherently sequential.  Measured (N128 C512 K512 T32 bf16, v5e): the XLA
lax.scan forward runs 140.6 TF; this kernel 171.6 TF inference / 168.2 TF
emitting all training residuals, vs a 189.7 TF one-GEMM ceiling for the
same FLOPs (perf_notes.md "RNN forward study").

Eligibility (seq_pallas_ok): lane-aligned K, sublane-aligned N, and the
R panel within the VMEM budget; anything else falls back to the XLA scan
in rnncell.py.  Interpret mode always qualifies so the hermetic CPU suite
exercises these kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import platform
from ..ops.pallas_util import pallas_call

__all__ = ["seq_pallas_ok", "lstm_seq", "gru_seq", "rnn_seq"]


def seq_pallas_ok(n: int, k: int, gates: int, r_itemsize: int) -> bool:
    """Static routing decision for the scan-fused forward."""
    if platform.interpret_mode():
        return True
    if not platform.is_tpu():
        return False
    if n % 8 or k % 128:
        return False
    if k * gates * k * r_itemsize > 8 * 2 ** 20:   # R VMEM panel
        return False
    if n * gates * k * 4 > 4 * 2 ** 20:            # zx step panel (f32)
        return False
    return True


def _dot(h, r_ref, prec):
    return jax.lax.dot_general(
        h.astype(r_ref.dtype), r_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


# --------------------------------------------------------------- LSTM ----
def _lstm_kernel(zx_ref, r_ref, h0_ref, c0_ref, *refs,
                 k, nt, prec, train, h_scr=None, c_scr=None):
    if train:
        (hs_ref, ht_ref, ct_ref, cs_ref, is_ref, gs_ref, fs_ref,
         os_ref, h_scr, c_scr) = refs
    else:
        hs_ref, ht_ref, ct_ref, h_scr, c_scr = refs
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    h = h_scr[:]
    c = c_scr[:]
    z = zx_ref[0] + _dot(h, r_ref, prec)
    i = jax.nn.sigmoid(z[:, 0 * k:1 * k])
    g = jnp.tanh(z[:, 1 * k:2 * k])
    f = jax.nn.sigmoid(z[:, 2 * k:3 * k])
    o = jax.nn.sigmoid(z[:, 3 * k:4 * k])
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)
    h_scr[:] = h2
    c_scr[:] = c2
    hs_ref[0] = h2
    if train:
        cs_ref[0] = c2
        is_ref[0] = i
        gs_ref[0] = g
        fs_ref[0] = f
        os_ref[0] = o

    @pl.when(ti == nt - 1)
    def _():
        ht_ref[:] = h2
        ct_ref[:] = c2


def lstm_seq(zx, r, h0, c0, *, k, prec, train):
    """zx [T,N,4K] f32 (x@W+b precomputed), r [K,4K] (bf16 or f32).

    Returns (hs, h_t, c_t) or (hs, h_t, c_t, cs, i, g, f, o) if train.
    """
    t, n, _ = zx.shape
    kern = functools.partial(_lstm_kernel, k=k, nt=t, prec=prec,
                             train=train)
    const2 = lambda ti: (0, 0)  # noqa: E731
    step3 = pl.BlockSpec((1, n, 4 * k), lambda ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM)
    out_step = pl.BlockSpec((1, n, k), lambda ti: (ti, 0, 0),
                            memory_space=pltpu.VMEM)
    out_const = pl.BlockSpec((n, k), const2, memory_space=pltpu.VMEM)
    seq = jax.ShapeDtypeStruct((t, n, k), jnp.float32)
    one = jax.ShapeDtypeStruct((n, k), jnp.float32)
    out_specs = [out_step, out_const, out_const]
    out_shape = [seq, one, one]
    if train:
        out_specs += [out_step] * 5
        out_shape += [seq] * 5
    return pallas_call(
        kern,
        grid=(t,),
        in_specs=[step3,
                  pl.BlockSpec((k, 4 * k), const2, memory_space=pltpu.VMEM),
                  out_const, out_const],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n, k), jnp.float32),
                        pltpu.VMEM((n, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(zx, r, h0, c0)


# ---------------------------------------------------------------- GRU ----
def _gru_kernel(zx_ref, r_ref, h0_ref, *refs, k, nt, prec, train):
    if train:
        (hs_ref, ht_ref, ris_ref, zis_ref, gis_ref, zrg_ref,
         h_scr) = refs
    else:
        hs_ref, ht_ref, h_scr = refs
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    zx_t = zx_ref[0]
    zr = _dot(h, r_ref, prec)
    ri = jax.nn.sigmoid(zx_t[:, :k] + zr[:, :k])
    zi = jax.nn.sigmoid(zx_t[:, k:2 * k] + zr[:, k:2 * k])
    zr_g = zr[:, 2 * k:]
    gi = jnp.tanh(zx_t[:, 2 * k:] + ri * zr_g)
    h2 = (1.0 - zi) * gi + zi * h
    h_scr[:] = h2
    hs_ref[0] = h2
    if train:
        ris_ref[0] = ri
        zis_ref[0] = zi
        gis_ref[0] = gi
        zrg_ref[0] = zr_g

    @pl.when(ti == nt - 1)
    def _():
        ht_ref[:] = h2


def gru_seq(zx, r, h0, *, k, prec, train):
    """zx [T,N,3K] f32; returns (hs, h_t[, ris, zis, gis, zrgs])."""
    t, n, _ = zx.shape
    kern = functools.partial(_gru_kernel, k=k, nt=t, prec=prec,
                             train=train)
    const2 = lambda ti: (0, 0)  # noqa: E731
    step3 = pl.BlockSpec((1, n, 3 * k), lambda ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM)
    out_step = pl.BlockSpec((1, n, k), lambda ti: (ti, 0, 0),
                            memory_space=pltpu.VMEM)
    out_const = pl.BlockSpec((n, k), const2, memory_space=pltpu.VMEM)
    seq = jax.ShapeDtypeStruct((t, n, k), jnp.float32)
    one = jax.ShapeDtypeStruct((n, k), jnp.float32)
    out_specs = [out_step, out_const]
    out_shape = [seq, one]
    if train:
        out_specs += [out_step] * 4
        out_shape += [seq] * 4
    return pallas_call(
        kern,
        grid=(t,),
        in_specs=[step3,
                  pl.BlockSpec((k, 3 * k), const2, memory_space=pltpu.VMEM),
                  out_const],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(zx, r, h0)


# ---------------------------------------------------------- simple RNN ----
def _rnn_kernel(zx_ref, r_ref, h0_ref, hs_ref, ht_ref, h_scr,
                *, nt, prec, act):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h = h_scr[:]
    h2 = act(zx_ref[0] + _dot(h, r_ref, prec))
    h_scr[:] = h2
    hs_ref[0] = h2

    @pl.when(ti == nt - 1)
    def _():
        ht_ref[:] = h2


def rnn_seq(zx, r, h0, *, k, prec, act):
    """zx [T,N,K] f32; returns (hs, h_t) — hs doubles as the residual."""
    t, n, _ = zx.shape
    kern = functools.partial(_rnn_kernel, nt=t, prec=prec, act=act)
    const2 = lambda ti: (0, 0)  # noqa: E731
    return pallas_call(
        kern,
        grid=(t,),
        in_specs=[pl.BlockSpec((1, n, k), lambda ti: (ti, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, k), const2, memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, k), const2, memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, n, k), lambda ti: (ti, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((n, k), const2, memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((t, n, k), jnp.float32),
                   jax.ShapeDtypeStruct((n, k), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((n, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(zx, r, h0)
