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

__all__ = ["seq_pallas_ok", "seq_vmem_bytes", "lstm_seq", "gru_seq", "rnn_seq",
           "lstm_seq_bwd", "gru_seq_bwd", "rnn_seq_bwd"]


def seq_vmem_bytes(n: int, k: int, gates: int, r_itemsize: int) -> int:
    """Worst-case VMEM residency of the scan-fused kernels (fwd-train/bwd).

    Counts EVERY resident block, not just the weight panel: the step
    input/output panels are double-buffered by Mosaic, the initial-state /
    final-state blocks and scratch are single.  Per-cell panel counts
    ([N,K] f32 units) over the heavier of the two directions:
    LSTM bwd streams 7 step inputs (x2) + 5 consts + 2 scratch = 21;
    GRU bwd 7 (x2) + 3 + 1 = 18 (the [1,N,K] dgiris step OUTPUT is also
    double-buffered — ADVICE r3); simple RNN <= 9.
    """
    s = n * k * 4                       # one [N,K] f32 panel
    z = 2 * n * gates * k * 4           # step G-panel, double-buffered
    r = k * gates * k * r_itemsize      # resident recurrent weight panel
    panels = {4: 21, 3: 18, 1: 9}[gates]
    return z + r + panels * s


def seq_pallas_ok(n: int, k: int, gates: int, r_itemsize: int) -> bool:
    """Static routing decision for the scan-fused forward.

    The budget must cover the FULL kernel residency — an undercount is a
    Mosaic scoped-VMEM compile failure at dispatch, which on the tunneled
    setup also wedges the device for minutes (CLAUDE.md).  13MB keeps
    headroom under the 16MB default scoped budget (rule 1: never set
    vmem_limit_bytes).
    """
    if platform.interpret_mode():
        return True
    if not platform.is_tpu():
        return False
    if n % 8 or k % 128:
        return False
    return seq_vmem_bytes(n, k, gates, r_itemsize) <= 13 * 2 ** 20


def _const2(ti):
    """Constant-index 2-D block (weights / initial state / final state)."""
    return (0, 0)


def _fwd_idx(ti):
    """Step-t block of a [T,...] panel, forward grid order."""
    return (ti, 0, 0)


def _rev_idx(t):
    """Step block walking t = T-1..0 (reverse-scan grid order)."""
    return lambda ti: (t - 1 - ti, 0, 0)


def _prev_idx(t):
    """Shifted view: the t-1 block of the same panel under the reverse
    grid (clamped at 0; kernels override the clamped step with the
    initial state via `ti == nt-1`)."""
    return lambda ti: (jnp.maximum(t - 2 - ti, 0), 0, 0)


def _dot(h, r_ref, prec):
    return jax.lax.dot_general(
        h.astype(r_ref.dtype), r_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


# --------------------------------------------------------------- LSTM ----
def _lstm_kernel(zx_ref, r_ref, h0_ref, c0_ref, *refs, k, nt, prec, train):
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
    step3 = pl.BlockSpec((1, n, 4 * k), _fwd_idx,
                         memory_space=pltpu.VMEM)
    out_step = pl.BlockSpec((1, n, k), _fwd_idx,
                            memory_space=pltpu.VMEM)
    out_const = pl.BlockSpec((n, k), _const2, memory_space=pltpu.VMEM)
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
                  pl.BlockSpec((k, 4 * k), _const2, memory_space=pltpu.VMEM),
                  out_const, out_const],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n, k), jnp.float32),
                        pltpu.VMEM((n, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(zx, r, h0, c0)


def _lstm_bwd_kernel(dhs_ref, is_ref, gs_ref, fs_ref, os_ref, cs_ref,
                     cp_ref, c0_ref, dht_ref, dct_ref, rt_ref,
                     dz_ref, dh0_ref, dc0_ref, db_ref, dh_scr, dc_scr,
                     *, k, nt, prec):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _():
        dh_scr[:] = dht_ref[:]
        dc_scr[:] = dct_ref[:]
        db_ref[:] = jnp.zeros_like(db_ref)

    i = is_ref[0]
    g = gs_ref[0]
    f = fs_ref[0]
    o = os_ref[0]
    tc = jnp.tanh(cs_ref[0])
    # c_{t-1}: the shifted cs block view, except at t==0 (the LAST grid
    # step) where it is the initial cell state.
    cp = jnp.where(ti == nt - 1, c0_ref[:], cp_ref[0])
    dh = dhs_ref[0].astype(jnp.float32) + dh_scr[:]
    do = dh * tc
    dc = dc_scr[:] + dh * o * (1.0 - tc * tc)
    dzi = dc * g * i * (1.0 - i)
    dzg = dc * i * (1.0 - g * g)
    dzf = dc * cp * f * (1.0 - f)
    dzo = do * o * (1.0 - o)
    dz = jnp.concatenate([dzi, dzg, dzf, dzo], axis=1)
    dz_ref[0] = dz.astype(dz_ref.dtype)
    db_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
    dh_prev = _dot(dz, rt_ref, prec)
    dc_prev = dc * f
    dh_scr[:] = dh_prev
    dc_scr[:] = dc_prev

    @pl.when(ti == nt - 1)
    def _():
        dh0_ref[:] = dh_prev
        dc0_ref[:] = dc_prev


def lstm_seq_bwd(dhs, is_, gs, fs, os_, cs, c0, dh_t, dc_t, rt, *, k, prec,
                 dz_dt=jnp.float32):
    """Reverse-scan LSTM gate-gradient kernel.

    Walks t = T-1..0 with the carried (dh, dc) in VMEM scratch and
    R^T [4K,K] VMEM-resident; streams the stored gate activations in and
    the pre-activation gradients dz [T,N,4K] out.  tanh(c_t) is computed
    in-kernel and c_{t-1} is a shifted BLOCK VIEW of cs — the lax.scan
    backward needed full-array HBM passes for both.  db accumulates
    in-kernel (f32), so dz can be emitted in the MXU input dtype
    (bf16 mode: halves the dominant stream AND the three downstream
    flat-GEMM reads with no result change — the GEMMs' default-precision
    MXU pass truncates f32 operands to bf16 anyway).
    Returns (dzs [T,N,4K] dz_dt, dh0, dc0, db [1,4K] f32).
    """
    t, n, _ = dhs.shape
    kern = functools.partial(_lstm_bwd_kernel, k=k, nt=t, prec=prec)
    rev = _rev_idx(t)
    prev = _prev_idx(t)
    step = pl.BlockSpec((1, n, k), rev, memory_space=pltpu.VMEM)
    onek = pl.BlockSpec((n, k), _const2, memory_space=pltpu.VMEM)
    one = jax.ShapeDtypeStruct((n, k), jnp.float32)
    return pallas_call(
        kern,
        grid=(t,),
        in_specs=[step] * 5
        + [step,
           pl.BlockSpec((1, n, k), prev, memory_space=pltpu.VMEM),
           onek, onek, onek,
           pl.BlockSpec((4 * k, k), _const2, memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, n, 4 * k), rev, memory_space=pltpu.VMEM),
                   onek, onek,
                   pl.BlockSpec((1, 4 * k), _const2,
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((t, n, 4 * k), dz_dt),
                   one, one,
                   jax.ShapeDtypeStruct((1, 4 * k), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((n, k), jnp.float32),
                        pltpu.VMEM((n, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(dhs, is_, gs, fs, os_, cs, cs, c0, dh_t, dc_t, rt)


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
    step3 = pl.BlockSpec((1, n, 3 * k), _fwd_idx,
                         memory_space=pltpu.VMEM)
    out_step = pl.BlockSpec((1, n, k), _fwd_idx,
                            memory_space=pltpu.VMEM)
    out_const = pl.BlockSpec((n, k), _const2, memory_space=pltpu.VMEM)
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
                  pl.BlockSpec((k, 3 * k), _const2, memory_space=pltpu.VMEM),
                  out_const],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(zx, r, h0)


def _gru_bwd_kernel(dhs_ref, ris_ref, zis_ref, gis_ref, zrg_ref,
                    hs_ref, h0_ref, dht_ref, rt_ref,
                    dzx_ref, dgiri_ref, dh0_ref, db_ref, dh_scr,
                    *, k, nt, prec):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _():
        dh_scr[:] = dht_ref[:]
        db_ref[:] = jnp.zeros_like(db_ref)

    ri = ris_ref[0]
    zi = zis_ref[0]
    gi = gis_ref[0]
    zr_g = zrg_ref[0]
    hp = jnp.where(ti == nt - 1, h0_ref[:], hs_ref[0])
    dh = dhs_ref[0].astype(jnp.float32) + dh_scr[:]
    dzi_pre = dh * (hp - gi) * zi * (1.0 - zi)
    dgi_pre = dh * (1.0 - zi) * (1.0 - gi * gi)
    dri_pre = dgi_pre * zr_g * ri * (1.0 - ri)
    dgiri = dgi_pre * ri
    dzx = jnp.concatenate([dri_pre, dzi_pre, dgi_pre], axis=1)
    dzx_ref[0] = dzx.astype(dzx_ref.dtype)
    dgiri_ref[0] = dgiri.astype(dgiri_ref.dtype)
    db_ref[:] += jnp.sum(dzx, axis=0, keepdims=True)
    dzr = jnp.concatenate([dri_pre, dzi_pre, dgiri], axis=1)
    dh_prev = dh * zi + _dot(dzr, rt_ref, prec)
    dh_scr[:] = dh_prev

    @pl.when(ti == nt - 1)
    def _():
        dh0_ref[:] = dh_prev


def gru_seq_bwd(dhs, ris, zis, gis, zrgs, hs, h0, dh_t, rt, *, k, prec,
                dz_dt=jnp.float32):
    """Reverse-scan GRU gate-gradient kernel.

    Same discipline as lstm_seq_bwd: dh carried in scratch, R^T [3K,K]
    VMEM-resident, h_{t-1} a shifted block view of hs, db accumulated
    in-kernel so the dzx/dgiri streams emit in the MXU input dtype.
    Emits dzx [T,N,3K] plus only dzr's g-column (its r,z parts equal
    dzx's — the reassembly happens in the flat post-scan GEMM feed).
    Returns (dzxs, dgiris, dh0, db [1,3K] f32).
    """
    t, n, _ = dhs.shape
    kern = functools.partial(_gru_bwd_kernel, k=k, nt=t, prec=prec)
    rev = _rev_idx(t)
    prev = _prev_idx(t)
    step = pl.BlockSpec((1, n, k), rev, memory_space=pltpu.VMEM)
    onek = pl.BlockSpec((n, k), _const2, memory_space=pltpu.VMEM)
    one = jax.ShapeDtypeStruct((n, k), jnp.float32)
    return pallas_call(
        kern,
        grid=(t,),
        in_specs=[step] * 5
        + [pl.BlockSpec((1, n, k), prev, memory_space=pltpu.VMEM),
           onek, onek,
           pl.BlockSpec((3 * k, k), _const2, memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, n, 3 * k), rev, memory_space=pltpu.VMEM),
                   step, onek,
                   pl.BlockSpec((1, 3 * k), _const2,
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((t, n, 3 * k), dz_dt),
                   jax.ShapeDtypeStruct((t, n, k), dz_dt), one,
                   jax.ShapeDtypeStruct((1, 3 * k), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((n, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(dhs, ris, zis, gis, zrgs, hs, h0, dh_t, rt)


def _rnn_bwd_kernel(dhs_ref, hs_ref, dht_ref, rt_ref, dz_ref, dh0_ref,
                    db_ref, dh_scr, *, nt, prec, dact):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _():
        dh_scr[:] = dht_ref[:]
        db_ref[:] = jnp.zeros_like(db_ref)

    dz = (dhs_ref[0].astype(jnp.float32) + dh_scr[:]) * dact(hs_ref[0])
    dz_ref[0] = dz.astype(dz_ref.dtype)
    db_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
    dh_prev = _dot(dz, rt_ref, prec)
    dh_scr[:] = dh_prev

    @pl.when(ti == nt - 1)
    def _():
        dh0_ref[:] = dh_prev


def rnn_seq_bwd(dhs, hs, dh_t, rt, *, k, prec, dact, dz_dt=jnp.float32):
    """Reverse-scan simple-RNN gradient kernel; returns (dzs, dh0, db)."""
    t, n, _ = dhs.shape
    kern = functools.partial(_rnn_bwd_kernel, nt=t, prec=prec, dact=dact)
    rev = _rev_idx(t)
    step = pl.BlockSpec((1, n, k), rev, memory_space=pltpu.VMEM)
    onek = pl.BlockSpec((n, k), _const2, memory_space=pltpu.VMEM)
    return pallas_call(
        kern,
        grid=(t,),
        in_specs=[step, step, onek,
                  pl.BlockSpec((k, k), _const2, memory_space=pltpu.VMEM)],
        out_specs=[step, onek,
                   pl.BlockSpec((1, k), _const2, memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((t, n, k), dz_dt),
                   jax.ShapeDtypeStruct((n, k), jnp.float32),
                   jax.ShapeDtypeStruct((1, k), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((n, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(dhs, hs, dh_t, rt)


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
    return pallas_call(
        kern,
        grid=(t,),
        in_specs=[pl.BlockSpec((1, n, k), _fwd_idx,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, k), _const2, memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, k), _const2, memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, n, k), _fwd_idx,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((n, k), _const2, memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((t, n, k), jnp.float32),
                   jax.ShapeDtypeStruct((n, k), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((n, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(zx, r, h0)
