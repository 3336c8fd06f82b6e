"""Convolution layer handle: forward / backward-data / weight-update.

Reference: libxsmm_dnn_create_conv_layer + libxsmm_dnn_execute_st with kinds
FWD/BWD/UPD (libxsmm_dnn.c:2217, templates in src/template/
libxsmm_dnn_convolve_st_*.tpl.c); JIT'd direct kernels from
generator_convolution_*.c; auto-blocking from libxsmm_dnn_setup.c.

TPU-native: lax.conv_general_dilated IS the direct convolution on the MXU —
XLA's conv emitter performs the im2col-free systolic mapping that the
reference's generator hand-schedules for AVX-512, and the layout assigner
replaces the NCHWc blocking planner.  The three kinds map to the three conv
transpose identities (the same relationship the reference's bwd/upd
templates encode):

  FWD: y = conv(x, w)
  BWD: dx = conv(dy, w^T) with spatial dilation/transposition
  UPD: dw = conv(x^T, dy) over the batch dimension

Fusions (BIAS / RELU / BATCH_STATS_FWD) are elementwise epilogues that XLA
fuses into the conv's output tile — the analog of the reference's fused
template variants.  bf16 inputs accumulate in f32 on the MXU natively.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .types import ConvDesc, Format, FuseOp, Kind

_DN = ("NHWC", "HWIO", "NHWC")


def _prec(dt):
    """f32 convs must force HIGHEST on the MXU (default = one bf16 pass,
    rel err ~1e-2 — outside the 1e-3 gate, tests/gemm.c:224); bf16 inputs
    keep the native pass.  Same rule as ops/smm._mxu_precision."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dt) in (jnp.dtype(jnp.float32),
                                 jnp.dtype(jnp.float64)) else None)


class BwdStats(NamedTuple):
    """Fused conv-backward reductions (BATCH_STATS_BWD / MAX_STATS)."""

    dbeta: jax.Array                      # per-channel sum(dy)
    dgamma_y: jax.Array                   # per-channel sum(dy * y)
    dx_absmax: Optional[jax.Array] = None  # per-channel max|dx| (MAX_STATS)


class BatchStats(NamedTuple):
    """Per-channel forward statistics (BATCH_STATS_FWD / BATCHNORM_STATS /
    MAX_STATS fusions); fields absent from the requested fuse set are None."""

    sum: Optional[jax.Array] = None      # [K]  (BATCH_STATS_FWD)
    sumsq: Optional[jax.Array] = None    # [K]  (BATCH_STATS_FWD)
    mean: Optional[jax.Array] = None     # [K]  (BATCHNORM_STATS)
    var: Optional[jax.Array] = None      # [K]  (BATCHNORM_STATS)
    absmax: Optional[jax.Array] = None   # [K]  (MAX_STATS)


def _to_nhwc(x, fmt: Format):
    if fmt & Format.NCHW:
        return jnp.transpose(x, (0, 2, 3, 1))
    return x


def _from_nhwc(x, fmt: Format):
    if fmt & Format.NCHW:
        return jnp.transpose(x, (0, 3, 1, 2))
    return x


def _to_hwio(w, fmt: Format):
    if fmt & Format.KCRS:  # OIHW -> HWIO
        return jnp.transpose(w, (2, 3, 1, 0))
    return w


def _from_hwio(w, fmt: Format):
    if fmt & Format.KCRS:
        return jnp.transpose(w, (3, 2, 0, 1))
    return w


class ConvLayer:
    """Stateless conv layer handle; all methods are jitted and functional."""

    def __init__(self, desc: ConvDesc):
        self.desc = desc
        d = desc
        self._pad = ((d.pad_h, d.pad_h), (d.pad_w, d.pad_w))
        self._strides = (d.u, d.v)
        # Output space-to-depth for narrow-K stride-1 convs: K <= 64 fills
        # at most half the MXU's 128 output lanes (measured 41% peak at
        # K=64 vs 97% at K=128 — perf_notes.md "conv emitter study"), so
        # adjacent output pixels are computed as channel blocks of one
        # strided conv with a widened kernel: fh*fw x lane fill for
        # (R+fh-1)(S+fw-1)/(RS) extra flops.  Measured: K=64 W-fold
        # 81 -> 130 useful TF (1.61x); K=32 2x2 fold 20 -> 47 TF (2.33x).
        self._fold = (2 if (d.k <= 32 and d.u == 1 and d.h >= 2 * d.r)
                      else 1,
                      2 if (d.k <= 64 and d.v == 1 and d.w >= 2 * d.s)
                      else 1)
        if d.u != 1 or d.v != 1:
            self._fold = (1, 1)
        self._use_s2d = self._fold != (1, 1)
        # Route AUTODIFF through the direct/folded backward too: without
        # this, jax.grad through forward() transposes the s2d conv into a
        # lane-starved form (measured 47.9 TF where the direct backward
        # hits 137.8) — end-to-end training would miss the narrow-channel
        # optimization the explicit backward() has.
        self._custom_core = (d.u == 1 and d.v == 1
                             and d.r - 1 - d.pad_h >= 0
                             and d.s - 1 - d.pad_w >= 0)
        if self._custom_core:
            @jax.custom_vjp
            def core(x, w):
                return self._core_conv(x, w)

            def core_f(x, w):
                return self._core_conv(x, w), (x, w)

            def core_b(res, g):
                x, w = res
                dx = self._bwd_direct(g, w.astype(jnp.float32))
                # dw via the conv VJP in w (the upd contraction over
                # N*H*W — not lane-starved); use a native-output-dtype
                # conv so the cotangent dtype matches in low precision
                in_dt = jnp.dtype(self.desc.in_dtype)

                def pc(w_):
                    return jax.lax.conv_general_dilated(
                        x, w_, self._strides, self._pad,
                        dimension_numbers=_DN,
                        precision=_prec(self.desc.in_dtype))

                _, vjp = jax.vjp(pc, w)
                dw = vjp(g.astype(in_dt))[0]
                return dx.astype(x.dtype), dw.astype(w.dtype)

            core.defvjp(core_f, core_b)
            self._core = core
        else:
            self._core = self._core_conv
        self._fwd = jax.jit(self._fwd_impl)
        self._bwd = jax.jit(self._bwd_impl)
        self._upd = jax.jit(self._upd_impl)

    # -- FWD -----------------------------------------------------------------
    def _core_conv(self, x, w):
        """NHWC x, HWIO w (already cast to in_dtype) -> f32 NHWC y.

        preferred_element_type=f32 with low-precision inputs breaks the
        conv transpose rule (f32 cotangent vs bf16 operand dtype error in
        jax.grad); the MXU accumulates in f32 internally either way, so
        low-precision convs take the native output dtype and upcast for
        the epilogue instead."""
        d = self.desc
        in_dt = jnp.dtype(d.in_dtype)
        upcast = in_dt == jnp.dtype(jnp.float32)
        pref = jnp.float32 if upcast else None
        if self._use_s2d:
            fh, fw = self._fold
            r, s, c, k = w.shape
            w2 = jnp.zeros((r + fh - 1, s + fw - 1, c, fh * fw * k),
                           w.dtype)
            for dy in range(fh):
                for dx in range(fw):
                    blk = (dy * fw + dx) * k
                    w2 = w2.at[dy:dy + r, dx:dx + s, :,
                               blk:blk + k].set(w)
            ph, pw = self._pad
            y2 = jax.lax.conv_general_dilated(
                x, w2, window_strides=(fh, fw),
                padding=((ph[0], ph[1] + fh - 1), (pw[0], pw[1] + fw - 1)),
                dimension_numbers=_DN, precision=_prec(d.in_dtype),
                preferred_element_type=pref)
            n_, h_, w_, _ = y2.shape
            y = (y2.reshape(n_, h_, w_, fh, fw, k)
                 .transpose(0, 1, 3, 2, 4, 5)
                 .reshape(n_, h_ * fh, w_ * fw, k))
            # slice to the RUNTIME output extent (forwards are
            # shape-polymorphic; the descriptor shape is nominal)
            oh = x.shape[1] + ph[0] + ph[1] - r + 1
            ow = x.shape[2] + pw[0] + pw[1] - s + 1
            y = y[:, :oh, :ow]
        else:
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=self._strides, padding=self._pad,
                dimension_numbers=_DN, precision=_prec(d.in_dtype),
                preferred_element_type=pref)
        if not upcast:
            y = y.astype(jnp.float32)
        return y

    def _fwd_impl(self, x, w, bias=None):
        d = self.desc
        in_dt = jnp.dtype(d.in_dtype)
        x = _to_nhwc(x.astype(in_dt), d.buffer_format)
        w = _to_hwio(w.astype(in_dt), d.filter_format)
        y = self._core(x, w)
        if d.fuse_ops & FuseOp.BIAS:
            if bias is None:
                raise ValueError("BIAS fusion requires bias operand")
            y = y + bias.astype(y.dtype)
        if d.fuse_ops & FuseOp.RELU:
            y = jnp.maximum(y, 0.0)
        stats = None
        fwd_stats = (FuseOp.BATCH_STATS_FWD | FuseOp.BATCHNORM_STATS
                     | FuseOp.MAX_STATS)
        if d.fuse_ops & fwd_stats:
            fields = {}
            if d.fuse_ops & FuseOp.BATCH_STATS_FWD:
                fields["sum"] = jnp.sum(y, axis=(0, 1, 2))
                fields["sumsq"] = jnp.sum(y * y, axis=(0, 1, 2))
            if d.fuse_ops & FuseOp.BATCHNORM_STATS:
                fields["mean"] = jnp.mean(y, axis=(0, 1, 2))
                fields["var"] = jnp.var(y, axis=(0, 1, 2))
            if d.fuse_ops & FuseOp.MAX_STATS:
                fields["absmax"] = jnp.max(jnp.abs(y), axis=(0, 1, 2))
            stats = BatchStats(**fields)
        y = _from_nhwc(y.astype(jnp.dtype(d.out_dtype)), d.buffer_format)
        return (y, stats) if stats is not None else y

    def forward(self, x, w, bias=None):
        if bias is not None:
            return self._fwd(x, w, bias)
        return self._fwd(x, w)

    # -- BWD / UPD --------------------------------------------------------------
    # Both are the exact VJPs of the forward conv: XLA lowers them to the
    # transposed convolutions (dy (*) w^T with lhs dilation for BWD; x (*) dy
    # with window = output for UPD) that the reference's bwd/upd templates
    # hand-schedule — and the VJP formulation handles the strided-output
    # shape ambiguity ((H + 2p - R) % u != 0) that explicit conv_transpose
    # formulas get wrong.
    def _bwd_direct(self, dy, w):
        """dx for stride-1 convs as a plain conv of dy with the flipped,
        C/K-swapped filter — with the same output space-to-depth fold as
        the forward when C underfills the MXU lanes.  NHWC dy, HWIO w."""
        d = self.desc
        in_dt = jnp.dtype(d.in_dtype)
        wr = jnp.swapaxes(w[::-1, ::-1], 2, 3).astype(in_dt)  # [r,s,k,c]
        dy = dy.astype(in_dt)
        r, s, _, c_ = wr.shape
        p2h, p2w = d.r - 1 - d.pad_h, d.s - 1 - d.pad_w
        upcast = in_dt == jnp.dtype(jnp.float32)
        pref = jnp.float32 if upcast else None
        fh = 2 if (c_ <= 32 and dy.shape[1] >= 2 * r) else 1
        fw = 2 if (c_ <= 64 and dy.shape[2] >= 2 * s) else 1
        if fh == 1 and fw == 1:
            dx = jax.lax.conv_general_dilated(
                dy, wr, (1, 1), ((p2h, p2h), (p2w, p2w)),
                dimension_numbers=_DN, precision=_prec(d.in_dtype),
                preferred_element_type=pref)
            return dx.astype(jnp.float32)
        w2 = jnp.zeros((r + fh - 1, s + fw - 1, wr.shape[2],
                        fh * fw * c_), wr.dtype)
        for dyo in range(fh):
            for dxo in range(fw):
                blk = (dyo * fw + dxo) * c_
                w2 = w2.at[dyo:dyo + r, dxo:dxo + s, :,
                           blk:blk + c_].set(wr)
        y2 = jax.lax.conv_general_dilated(
            dy, w2, (fh, fw), ((p2h, p2h + fh - 1), (p2w, p2w + fw - 1)),
            dimension_numbers=_DN, precision=_prec(d.in_dtype),
            preferred_element_type=pref)
        n_, h_, w_, _ = y2.shape
        dx = (y2.reshape(n_, h_, w_, fh, fw, c_)
              .transpose(0, 1, 3, 2, 4, 5)
              .reshape(n_, h_ * fh, w_ * fw, c_))
        oh = dy.shape[1] + 2 * p2h - r + 1
        ow = dy.shape[2] + 2 * p2w - s + 1
        return dx[:, :oh, :ow].astype(jnp.float32)

    def _plain_conv(self, x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=self._strides, padding=self._pad,
            dimension_numbers=_DN, precision=_prec(self.desc.in_dtype),
            preferred_element_type=jnp.float32)

    def _bwd_impl(self, dy, w, y=None):
        d = self.desc
        dy = _to_nhwc(dy.astype(jnp.float32), d.buffer_format)
        if y is not None:
            y = _to_nhwc(y.astype(jnp.float32), d.buffer_format)
        if y is not None and d.fuse_ops & FuseOp.RELU_BWD:
            # RELU_BWD fusion: mask incoming grads by the forward activation
            # before the transposed conv (fused ReLU-bwd templates analog)
            dy = jnp.where(y > 0, dy, 0.0)
        extras = []
        if d.fuse_ops & FuseOp.ELTWISE_BWD:
            # the fused residual add's input gradient is the (masked) dy
            extras.append(_from_nhwc(dy.astype(jnp.dtype(d.in_dtype)),
                                     d.buffer_format))
        w = _to_hwio(w.astype(jnp.float32), d.filter_format)
        if (d.u == 1 and d.v == 1 and d.r - 1 - d.pad_h >= 0
                and d.s - 1 - d.pad_w >= 0):
            # direct transposed-filter conv (bit-exact vs the VJP for
            # stride 1) so the narrow-C space-to-depth fold applies to the
            # backward pass too: measured 47.8 -> 137.8 TF bf16 (2.88x) on
            # the C64/K64 layer, where the VJP formulation is lane-starved
            # on its C output channels
            dx = self._bwd_direct(dy, w)
        else:
            x0 = jnp.zeros((d.n, d.h, d.w, d.c), jnp.float32)
            _, vjp = jax.vjp(lambda x_: self._plain_conv(x_, w), x0)
            dx = vjp(dy)[0]
        if d.fuse_ops & FuseOp.BATCH_STATS_BWD:
            stats = BwdStats(
                dbeta=jnp.sum(dy, axis=(0, 1, 2)),
                dgamma_y=jnp.sum(dy * y, axis=(0, 1, 2)),
                dx_absmax=(jnp.max(jnp.abs(dx), axis=(0, 1, 2))
                           if d.fuse_ops & FuseOp.MAX_STATS else None))
            extras.append(stats)
        dx = _from_nhwc(dx.astype(jnp.dtype(d.in_dtype)), d.buffer_format)
        return (dx, *extras) if extras else dx

    def backward(self, dy, w, y=None):
        """dx; with fusions the return is (dx[, d_eltwise][, BwdStats]).

        Pass y with RELU_BWD (activation mask) or BATCH_STATS_BWD (the
        fused BN-backward reductions need the forward output)."""
        needs_y = self.desc.fuse_ops & (FuseOp.RELU_BWD
                                        | FuseOp.BATCH_STATS_BWD)
        if needs_y:
            if y is None:
                raise ValueError(
                    "RELU_BWD / BATCH_STATS_BWD fusions require the "
                    "forward activation y")
            return self._bwd(dy, w, y)
        return self._bwd(dy, w)

    def _upd_impl(self, x, dy):
        d = self.desc
        x = _to_nhwc(x.astype(jnp.float32), d.buffer_format)
        dy = _to_nhwc(dy.astype(jnp.float32), d.buffer_format)
        w0 = jnp.zeros((d.r, d.s, d.c, d.k), jnp.float32)
        _, vjp = jax.vjp(lambda w_: self._plain_conv(x, w_), w0)
        dw = vjp(dy)[0].astype(jnp.dtype(d.in_dtype))
        return _from_hwio(dw, d.filter_format)

    def weight_update(self, x, dy):
        return self._upd(x, dy)

    # -- reference-style execute ------------------------------------------------
    def execute(self, kind: Kind, **tensors):
        """libxsmm_dnn_execute_st analog (functional: returns results)."""
        if kind == Kind.FWD:
            return self.forward(tensors["input"], tensors["filter"],
                                tensors.get("bias"))
        if kind == Kind.BWD:
            return self.backward(tensors["grad_output"], tensors["filter"],
                                 tensors.get("output"))
        if kind == Kind.UPD:
            return self.weight_update(tensors["input"],
                                      tensors["grad_output"])
        raise ValueError(kind)


def create_conv_layer(desc: ConvDesc) -> ConvLayer:
    """libxsmm_dnn_create_conv_layer analog."""
    return ConvLayer(desc)
