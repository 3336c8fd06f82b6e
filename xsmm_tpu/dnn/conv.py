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


class BatchStats(NamedTuple):
    """Per-channel sums produced by BATCH_STATS_FWD fusion."""

    sum: jax.Array     # [K]
    sumsq: jax.Array   # [K]


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
        self._fwd = jax.jit(self._fwd_impl)
        self._bwd = jax.jit(self._bwd_impl)
        self._upd = jax.jit(self._upd_impl)

    # -- FWD -----------------------------------------------------------------
    def _fwd_impl(self, x, w, bias=None):
        d = self.desc
        x = _to_nhwc(x.astype(jnp.dtype(d.in_dtype)), d.buffer_format)
        w = _to_hwio(w.astype(jnp.dtype(d.in_dtype)), d.filter_format)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=self._strides, padding=self._pad,
            dimension_numbers=_DN, precision=_prec(d.in_dtype),
            preferred_element_type=jnp.float32)
        if d.fuse_ops & FuseOp.BIAS:
            if bias is None:
                raise ValueError("BIAS fusion requires bias operand")
            y = y + bias.astype(y.dtype)
        if d.fuse_ops & FuseOp.RELU:
            y = jnp.maximum(y, 0.0)
        stats = None
        if d.fuse_ops & FuseOp.BATCH_STATS_FWD:
            stats = BatchStats(jnp.sum(y, axis=(0, 1, 2)),
                               jnp.sum(y * y, axis=(0, 1, 2)))
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
    def _plain_conv(self, x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=self._strides, padding=self._pad,
            dimension_numbers=_DN, precision=_prec(self.desc.in_dtype),
            preferred_element_type=jnp.float32)

    def _bwd_impl(self, dy, w, y=None):
        d = self.desc
        dy = _to_nhwc(dy.astype(jnp.float32), d.buffer_format)
        if y is not None:
            # RELU_BWD fusion: mask incoming grads by the forward activation
            # before the transposed conv (fused ReLU-bwd templates analog)
            y = _to_nhwc(y, d.buffer_format)
            dy = jnp.where(y > 0, dy, 0.0)
        w = _to_hwio(w.astype(jnp.float32), d.filter_format)
        x0 = jnp.zeros((d.n, d.h, d.w, d.c), jnp.float32)
        _, vjp = jax.vjp(lambda x_: self._plain_conv(x_, w), x0)
        dx = vjp(dy)[0].astype(jnp.dtype(d.in_dtype))
        return _from_nhwc(dx, d.buffer_format)

    def backward(self, dy, w, y=None):
        """dx; pass y with RELU_BWD fusion to mask by the activation."""
        if self.desc.fuse_ops & FuseOp.RELU_BWD:
            if y is None:
                raise ValueError("RELU_BWD fusion requires the forward "
                                 "activation y")
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
