"""Fully-connected layer handle (fwd / bwd / upd).

Reference: src/libxsmm_dnn_fullyconnected*.c — dense layer over blocked
formats driven by batch-reduce GEMM kernels.  On TPU the three kinds are
three MXU matmuls (the brgemm blocking is XLA's tiling):

  FWD: y[N,K] = x[N,C] @ w[C,K] (+ bias, ReLU fusions)
  BWD: dx = dy @ w^T
  UPD: dw = x^T @ dy
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import FCDesc, FuseOp, Kind


def _prec(dt):
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dt) == jnp.float32 else None)


class FullyConnectedLayer:
    def __init__(self, desc: FCDesc):
        self.desc = desc
        d = desc

        @jax.jit
        def fwd(x, w, bias=None):
            y = jnp.matmul(x.astype(jnp.dtype(d.in_dtype)),
                           w.astype(jnp.dtype(d.in_dtype)),
                           preferred_element_type=jnp.float32,
                           precision=_prec(d.in_dtype))
            if d.fuse_ops & FuseOp.BIAS:
                y = y + bias.astype(y.dtype)
            relu_mask = None
            if d.fuse_ops & FuseOp.RELU:
                relu_mask = y > 0
                y = jnp.maximum(y, 0.0)
            y = y.astype(jnp.dtype(d.out_dtype))
            return (y, relu_mask) if relu_mask is not None else y

        @jax.jit
        def bwd(dy, w, relu_mask=None):
            dy = dy.astype(jnp.float32)
            if relu_mask is not None:
                dy = jnp.where(relu_mask, dy, 0.0)
            dx = jnp.matmul(dy, w.astype(jnp.float32).T,
                            preferred_element_type=jnp.float32,
                            precision=_prec(d.in_dtype))
            return dx.astype(jnp.dtype(d.in_dtype))

        @jax.jit
        def upd(x, dy, relu_mask=None):
            dy = dy.astype(jnp.float32)
            if relu_mask is not None:
                dy = jnp.where(relu_mask, dy, 0.0)
            dw = jnp.matmul(x.astype(jnp.float32).T, dy,
                            preferred_element_type=jnp.float32,
                            precision=_prec(d.in_dtype))
            db = jnp.sum(dy, axis=0)
            return dw.astype(jnp.dtype(d.in_dtype)), db

        self._fwd, self._bwd, self._upd = fwd, bwd, upd

    def forward(self, x, w, bias=None):
        if self.desc.fuse_ops & FuseOp.BIAS and bias is None:
            raise ValueError("BIAS fusion requires bias operand")
        return self._fwd(x, w, bias) if bias is not None else self._fwd(x, w)

    def backward(self, dy, w, relu_mask=None):
        return self._bwd(dy, w, relu_mask) if relu_mask is not None \
            else self._bwd(dy, w)

    def weight_update(self, x, dy, relu_mask=None):
        return self._upd(x, dy, relu_mask) if relu_mask is not None \
            else self._upd(x, dy)

    def execute(self, kind: Kind, **t):
        if kind == Kind.FWD:
            return self.forward(t["input"], t["filter"], t.get("bias"))
        if kind == Kind.BWD:
            return self.backward(t["grad_output"], t["filter"],
                                 t.get("relu_mask"))
        if kind == Kind.UPD:
            return self.weight_update(t["input"], t["grad_output"],
                                      t.get("relu_mask"))
        raise ValueError(kind)


def create_fullyconnected_layer(desc: FCDesc) -> FullyConnectedLayer:
    return FullyConnectedLayer(desc)
