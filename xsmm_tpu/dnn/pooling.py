"""Pooling layer (max / avg), fwd + bwd.

Reference: src/libxsmm_dnn_pooling*.c — max pooling tracks an argmax mask in
the fwd pass for the bwd scatter; avg pooling scatters uniformly.

TPU-native: lax.reduce_window for fwd; bwd via the VJP of the same window
reduction (XLA emits the select-and-scatter / uniform-scatter kernels).
NHWC activations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import Kind, PoolingDesc, PoolType


class PoolingLayer:
    def __init__(self, desc: PoolingDesc):
        self.desc = desc
        d = desc
        dims = (1, d.r, d.s, 1)
        strides = (1, d.u, d.v, 1)
        pads = ((0, 0), (d.pad_h, d.pad_h), (d.pad_w, d.pad_w), (0, 0))

        def fwd(x):
            x = x.astype(jnp.float32)
            if d.pool_type == PoolType.MAX:
                return jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, dims, strides, pads)
            s = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, dims, strides, pads)
            return s / (d.r * d.s)

        self._fwd = jax.jit(fwd)

        @jax.jit
        def bwd(dy, x):
            _, vjp = jax.vjp(fwd, x.astype(jnp.float32))
            return vjp(dy.astype(jnp.float32))[0]

        self._bwd = bwd

    def forward(self, x):
        return self._fwd(x).astype(jnp.dtype(self.desc.dtype))

    def backward(self, dy, x):
        """dx; x is the fwd input (replaces the reference's stored mask)."""
        return self._bwd(dy, x).astype(jnp.dtype(self.desc.dtype))

    def execute(self, kind: Kind, **t):
        if kind == Kind.FWD:
            return self.forward(t["input"])
        if kind == Kind.BWD:
            return self.backward(t["grad_output"], t["input"])
        raise ValueError(kind)


def create_pooling_layer(desc: PoolingDesc) -> PoolingLayer:
    return PoolingLayer(desc)
