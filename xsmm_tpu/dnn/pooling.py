"""Pooling layer (max / avg), fwd + bwd.

Reference: src/libxsmm_dnn_pooling*.c — max pooling tracks an argmax mask in
the fwd pass for the bwd scatter; avg pooling scatters uniformly.

TPU-native: lax.reduce_window for fwd; bwd via the VJP of the same window
reduction (XLA emits the select-and-scatter / uniform-scatter kernels).
NHWC activations.

Round-4 max-bwd Pallas window kernel: EXAMINED AND REJECTED (measured;
perf_notes "Max-pool backward study", round-4 addendum).  The [N*H/2,
2*W*C] layout trick makes every window element a static contiguous
C-wide lane slice and the kernel reproduces select-and-scatter
BIT-exactly (first-match tie routing), but on chip it measures 228-232
GB/s forced vs the VJP's 360-420 — kernel-internal compute/issue limits,
not traffic (a same-structure pure copy runs 727-766 GB/s), and both a
112-narrow-slice variant and a full-width pltpu.roll variant land at the
same 232.  XLA's select-and-scatter stays the default lowering; the
window kernel remains available via XSMM_POOL_WINDOW_KERNEL=1 as the
measured artifact (and the interpret-mode reference of the tie
semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import platform
from .types import Kind, PoolingDesc, PoolType


def _maxpool2x2_bwd_pallas(n, h, w, c):
    """dx for 2x2/stride-2 unpadded max pool, NHWC, C%128==0, H,W even."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..ops.pallas_util import pallas_call

    rows = n * h // 2           # row pairs
    wc = w * c
    hw2 = w // 2
    # block rows: ~2MB x-block (8*wc bytes per row pair — the 2-4MB
    # streaming sweet spot, perf_notes), shrunk to divide the grid
    br = max(1, min(rows, (2 << 20) // max(8 * wc, 1)))
    br = max(1, br // 8 * 8) if br >= 8 else br
    while rows % br:
        br -= 1

    def kernel(x_ref, dy_ref, o_ref):
        xe = x_ref[:, :wc]
        xo = x_ref[:, wc:]
        for wi in range(hw2):
            a, b = 2 * wi * c, (2 * wi + 1) * c
            ea = xe[:, a:a + c]
            eb = xe[:, b:b + c]
            oa = xo[:, a:a + c]
            ob = xo[:, b:b + c]
            m = jnp.maximum(jnp.maximum(ea, eb), jnp.maximum(oa, ob))
            g = dy_ref[:, wi * c:(wi + 1) * c]
            # first-match tie routing, row-major window order
            m1 = ea >= m
            m2 = (eb >= m) & ~m1
            m12 = m1 | m2
            m3 = (oa >= m) & ~m12
            m4 = (ob >= m) & ~(m12 | m3)
            z = jnp.zeros_like(g)
            o_ref[:, a:a + c] = jnp.where(m1, g, z)
            o_ref[:, b:b + c] = jnp.where(m2, g, z)
            o_ref[:, wc + a:wc + a + c] = jnp.where(m3, g, z)
            o_ref[:, wc + b:wc + b + c] = jnp.where(m4, g, z)

    @jax.jit
    def run(dy, x):
        x2 = x.astype(jnp.float32).reshape(rows, 2 * wc)
        dy2 = dy.astype(jnp.float32).reshape(rows, hw2 * c)
        dx = pallas_call(
            kernel,
            grid=(rows // br,),
            in_specs=[pl.BlockSpec((br, 2 * wc), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((br, hw2 * c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((br, 2 * wc), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 2 * wc), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=14 * rows * wc, transcendentals=0,
                bytes_accessed=(2 * wc + hw2 * c + 2 * wc) * rows * 4),
        )(x2, dy2)
        return dx.reshape(n, h, w, c)

    return run


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

        import os
        use_window_kernel = (
            os.environ.get("XSMM_POOL_WINDOW_KERNEL", "0") == "1"
            and d.pool_type == PoolType.MAX
            and (d.r, d.s, d.u, d.v) == (2, 2, 2, 2)
            and d.pad_h == 0 and d.pad_w == 0
            and d.h % 2 == 0 and d.w % 2 == 0 and d.c % 128 == 0
            and (platform.is_tpu() or platform.interpret_mode()))
        if use_window_kernel:
            self._bwd = _maxpool2x2_bwd_pallas(d.n, d.h, d.w, d.c)
            self.bwd_kind = "pallas_window"
        else:
            @jax.jit
            def bwd(dy, x):
                _, vjp = jax.vjp(fwd, x.astype(jnp.float32))
                return vjp(dy.astype(jnp.float32))[0]

            self._bwd = bwd
            self.bwd_kind = "vjp"

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
