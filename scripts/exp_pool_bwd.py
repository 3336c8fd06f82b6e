#!/usr/bin/env python
"""Max-pool backward study (round 3): select-and-scatter VJP vs elementwise
mask rebuild for non-overlapping windows.

The layer_driver config (2x2 stride-2, pad 0) has non-overlapping windows:
every input element belongs to exactly one window, so the backward is a
pure elementwise pass — dx = dy[window] where x is the window argmax (ties:
first in row-major window order, matching XLA SelectAndScatter / the
reference's stored-argmax semantics, libxsmm_dnn_pooling_backward.c) — with
no scatter at all.  XLA's generic select-and-scatter VJP cannot see this.

Variants (N64 C256 H56 W56 f32, the layer_driver shape):
  v0  jax.vjp(reduce_window max)         — current path
  v1  mask, all ties share dy            — lower bound on kernel cost
  v2  mask, tie-first via exclusive window prefix — semantics-exact
Byte model for all: read x + read dy + write dx = (2*nin + nout)*4.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import xsmm_tpu as xt
from xsmm_tpu.utils.timer import device_bench

N, C, H, W = 64, 256, 56, 56
R = S = U = V = 2

dims, strides = (1, R, S, 1), (1, U, V, 1)
pads = ((0, 0), (0, 0), (0, 0), (0, 0))


def fwd(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strides, pads)


@jax.jit
def v0_vjp(dy, x):
    _, vjp = jax.vjp(fwd, x)
    return vjp(dy)[0]


def _window_view(x):
    n, h, w, c = x.shape
    return x.reshape(n, h // U, U, w // V, V, c)


@jax.jit
def v1_mask(dy, x):
    xr = _window_view(x)
    m = jnp.max(xr, axis=(2, 4), keepdims=True)
    dyb = dy[:, :, None, :, None, :]
    return jnp.where(xr == m, dyb, 0.0).reshape(x.shape)


@jax.jit
def v2_mask_first(dy, x):
    xr = _window_view(x)
    m = jnp.max(xr, axis=(2, 4), keepdims=True)
    eq = xr == m
    eqf = eq.astype(jnp.float32)
    # exclusive count of earlier `eq` in row-major window order:
    row_excl = jnp.cumsum(eqf, axis=4) - eqf
    row_tot = jnp.sum(eqf, axis=4, keepdims=True)
    prev_rows = jnp.cumsum(row_tot, axis=2) - row_tot
    first = eq & ((row_excl + prev_rows) == 0.0)
    dyb = dy[:, :, None, :, None, :]
    return jnp.where(first, dyb, 0.0).reshape(x.shape)


@jax.jit
def v3_slices(dy, x):
    # no 6-D reshape (rule 2: the (..,2,C) view makes sublane dim 2-wide);
    # four layout-friendly strided slices instead, all-ties semantics
    sl = [x[:, i::U, j::V, :] for i in range(U) for j in range(V)]
    m = sl[0]
    for s in sl[1:]:
        m = jnp.maximum(m, s)
    dx = jnp.zeros_like(x)
    for k, (i, j) in enumerate((i, j) for i in range(U) for j in range(V)):
        dx = dx.at[:, i::U, j::V, :].set(jnp.where(sl[k] == m, dy, 0.0))
    return dx


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, H, W, C), jnp.float32)
    dy = jax.random.normal(jax.random.PRNGKey(1), (N, H // U, W // V, C),
                           jnp.float32)
    gold = v0_vjp(dy, x)
    for name, fn in (("v0_vjp", v0_vjp), ("v1_mask", v1_mask),
                     ("v2_mask_first", v2_mask_first),
                     ("v3_slices", v3_slices)):
        err = float(jnp.max(jnp.abs(fn(dy, x) - gold)))
        nin, nout = N * H * W * C, N * (H // U) * (W // V) * C
        nbytes = (2 * nin + nout) * 4
        if xt.platform.is_tpu():
            # feedback dx -> x forces dx materialization each iteration;
            # dy[0] <- dx[0] makes the fetched first-leaf scalar depend on
            # the loop (device_bench reads leaf 0 of the final args)
            def fb(o, a):
                dy0, _x0 = a
                dy1 = dy0.at[(0,) * dy0.ndim].set(
                    o[(0,) * o.ndim].astype(dy0.dtype))
                return (dy1, o)
            dt = device_bench(fn, dy, x, feedback=fb)
        else:
            dt, _ = xt.timer.bench(fn, dy, x, warmup=1, iters=3)
        print(f"{name}: {dt*1e3:.3f} ms  {nbytes/dt/1e9:.1f} GB/s  "
              f"maxerr_vs_v0={err:.2e}")


if __name__ == "__main__":
    main()
