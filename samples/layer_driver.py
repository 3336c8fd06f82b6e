#!/usr/bin/env python
"""FC / pooling / fused-BN layer perf drivers.

  python samples/layer_driver.py [fc|pooling|bn|all] [dtype]

Analogs of samples/deeplearning/{fullyconnecteddriver,poolingdriver,
fusedbndriver} — driver-printed GFLOPS/GB-s for the three layer kinds that
previously had correctness tests but no perf numbers (VERDICT r2 missing
#5).  Default shapes are the reference drivers' canonical configs (fc:
MLP-sized GEMM; pooling: ResNet stage; BN: ResNet stage with ReLU).

FLOP/byte models:
  fc       2*N*C*K per pass (fwd; bwd dx; upd dw)
  pooling  bandwidth-bound: bytes = in + out (fwd), reported GB/s
  bn       bandwidth-bound: fwd reads x (2 passes: stats + normalize,
           fused conv-BN removes one — dnn/layers._build_conv_bn) and
           writes y; reported GB/s + "effective" GFLOPS (the reference
           fusedbndriver prints GB/s too)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from _common import measure
import xsmm_tpu as xt
from xsmm_tpu.dnn import (BnDesc, BnFuse, FCDesc, FuseOp, PoolingDesc,
                          PoolType, create_fullyconnected_layer,
                          create_fusedbatchnorm, create_pooling_layer)


def drive_fc(dtype):
    n, c, k = (1024, 4096, 4096) if xt.platform.is_tpu() else (64, 128, 128)
    d = FCDesc(n=n, c=c, k=k, in_dtype=dtype, out_dtype=dtype,
               fuse_ops=FuseOp.BIAS | FuseOp.RELU)
    layer = create_fullyconnected_layer(d)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, c), jnp.float32)
    w = jax.random.normal(key, (c, k), jnp.float32) * 0.02
    b = jnp.zeros((k,), jnp.float32)
    flops = 2.0 * n * c * k
    measure(layer._fwd, x, w, b, flops=flops,
            label=f"fc fwd {dtype} N{n} C{c} K{k} (bias+relu)")
    y, mask = layer._fwd(x, w, b)
    dy = jax.random.normal(key, (n, k), jnp.float32)
    measure(layer._bwd, dy, w, mask, flops=flops, label="fc bwd")
    measure(layer._upd, x, dy, mask, flops=flops, label="fc upd")


def drive_pooling(dtype):
    n, c, h, w = (64, 256, 56, 56) if xt.platform.is_tpu() else (4, 16, 14, 14)
    for op in (PoolType.MAX, PoolType.AVG):
        d = PoolingDesc(n=n, c=c, h=h, w=w, r=2, s=2, u=2, v=2,
                        pad_h=0, pad_w=0, pool_type=op, dtype=dtype)
        layer = create_pooling_layer(d)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, h, w, c), jnp.float32)
        isz = 2 if dtype == "bfloat16" else 4
        # count only the guaranteed input read: the out write can fuse
        # into the sum probe (CLAUDE.md rule 11)
        nbytes = n * h * w * c * isz
        measure(layer._fwd, x, nbytes=nbytes,
                label=f"pooling {op.value} fwd (input-read rate) "
                      f"{dtype} N{n} C{c} H{h} 2x2s2")
        dy = jax.random.normal(key, (n, d.out_h, d.out_w, c), jnp.float32)
        # bwd traffic: read dy [out] + write dx [in]; max also re-reads x
        # to rebuild the argmax mask
        nin, nout = n * h * w * c, n * d.out_h * d.out_w * c
        if op is PoolType.MAX:
            # pipeline-fused regime (default probe; dx write may overlap
            # the next chained iteration) AND forced-materialization
            # regime (dx fed back as x) — perf_notes "Max-pool backward
            # study": select-and-scatter beats every elementwise rebuild
            measure(layer._bwd, dy, x, nbytes=(nout + 2 * nin) * isz,
                    label=f"pooling {op.value} bwd (pipeline-fused)")

            def fb(o, a):
                dy0 = a[0].at[(0,) * a[0].ndim].set(
                    o[(0,) * o.ndim].astype(a[0].dtype))
                return (dy0, o.astype(a[1].dtype))
            measure(layer._bwd, dy, x, nbytes=(nout + 2 * nin) * isz,
                    label=f"pooling {op.value} bwd (forced dx write)",
                    feedback=fb)
        else:
            # avg bwd is a broadcast of dy/(r*s): XLA simplifies any
            # reduction of it away, so a standalone GB/s number would be
            # fictitious (the op only materializes fused into consumers)
            measure(layer._bwd, dy, x,
                    label=f"pooling {op.value} bwd (fuses to broadcast; "
                          f"no standalone HBM pass)")


def drive_bn(dtype):
    n, c, h, w = (64, 256, 56, 56) if xt.platform.is_tpu() else (4, 16, 14, 14)
    d = BnDesc(n=n, c=c, h=h, w=w, fuse=BnFuse.RELU, dtype=dtype)
    layer = create_fusedbatchnorm(d)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, h, w, c), jnp.float32)
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)
    isz = 2 if dtype == "bfloat16" else 4
    elems = n * h * w * c
    # fwd: stats pass reads x, normalize pass reads x + writes y.
    # Output->input feedback forces y's materialization (CLAUDE.md rule
    # 11: the sum probe alone lets XLA fuse y's write away)
    nbytes = 3 * elems * isz
    measure(layer._fwd, x, gamma, beta, nbytes=nbytes,
            label=f"fusedbn fwd+relu {dtype} N{n} C{c} H{h}",
            feedback=lambda o, a: (o[0].astype(a[0].dtype),) + a[1:])
    _y, state = layer._fwd(x, gamma, beta)
    dy = jax.random.normal(key, (n, h, w, c), jnp.float32)
    measure(layer._bwd, dy, gamma, state, nbytes=4 * elems * isz,
            label="fusedbn bwd",
            feedback=lambda o, a: (o[0].astype(a[0].dtype),) + a[1:])
    # inference path: one elementwise pass (global stats, no reductions).
    # The output must feed the next iteration's INPUT: y is an affine map
    # of x, and with only a sum-probe XLA rewrites sum(y) to an affine map
    # of sum(x) and never materializes y (measured 1481 "GB/s" before
    # this feedback — the same elision class as the config-#2 roofline
    # audit, perf_notes.md "byte-model honesty")
    running = layer.update_running(layer.init_running(), state)
    measure(layer._fwd_eval, x, gamma, beta, running, nbytes=2 * elems * isz,
            label="fusedbn eval (global stats)",
            feedback=lambda out, a: (out.astype(a[0].dtype),) + a[1:])


def main():
    args = sys.argv[1:]
    which = next((a for a in args if a in ("fc", "pooling", "bn")), "all")
    dtype = next((a for a in args if a in ("float32", "bfloat16")),
                 "float32")
    if which in ("fc", "all"):
        drive_fc(dtype)
    if which in ("pooling", "all"):
        drive_pooling(dtype)
    if which in ("bn", "all"):
        drive_bn(dtype)


if __name__ == "__main__":
    main()
