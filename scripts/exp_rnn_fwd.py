#!/usr/bin/env python
"""LSTM forward bound study (round 3 — the 73%-of-peak forwards).

Variants at N128 C512 K512 T32 "bf16" (in_dtype bfloat16 semantics: f32
storage, native single-pass MXU):

  a) current RnnCell._fwd        fused [x,h]@[W;R] inside lax.scan
  b) hoisted XLA                 zx = x@W one big GEMM; scan does h@R only
  c) pallas scan-fused           zx big GEMM + grid-(T,) kernel: R stays
                                 VMEM-resident across steps, gates fused
  d) one-GEMM ceiling            [T*N, C+K] @ [C+K, 4K] (same FLOPs as a)

Run:  python scripts/exp_rnn_fwd.py [N C K T]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import xsmm_tpu as xt
from xsmm_tpu.utils.timer import device_bench

xt.enable_compile_cache()


def _lstm_seq_kernel(zx_ref, r_ref, h0_ref, c0_ref,
                     hs_ref, ht_ref, ct_ref, h_scr, c_scr, *, k, nt,
                     train_refs=()):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    h = h_scr[:]
    c = c_scr[:]
    z = zx_ref[0] + jax.lax.dot_general(
        h.astype(r_ref.dtype), r_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(z[:, 0 * k:1 * k])
    g = jnp.tanh(z[:, 1 * k:2 * k])
    f = jax.nn.sigmoid(z[:, 2 * k:3 * k])
    o = jax.nn.sigmoid(z[:, 3 * k:4 * k])
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)
    h_scr[:] = h2
    c_scr[:] = c2
    hs_ref[0] = h2.astype(hs_ref.dtype)

    @pl.when(ti == nt - 1)
    def _():
        ht_ref[:] = h2
        ct_ref[:] = c2


def _lstm_seq_kernel_train(zx_ref, r_ref, h0_ref, c0_ref,
                           hs_ref, ht_ref, ct_ref,
                           cs_ref, is_ref, gs_ref, fs_ref, os_ref,
                           h_scr, c_scr, *, k, nt):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    h = h_scr[:]
    c = c_scr[:]
    z = zx_ref[0] + jax.lax.dot_general(
        h.astype(r_ref.dtype), r_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(z[:, 0 * k:1 * k])
    g = jnp.tanh(z[:, 1 * k:2 * k])
    f = jax.nn.sigmoid(z[:, 2 * k:3 * k])
    o = jax.nn.sigmoid(z[:, 3 * k:4 * k])
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)
    h_scr[:] = h2
    c_scr[:] = c2
    hs_ref[0] = h2.astype(hs_ref.dtype)
    cs_ref[0] = c2
    is_ref[0] = i
    gs_ref[0] = g
    fs_ref[0] = f
    os_ref[0] = o

    @pl.when(ti == nt - 1)
    def _():
        ht_ref[:] = h2
        ct_ref[:] = c2


def make_pallas_fwd(n, c_in, k, t, train=False):
    from xsmm_tpu.ops.pallas_util import pallas_call

    def fwd(xt_, w, r, b, h0, c0):
        zx = (jnp.matmul(xt_.reshape(t * n, c_in), w,
                         preferred_element_type=jnp.float32) + b
              ).reshape(t, n, 4 * k)
        rb = r.astype(jnp.bfloat16)
        step_specs = [pl.BlockSpec((1, n, 4 * k), lambda ti: (ti, 0, 0),
                                   memory_space=pltpu.VMEM)]
        const2 = lambda ti: (0, 0)
        in_specs = step_specs + [
            pl.BlockSpec((k, 4 * k), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), const2, memory_space=pltpu.VMEM),
        ]
        out_step = pl.BlockSpec((1, n, k), lambda ti: (ti, 0, 0),
                                memory_space=pltpu.VMEM)
        out_const = pl.BlockSpec((n, k), const2, memory_space=pltpu.VMEM)
        if train:
            kern = functools.partial(_lstm_seq_kernel_train, k=k, nt=t)
            out_specs = [out_step, out_const, out_const] + [out_step] * 5
            out_shape = ([jax.ShapeDtypeStruct((t, n, k), jnp.float32),
                          jax.ShapeDtypeStruct((n, k), jnp.float32),
                          jax.ShapeDtypeStruct((n, k), jnp.float32)]
                         + [jax.ShapeDtypeStruct((t, n, k), jnp.float32)] * 5)
        else:
            kern = functools.partial(_lstm_seq_kernel, k=k, nt=t)
            out_specs = [out_step, out_const, out_const]
            out_shape = [jax.ShapeDtypeStruct((t, n, k), jnp.float32),
                         jax.ShapeDtypeStruct((n, k), jnp.float32),
                         jax.ShapeDtypeStruct((n, k), jnp.float32)]
        return pallas_call(
            kern,
            grid=(t,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((n, k), jnp.float32),
                            pltpu.VMEM((n, k), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(zx, rb, h0, c0)

    return jax.jit(fwd)


def make_hoisted(n, c_in, k, t):
    def fwd(xt_, w, r, b, h0, c0):
        zx = (jnp.matmul(xt_.reshape(t * n, c_in), w,
                         preferred_element_type=jnp.float32) + b
              ).reshape(t, n, 4 * k)

        def body(carry, zx_t):
            h, c = carry
            z = zx_t + jnp.matmul(h, r,
                                  preferred_element_type=jnp.float32)
            i = jax.nn.sigmoid(z[:, 0 * k:1 * k])
            g = jnp.tanh(z[:, 1 * k:2 * k])
            f = jax.nn.sigmoid(z[:, 2 * k:3 * k])
            o = jax.nn.sigmoid(z[:, 3 * k:4 * k])
            c2 = f * c + i * g
            h2 = o * jnp.tanh(c2)
            return (h2, c2), h2

        (h_t, c_t), hs = jax.lax.scan(body, (h0, c0), zx)
        return hs, h_t, c_t

    return jax.jit(fwd)


def main():
    a = [int(x) for x in sys.argv[1:] if x.isdigit()]
    n, c_in, k, t = a[:4] if len(a) >= 4 else (128, 512, 512, 32)
    flops = 2.0 * t * n * (c_in + k) * 4 * k
    key = jax.random.PRNGKey(0)
    xt_ = jax.random.normal(key, (t, n, c_in), jnp.float32)
    w = jax.random.normal(key, (c_in, 4 * k), jnp.float32) * 0.1
    r = jax.random.normal(key, (k, 4 * k), jnp.float32) * 0.1
    b = jnp.zeros((4 * k,), jnp.float32)
    h0 = jnp.zeros((n, k), jnp.float32)
    c0 = jnp.zeros((n, k), jnp.float32)

    def report(tag, dt):
        print(f"{tag}: {dt * 1e3:.3f} ms  TF = {flops / dt / 1e12:.1f}")

    # -- a) current cell
    from xsmm_tpu.dnn import CellType, RnnDesc, create_rnncell
    cell = create_rnncell(RnnDesc(n=n, c=c_in, k=k, max_t=t,
                                  cell_type=CellType.LSTM,
                                  in_dtype="bfloat16",
                                  out_dtype="bfloat16"))
    gold = cell._fwd(xt_, w, r, b, h0, c0)
    report("a_current", device_bench(cell._fwd, xt_, w, r, b, h0, c0))

    # -- b) hoisted XLA
    fb = make_hoisted(n, c_in, k, t)
    out_b = fb(xt_, w, r, b, h0, c0)
    err = float(jnp.max(jnp.abs(out_b[0].astype(jnp.float32)
                                - gold[0].astype(jnp.float32))))
    print("  b max|diff| vs a:", err)
    report("b_hoisted", device_bench(fb, xt_, w, r, b, h0, c0))

    # -- c) pallas scan-fused (inference + train variants)
    fc = make_pallas_fwd(n, c_in, k, t, train=False)
    out_c = fc(xt_, w, r, b, h0, c0)
    err = float(jnp.max(jnp.abs(out_c[0] - gold[0].astype(jnp.float32))))
    print("  c max|diff| vs a:", err)
    report("c_pallas_inf", device_bench(fc, xt_, w, r, b, h0, c0,
                                        probe="elem"))
    fct = make_pallas_fwd(n, c_in, k, t, train=True)
    out_ct = fct(xt_, w, r, b, h0, c0)
    err = float(jnp.max(jnp.abs(out_ct[0] - gold[0].astype(jnp.float32))))
    print("  c_train max|diff| vs a:", err)
    report("c_pallas_train", device_bench(fct, xt_, w, r, b, h0, c0,
                                          probe="elem"))

    # -- d) one-GEMM ceiling
    xh = jax.random.normal(key, (t * n, c_in + k), jnp.float32)
    wr = jnp.concatenate([w, r], axis=0)

    @jax.jit
    def one_gemm(xh_, wr_):
        return jnp.matmul(xh_, wr_, preferred_element_type=jnp.float32)

    report("d_one_gemm", device_bench(one_gemm, xh, wr))


if __name__ == "__main__":
    main()
