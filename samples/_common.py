"""Shared helpers for sample drivers (GFLOPS printing like the reference's
layer_example_f32.c:905 'GFLOPS = ...' lines)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import xsmm_tpu as xt
from xsmm_tpu.utils.timer import device_bench

xt.enable_compile_cache()


def measure(fn, *args, flops=0, nbytes=0, label="", probe="sum", **bench_kw):
    if xt.platform.is_tpu():
        dt = device_bench(fn, *args, probe=probe, **bench_kw)
    else:
        dt, _ = xt.timer.bench(fn, *args, warmup=1, iters=3)
    line = f"{label}: {dt * 1e3:.3f} ms"
    if flops:
        line += f"  GFLOPS = {flops / dt / 1e9:.1f}"
    if nbytes:
        line += f"  GB/s = {nbytes / dt / 1e9:.1f}"
    print(line)
    return dt
