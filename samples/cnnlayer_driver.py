#!/usr/bin/env python
"""Conv layer driver (samples/deeplearning/cnnlayer/layer_example_f32.c
analog): fwd/bwd/upd GFLOPS for a conv spec.

  python samples/cnnlayer_driver.py [N C H W K R S stride pad] [dtype]

dtype float32 (default; HIGHEST MXU precision) or bfloat16 (native pass).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from _common import measure
import xsmm_tpu as xt
from xsmm_tpu.dnn import ConvDesc, create_conv_layer


def main():
    args = sys.argv[1:]
    dtype = args[-1] if args and not args[-1].isdigit() else "float32"
    a = [int(x) for x in args if x.isdigit()]
    n, c, h, w, k, r, s, u, p = (a + [0] * 9)[:9] if a else \
        ((32, 64, 56, 56, 64, 3, 3, 1, 1) if xt.platform.is_tpu()
         else (2, 8, 14, 14, 8, 3, 3, 1, 1))
    d = ConvDesc(n=n, c=c, h=h, w=w, k=k, r=r, s=s, u=u or 1, v=u or 1,
                 pad_h=p, pad_w=p, in_dtype=dtype, out_dtype=dtype)
    layer = create_conv_layer(d)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, h, w, c), jnp.float32)
    wt = jax.random.normal(key, (r, s, c, k), jnp.float32) * 0.1
    flops = 2.0 * n * d.out_h * d.out_w * c * k * r * s
    measure(layer._fwd, x, wt, flops=flops,
            label=f"conv fwd {dtype} N{n} C{c} H{h} K{k} R{r} s{d.u} p{p}")
    dy = jax.random.normal(key, (n, d.out_h, d.out_w, k), jnp.float32)
    measure(layer._bwd, dy, wt, flops=flops, label="conv bwd")
    measure(layer._upd, x, dy, flops=flops, label="conv upd")


if __name__ == "__main__":
    main()
