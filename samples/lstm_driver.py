#!/usr/bin/env python
"""RNN/LSTM/GRU cell driver (samples/deeplearning/{lstm,gru,rnn}driver).

  python samples/lstm_driver.py [N C K T] [dtype] [cell]

dtype float32 (default, HIGHEST-precision MXU) or bfloat16 (native MXU
pass with f32 accumulation — the reference's bf16 LSTM templates analog);
cell in {lstm, gru, rnn} (rnn = tanh).
"""

import sys

import jax
import jax.numpy as jnp

from _common import measure
import xsmm_tpu as xt
from xsmm_tpu.dnn import CellType, RnnDesc, create_rnncell


def main():
    args = sys.argv[1:]
    words = [x for x in args if not x.isdigit()]
    cells = {"lstm": CellType.LSTM, "gru": CellType.GRU,
             "rnn": CellType.RNN_TANH}
    cell_name = next((w for w in words if w in cells), "lstm")
    dtype = next((w for w in words if w not in cells), "float32")
    a = [int(x) for x in args if x.isdigit()]
    n, c, k, t = a[:4] if len(a) >= 4 else \
        ((128, 512, 512, 32) if xt.platform.is_tpu() else (8, 32, 32, 4))
    d = RnnDesc(n=n, c=c, k=k, max_t=t, cell_type=cells[cell_name],
                in_dtype=dtype, out_dtype=dtype)
    cell = create_rnncell(d)
    g = cell.num_gates
    key = jax.random.PRNGKey(0)
    xt_ = jax.random.normal(key, (t, n, c), jnp.float32)
    w = jax.random.normal(key, (c, g * k), jnp.float32) * 0.1
    r = jax.random.normal(key, (k, g * k), jnp.float32) * 0.1
    b = jnp.zeros((g * k,), jnp.float32)
    h0 = jnp.zeros((n, k), jnp.float32)
    c0 = jnp.zeros((n, k), jnp.float32)
    flops = 2.0 * t * n * (c + k) * g * k   # the two gate GEMMs per step
    measure(cell._fwd, xt_, w, r, b, h0, c0, flops=flops,
            label=f"{cell_name} {dtype} fwd N{n} C{c} K{k} T{t}")
    dhs = jax.random.normal(key, (t, n, k), jnp.float32)
    measure(cell._bwd, xt_, w, r, b, h0, c0, dhs, flops=3 * flops,
            label=f"{cell_name} bwd+upd")


if __name__ == "__main__":
    main()
