#!/usr/bin/env python
"""Round-5 drift resolution (VERDICT r4 item #2).

Re-measures the two r4-flagged headline rows with N>=5 independent
device_bench repeats each, exactly as bench_all measures them:

  blocked_gemm_tflops  188.7 (r3) -> 177.4 (r4)   ratio 0.94
  fusedbn_gbps        1060.1 (r3) ->  974.9 (r4)  ratio 0.92

If the r3 and r4 numbers both sit inside the distribution measured here,
the flags resolve to tunnel/session variance; if the distribution sits at
the r4 level with small spread, the regression is real and needs a bisect.
Results land in documentation/perf_notes.md + DRIFT_RESOLUTIONS.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import xsmm_tpu as xt
from xsmm_tpu.utils.timer import device_bench

xt.enable_compile_cache()
N_REP = 5


def blocked_gemm_once():
    from xsmm_tpu.ops import blocked_gemm as bg
    mm = nn = kk = 2048
    bs = 256
    h = bg.blocked_gemm_handle(mm, nn, kk, bm=bs, bn=bs, bk=bs,
                               dtype="bfloat16")
    rng = np.random.default_rng(3)
    a_blk = h.copyin_a(rng.standard_normal((mm, kk)).astype(np.float32))
    b_blk = h.copyin_b(rng.standard_normal((kk, nn)).astype(np.float32))
    vals = []
    for _ in range(N_REP):
        dt, info = device_bench(h._compute, a_blk, b_blk, stats=True)
        vals.append({"tflops": round(2 * mm * nn * kk / dt / 1e12, 1),
                     "spread": round(info["spread"], 3)})
    return vals


def fusedbn_once():
    from xsmm_tpu.dnn import BnDesc, BnFuse, create_fusedbatchnorm
    key = jax.random.PRNGKey(0)
    np_, cp_, hp_ = 64, 256, 56
    bdesc = BnDesc(n=np_, c=cp_, h=hp_, w=hp_, fuse=BnFuse.RELU)
    bn = create_fusedbatchnorm(bdesc)
    xp = jax.random.normal(key, (np_, hp_, hp_, cp_), jnp.float32)
    gam = jnp.ones((cp_,), jnp.float32)
    bet = jnp.zeros((cp_,), jnp.float32)
    fb = lambda o, a: (o[0].astype(a[0].dtype),) + a[1:]
    vals = []
    for _ in range(N_REP):
        dt, info = device_bench(bn._fwd, xp, gam, bet, feedback=fb,
                                stats=True)
        vals.append({"gbps": round(3 * np_ * hp_ * hp_ * cp_ * 4 / dt / 1e9,
                                   1),
                     "spread": round(info["spread"], 3)})
    return vals


if __name__ == "__main__":
    out = {"blocked_gemm": blocked_gemm_once(), "fusedbn": fusedbn_once()}
    for k, rows in list(out.items()):
        xs = [list(r.values())[0] for r in rows]
        out[k + "_summary"] = {
            "median": sorted(xs)[len(xs) // 2], "min": min(xs),
            "max": max(xs),
            "spread": round((max(xs) - min(xs)) / sorted(xs)[len(xs) // 2],
                            3)}
    print(json.dumps(out, indent=1))
