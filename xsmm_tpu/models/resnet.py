"""ResNet model family built on the framework's DNN layer handles.

Reference: the GxM model zoo ships AlexNet / ResNet-50 / Inception-v3
prototxt graphs (samples/deeplearning/gxm/model_zoo, Engine.cpp builds the
layer graph).  Here the graph is a functional compose of the dnn/ layer
forwards; parameters live in a pytree and training uses jax.grad (the
layer handles' explicit bwd/upd methods remain available for layer-level
use, but end-to-end training the JAX way differentiates the whole graph).

Supports depths 18, 34 (basic blocks) and 50 (bottleneck), NHWC, bf16-able.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_CFG = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
}


def _conv(x, w, stride=1, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _bn(x, p, eps=1e-5):
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.var(x, axis=(0, 1, 2))
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]


def _init_conv(key, r, s, cin, cout):
    fan_in = r * s * cin
    return jax.random.normal(key, (r, s, cin, cout), jnp.float32) * np.sqrt(
        2.0 / fan_in)


def _init_bn(c):
    return {"gamma": jnp.ones((c,), jnp.float32),
            "beta": jnp.zeros((c,), jnp.float32)}


def _basic_block(x, p, stride):
    y = jnp.maximum(_bn(_conv(x, p["conv1"], stride), p["bn1"]), 0.0)
    y = _bn(_conv(y, p["conv2"]), p["bn2"])
    sc = x
    if "proj" in p:
        sc = _bn(_conv(x, p["proj"], stride), p["bn_proj"])
    return jnp.maximum(y + sc, 0.0)


def _bottleneck_block(x, p, stride):
    y = jnp.maximum(_bn(_conv(x, p["conv1"]), p["bn1"]), 0.0)
    y = jnp.maximum(_bn(_conv(y, p["conv2"], stride), p["bn2"]), 0.0)
    y = _bn(_conv(y, p["conv3"]), p["bn3"])
    sc = x
    if "proj" in p:
        sc = _bn(_conv(x, p["proj"], stride), p["bn_proj"])
    return jnp.maximum(y + sc, 0.0)


def init_params(key, depth: int = 50, num_classes: int = 1000,
                width: int = 64) -> Dict[str, Any]:
    kind, stages = _CFG[depth]
    keys = iter(jax.random.split(key, 256))
    p: Dict[str, Any] = {
        "stem": _init_conv(next(keys), 7, 7, 3, width),
        "bn_stem": _init_bn(width),
        "blocks": [],
    }
    cin = width
    for si, nblocks in enumerate(stages):
        cout = width * (2 ** si)
        expansion = 4 if kind == "bottleneck" else 1
        for bi in range(nblocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            bp: Dict[str, Any] = {}
            if kind == "basic":
                bp["conv1"] = _init_conv(next(keys), 3, 3, cin, cout)
                bp["bn1"] = _init_bn(cout)
                bp["conv2"] = _init_conv(next(keys), 3, 3, cout, cout)
                bp["bn2"] = _init_bn(cout)
                out_c = cout
            else:
                bp["conv1"] = _init_conv(next(keys), 1, 1, cin, cout)
                bp["bn1"] = _init_bn(cout)
                bp["conv2"] = _init_conv(next(keys), 3, 3, cout, cout)
                bp["bn2"] = _init_bn(cout)
                bp["conv3"] = _init_conv(next(keys), 1, 1, cout,
                                         cout * expansion)
                bp["bn3"] = _init_bn(cout * expansion)
                out_c = cout * expansion
            if stride != 1 or cin != out_c:
                bp["proj"] = _init_conv(next(keys), 1, 1, cin, out_c)
                bp["bn_proj"] = _init_bn(out_c)
            p["blocks"].append(bp)
            cin = out_c
    p["fc_w"] = jax.random.normal(next(keys), (cin, num_classes),
                                  jnp.float32) * 0.01
    p["fc_b"] = jnp.zeros((num_classes,), jnp.float32)
    p["_meta"] = {"depth": depth, "stages": stages, "kind": kind}
    return p


def forward(params, x, compute_dtype=jnp.float32):
    """x: [N,H,W,3] NHWC -> logits [N, num_classes]."""
    meta = params["_meta"]
    kind, stages = meta["kind"], meta["stages"]
    block = _basic_block if kind == "basic" else _bottleneck_block
    x = x.astype(compute_dtype)
    y = jnp.maximum(_bn(_conv(x, params["stem"], 2), params["bn_stem"]), 0.0)
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1), "SAME")
    bi = 0
    for si, nblocks in enumerate(stages):
        for bj in range(nblocks):
            stride = 2 if (si > 0 and bj == 0) else 1
            y = block(y, params["blocks"][bi], stride)
            bi += 1
    y = jnp.mean(y, axis=(1, 2))
    return y @ params["fc_w"] + params["fc_b"]


def resnet(depth: int = 50, num_classes: int = 1000, width: int = 64,
           seed: int = 0):
    params = init_params(jax.random.PRNGKey(seed), depth, num_classes, width)
    return params, forward
