"""Inception-v3 — third member of the GxM model zoo.

Reference: samples/deeplearning/gxm/model_zoo ships AlexNet / ResNet-50 /
Inception-v3 prototxt graphs (Engine.cpp builds the layer graph from them).
Canonical Szegedy et al. 2015 v3 topology: conv stem, 3x InceptionA (35x35),
ReductionA, 4x InceptionB (17x17, 7x1/1x7 factorized), ReductionB,
2x InceptionC (8x8, expanded 1x3/3x1), global avgpool, fc.  All convs are
conv+BN+ReLU ("BasicConv2d").

Functional style matching resnet.py: params pytree + pure forward; the
``width`` knob scales every channel count by width/32 so tests can run a
tiny-but-topologically-complete network (width=32 is canonical).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def _conv(x, w, stride=1, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _bn(x, p, eps=1e-3):
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.var(x, axis=(0, 1, 2))
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]


def _cbr(x, p, stride=1, pad="SAME"):
    """BasicConv2d: conv + BN + ReLU."""
    return jnp.maximum(_bn(_conv(x, p["w"], stride, pad), p["bn"]), 0.0)


def _avgpool3(x):
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    n = jax.lax.reduce_window(jnp.ones_like(x), 0.0, jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    return s / n


def _maxpool(x, k=3, stride=2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, k, k, 1), (1, stride, stride, 1), "SAME")


class _Init:
    def __init__(self, key):
        self._key = key

    def conv(self, kh, kw, cin, cout) -> Dict[str, Any]:
        self._key, sub = jax.random.split(self._key)
        fan_in = kh * kw * cin
        return {
            "w": jax.random.normal(sub, (kh, kw, cin, cout), jnp.float32)
            * np.sqrt(2.0 / fan_in),
            "bn": {"gamma": jnp.ones((cout,), jnp.float32),
                   "beta": jnp.zeros((cout,), jnp.float32)},
        }


def _branch(ini: _Init, cin: int, specs) -> List[Dict[str, Any]]:
    """A chain of (kh, kw, cout) convs."""
    chain = []
    for kh, kw, cout in specs:
        chain.append(ini.conv(kh, kw, cin, cout))
        cin = cout
    return chain


def _run_branch(x, chain, strides=None, pads=None):
    strides = strides or [1] * len(chain)
    pads = pads or ["SAME"] * len(chain)
    for p, s, pd in zip(chain, strides, pads):
        x = _cbr(x, p, s, pd)
    return x


def _c(v: int, width: int) -> int:
    """Scale a canonical channel count by width/32, min 4."""
    return max(4, int(round(v * width / 32)))


def init_params(key, num_classes: int = 1000, width: int = 32):
    """Build the Inception-v3 parameter pytree (canonical at width=32)."""
    ini = _Init(key)
    c = lambda v: _c(v, width)
    p: Dict[str, Any] = {"stem": [], "blocks": []}

    # Stem: 3x3/2, 3x3, 3x3 -> maxpool -> 1x1, 3x3 -> maxpool
    stem_specs = [(3, 3, c(32)), (3, 3, c(32)), (3, 3, c(64)),
                  (1, 1, c(80)), (3, 3, c(192))]
    cin = 3
    for kh, kw, cout in stem_specs:
        p["stem"].append(ini.conv(kh, kw, cin, cout))
        cin = cout

    def inception_a(cin, pool_c):
        return {
            "b1": _branch(ini, cin, [(1, 1, c(64))]),
            "b2": _branch(ini, cin, [(1, 1, c(48)), (5, 5, c(64))]),
            "b3": _branch(ini, cin, [(1, 1, c(64)), (3, 3, c(96)),
                                     (3, 3, c(96))]),
            "bp": _branch(ini, cin, [(1, 1, pool_c)]),
        }, c(64) + c(64) + c(96) + pool_c

    def reduction_a(cin):
        return {
            "b1": _branch(ini, cin, [(3, 3, c(384))]),
            "b2": _branch(ini, cin, [(1, 1, c(64)), (3, 3, c(96)),
                                     (3, 3, c(96))]),
        }, c(384) + c(96) + cin

    def inception_b(cin, mid):
        return {
            "b1": _branch(ini, cin, [(1, 1, c(192))]),
            "b2": _branch(ini, cin, [(1, 1, mid), (1, 7, mid),
                                     (7, 1, c(192))]),
            "b3": _branch(ini, cin, [(1, 1, mid), (7, 1, mid), (1, 7, mid),
                                     (7, 1, mid), (1, 7, c(192))]),
            "bp": _branch(ini, cin, [(1, 1, c(192))]),
        }, 4 * c(192)

    def reduction_b(cin):
        return {
            "b1": _branch(ini, cin, [(1, 1, c(192)), (3, 3, c(320))]),
            "b2": _branch(ini, cin, [(1, 1, c(192)), (1, 7, c(192)),
                                     (7, 1, c(192)), (3, 3, c(192))]),
        }, c(320) + c(192) + cin

    def inception_c(cin):
        return {
            "b1": _branch(ini, cin, [(1, 1, c(320))]),
            "b2_stem": _branch(ini, cin, [(1, 1, c(384))]),
            "b2_a": _branch(ini, c(384), [(1, 3, c(384))]),
            "b2_b": _branch(ini, c(384), [(3, 1, c(384))]),
            "b3_stem": _branch(ini, cin, [(1, 1, c(448)), (3, 3, c(384))]),
            "b3_a": _branch(ini, c(384), [(1, 3, c(384))]),
            "b3_b": _branch(ini, c(384), [(3, 1, c(384))]),
            "bp": _branch(ini, cin, [(1, 1, c(192))]),
        }, c(320) + 4 * c(384) + c(192)

    cin = c(192)
    for pool_c in (c(32), c(64), c(64)):           # 3x InceptionA
        blk, cin = inception_a(cin, pool_c)
        p["blocks"].append(blk)
    blk, cin = reduction_a(cin)
    p["blocks"].append(blk)
    for mid in (c(128), c(160), c(160), c(192)):   # 4x InceptionB
        blk, cin = inception_b(cin, mid)
        p["blocks"].append(blk)
    blk, cin = reduction_b(cin)
    p["blocks"].append(blk)
    for _ in range(2):                             # 2x InceptionC
        blk, cin = inception_c(cin)
        p["blocks"].append(blk)

    ini._key, sub = jax.random.split(ini._key)
    p["fc_w"] = jax.random.normal(sub, (cin, num_classes), jnp.float32) * 0.01
    p["fc_b"] = jnp.zeros((num_classes,), jnp.float32)
    # block kinds live in _meta (static strings can't ride through jit in
    # the param pytree; the engine splits _-prefixed keys out)
    p["_meta"] = {"model": "inception_v3", "width": width,
                  "kinds": ("A", "A", "A", "RA", "B", "B", "B", "B",
                            "RB", "C", "C")}
    return p


def _run_block(y, blk, kind):
    if kind == "A":
        return jnp.concatenate([
            _run_branch(y, blk["b1"]),
            _run_branch(y, blk["b2"]),
            _run_branch(y, blk["b3"]),
            _run_branch(_avgpool3(y), blk["bp"]),
        ], axis=-1)
    if kind == "RA":
        return jnp.concatenate([
            _run_branch(y, blk["b1"], strides=[2]),
            _run_branch(y, blk["b2"], strides=[1, 1, 2]),
            _maxpool(y),
        ], axis=-1)
    if kind == "B":
        return jnp.concatenate([
            _run_branch(y, blk["b1"]),
            _run_branch(y, blk["b2"]),
            _run_branch(y, blk["b3"]),
            _run_branch(_avgpool3(y), blk["bp"]),
        ], axis=-1)
    if kind == "RB":
        return jnp.concatenate([
            _run_branch(y, blk["b1"], strides=[1, 2]),
            _run_branch(y, blk["b2"], strides=[1, 1, 1, 2]),
            _maxpool(y),
        ], axis=-1)
    # C: branches 2/3 fork into parallel 1x3 + 3x1 that concatenate
    b2 = _run_branch(y, blk["b2_stem"])
    b3 = _run_branch(y, blk["b3_stem"])
    return jnp.concatenate([
        _run_branch(y, blk["b1"]),
        _run_branch(b2, blk["b2_a"]),
        _run_branch(b2, blk["b2_b"]),
        _run_branch(b3, blk["b3_a"]),
        _run_branch(b3, blk["b3_b"]),
        _run_branch(_avgpool3(y), blk["bp"]),
    ], axis=-1)


def forward(params, x, compute_dtype=jnp.float32):
    """x: [N,H,W,3] NHWC -> logits [N, num_classes].

    SAME padding throughout, so any input >= ~64px runs (canonical is 299).
    """
    x = x.astype(compute_dtype)
    y = _cbr(x, params["stem"][0], stride=2)
    y = _cbr(y, params["stem"][1])
    y = _cbr(y, params["stem"][2])
    y = _maxpool(y)
    y = _cbr(y, params["stem"][3])
    y = _cbr(y, params["stem"][4])
    y = _maxpool(y)
    for blk, kind in zip(params["blocks"], params["_meta"]["kinds"]):
        y = _run_block(y, blk, kind)
    y = jnp.mean(y, axis=(1, 2))
    return y @ params["fc_w"] + params["fc_b"]


def inception_v3(num_classes: int = 1000, width: int = 32, seed: int = 0):
    params = init_params(jax.random.PRNGKey(seed), num_classes, width)
    return params, forward
