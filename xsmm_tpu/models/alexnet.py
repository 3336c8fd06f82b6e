"""AlexNet (GxM model zoo member), NHWC, functional."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _conv(x, w, b, stride=1, pad="SAME"):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + b


def _maxpool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _k(key, shape, fan_in):
    return jax.random.normal(key, shape, jnp.float32) * np.sqrt(2.0 / fan_in)


def init_params(key, num_classes: int = 1000) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 16))
    return {
        "c1": _k(next(ks), (11, 11, 3, 64), 11 * 11 * 3),
        "b1": jnp.zeros((64,)),
        "c2": _k(next(ks), (5, 5, 64, 192), 5 * 5 * 64),
        "b2": jnp.zeros((192,)),
        "c3": _k(next(ks), (3, 3, 192, 384), 3 * 3 * 192),
        "b3": jnp.zeros((384,)),
        "c4": _k(next(ks), (3, 3, 384, 256), 3 * 3 * 384),
        "b4": jnp.zeros((256,)),
        "c5": _k(next(ks), (3, 3, 256, 256), 3 * 3 * 256),
        "b5": jnp.zeros((256,)),
        "f6": _k(next(ks), (256, 4096), 256),
        "g6": jnp.zeros((4096,)),
        "f7": _k(next(ks), (4096, 4096), 4096),
        "g7": jnp.zeros((4096,)),
        "f8": _k(next(ks), (4096, num_classes), 4096),
        "g8": jnp.zeros((num_classes,)),
    }


def forward(p, x, compute_dtype=jnp.float32):
    x = x.astype(compute_dtype)
    y = jnp.maximum(_conv(x, p["c1"], p["b1"], 4), 0.0)
    y = _maxpool(y)
    y = jnp.maximum(_conv(y, p["c2"], p["b2"]), 0.0)
    y = _maxpool(y)
    y = jnp.maximum(_conv(y, p["c3"], p["b3"]), 0.0)
    y = jnp.maximum(_conv(y, p["c4"], p["b4"]), 0.0)
    y = jnp.maximum(_conv(y, p["c5"], p["b5"]), 0.0)
    y = jnp.mean(y, axis=(1, 2))          # global pool (6x6 fc analog)
    y = jnp.maximum(y @ p["f6"] + p["g6"], 0.0)
    y = jnp.maximum(y @ p["f7"] + p["g7"], 0.0)
    return y @ p["f8"] + p["g8"]


def alexnet(num_classes: int = 1000, seed: int = 0):
    return init_params(jax.random.PRNGKey(seed), num_classes), forward
