"""Image augmentation pipeline — the GxM JitterData analog.

Reference: samples/deeplearning/gxm/src/JitterData.cpp augments on host
worker threads (random crop with mirror, scale/color jitter, mean
subtraction) before feeding the device.  On TPU the host<->device link is
the scarce resource (tunneled setups pay ~25ms round trips), so the
augmentation runs ON DEVICE as one jitted function applied to the raw
batch: pad -> per-image random crop -> random horizontal mirror ->
brightness/contrast jitter -> mean subtraction, all fused by XLA into a
single cheap pass over the batch.

Usage:
    aug = make_augment(crop=32, pad=4, flip=True,
                       brightness=0.2, contrast=0.2)
    x_aug = aug(jax.random.fold_in(key, step), x)   # x: [B,H,W,C] f32
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def make_augment(crop: Optional[int] = None, pad: int = 4,
                 flip: bool = True, brightness: float = 0.0,
                 contrast: float = 0.0,
                 mean: Optional[Sequence[float]] = None):
    """Build a jitted augmentation fn(key, x [B,H,W,C]) -> [B,h',w',C].

    crop: output side (random-crop window from the ``pad``-padded image);
    None keeps the input size (crop after padding still jitters position).
    flip: random horizontal mirror per image.
    brightness/contrast: uniform jitter amplitudes (0 disables).
    mean: per-channel mean to subtract (the mean-file analog).
    """

    @jax.jit
    def augment(key, x):
        b, h, w, c = x.shape
        out_h = crop or h
        out_w = crop or w
        k_crop, k_flip, k_bri, k_con = jax.random.split(key, 4)

        if pad or crop:
            xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            max_y = h + 2 * pad - out_h
            max_x = w + 2 * pad - out_w
            oy = jax.random.randint(k_crop, (b,), 0, max_y + 1)
            ox = jax.random.randint(jax.random.fold_in(k_crop, 1), (b,),
                                    0, max_x + 1)

            def crop_one(img, y0, x0):
                return jax.lax.dynamic_slice(
                    img, (y0, x0, 0), (out_h, out_w, c))

            x = jax.vmap(crop_one)(xp, oy, ox)

        if flip:
            do = jax.random.bernoulli(k_flip, 0.5, (b, 1, 1, 1))
            x = jnp.where(do, x[:, :, ::-1, :], x)

        if brightness:
            db = jax.random.uniform(k_bri, (b, 1, 1, 1),
                                    minval=-brightness, maxval=brightness)
            x = x + db
        if contrast:
            dc = jax.random.uniform(k_con, (b, 1, 1, 1),
                                    minval=1.0 - contrast,
                                    maxval=1.0 + contrast)
            m = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
            x = (x - m) * dc + m

        if mean is not None:
            x = x - jnp.asarray(mean, x.dtype).reshape(1, 1, 1, -1)
        return x

    return augment
