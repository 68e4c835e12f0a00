"""Device-side augmentation pipeline (jitted, batched, PRNG-keyed).

reference: data/datasets/make_dataloader.py:245-259 — train: Resize(bicubic)
→ RandomHorizontalFlip → Pad(10) → RandomCrop → ToTensor → Normalize →
RandomErasing(pixel mode, timm copy :55-146); val: Resize → ToTensor →
Normalize. The reference runs these per-image in 14 dataloader worker
processes; here resize happens once at decode (host) and everything else is
ONE vectorized jitted function on device — no Python in the step loop
(SURVEY.md §7.4). The reference applies the transform independently per
modality (bases.py:89-107), so callers pass a distinct PRNG key per modality.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def normalize(x: Array, mean, std) -> Array:
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std


def random_hflip(key: Array, x: Array, prob: float) -> Array:
    """Per-sample horizontal flip. x: [B,H,W,C]."""
    flip = jax.random.bernoulli(key, prob, (x.shape[0], 1, 1, 1))
    return jnp.where(flip, x[:, :, ::-1, :], x)


def pad_random_crop(key: Array, x: Array, padding: int) -> Array:
    """Zero-pad by ``padding`` then random-crop back to the original size."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, [(0, 0), (padding, padding), (padding, padding), (0, 0)])
    kt, kl = jax.random.split(key)
    tops = jax.random.randint(kt, (B,), 0, 2 * padding + 1)
    lefts = jax.random.randint(kl, (B,), 0, 2 * padding + 1)

    def crop_one(img, top, left):
        return jax.lax.dynamic_slice(img, (top, left, 0), (H, W, C))

    return jax.vmap(crop_one)(xp, tops, lefts)


def random_erasing(key: Array, x: Array, prob: float,
                   min_area: float = 0.02, max_area: float = 1 / 3,
                   min_aspect: float = 0.3, attempts: int = 10) -> Array:
    """Pixel-mode random erasing (timm semantics, make_dataloader.py:107-130):
    up to ``attempts`` box proposals, first with h<H and w<W wins; the box is
    filled with per-pixel standard-normal noise. Applied post-normalize."""
    B, H, W, C = x.shape
    k_apply, k_area, k_aspect, k_top, k_left, k_noise = jax.random.split(key, 6)
    apply = jax.random.bernoulli(k_apply, prob, (B,))

    area = jax.random.uniform(k_area, (B, attempts),
                              minval=min_area, maxval=max_area) * (H * W)
    log_ar = jax.random.uniform(
        k_aspect, (B, attempts),
        minval=math.log(min_aspect), maxval=math.log(1.0 / min_aspect))
    ar = jnp.exp(log_ar)
    hs = jnp.round(jnp.sqrt(area * ar)).astype(jnp.int32)
    ws = jnp.round(jnp.sqrt(area / ar)).astype(jnp.int32)
    valid = (hs < H) & (ws < W)
    # first valid attempt (argmax of bool picks first True)
    first = jnp.argmax(valid, axis=1)
    any_valid = jnp.any(valid, axis=1)
    h = jnp.take_along_axis(hs, first[:, None], 1)[:, 0]
    w = jnp.take_along_axis(ws, first[:, None], 1)[:, 0]
    do = apply & any_valid

    u_t = jax.random.uniform(k_top, (B,))
    u_l = jax.random.uniform(k_left, (B,))
    top = jnp.floor(u_t * (H - h + 1).astype(jnp.float32)).astype(jnp.int32)
    left = jnp.floor(u_l * (W - w + 1).astype(jnp.float32)).astype(jnp.int32)

    rows = jnp.arange(H)[None, :, None]  # [1,H,1]
    cols = jnp.arange(W)[None, None, :]  # [1,1,W]
    in_box = ((rows >= top[:, None, None]) & (rows < (top + h)[:, None, None])
              & (cols >= left[:, None, None]) & (cols < (left + w)[:, None, None]))
    mask = (in_box & do[:, None, None])[..., None]  # [B,H,W,1]
    noise = jax.random.normal(k_noise, x.shape, dtype=x.dtype)
    return jnp.where(mask, noise, x)


def random_grayscale_patch(key: Array, x: Array, prob: float,
                           min_area: float = 0.02, max_area: float = 0.4,
                           min_aspect: float = 0.3,
                           attempts: int = 10) -> Array:
    """RandomGrayscalePatchReplacement (reference make_dataloader.py:149-188,
    defined but unused on the reference's main path — kept for capability
    parity): replace a random box with its ITU-R 601 grayscale. Same
    attempt/first-fit semantics as :func:`random_erasing`."""
    B, H, W, C = x.shape
    k_apply, k_area, k_aspect, k_top, k_left = jax.random.split(key, 5)
    apply = jax.random.bernoulli(k_apply, prob, (B,))
    area = jax.random.uniform(k_area, (B, attempts),
                              minval=min_area, maxval=max_area) * (H * W)
    ar = jnp.exp(jax.random.uniform(
        k_aspect, (B, attempts),
        minval=math.log(min_aspect), maxval=math.log(1.0 / min_aspect)))
    hs = jnp.round(jnp.sqrt(area * ar)).astype(jnp.int32)
    ws = jnp.round(jnp.sqrt(area / ar)).astype(jnp.int32)
    valid = (hs < H) & (ws < W)
    first = jnp.argmax(valid, axis=1)
    h = jnp.take_along_axis(hs, first[:, None], 1)[:, 0]
    w = jnp.take_along_axis(ws, first[:, None], 1)[:, 0]
    do = apply & jnp.any(valid, axis=1)
    top = jnp.floor(jax.random.uniform(k_top, (B,))
                    * (H - h + 1).astype(jnp.float32)).astype(jnp.int32)
    left = jnp.floor(jax.random.uniform(k_left, (B,))
                     * (W - w + 1).astype(jnp.float32)).astype(jnp.int32)
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    in_box = ((rows >= top[:, None, None]) & (rows < (top + h)[:, None, None])
              & (cols >= left[:, None, None])
              & (cols < (left + w)[:, None, None]))
    mask = (in_box & do[:, None, None])[..., None]
    gray = (0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3])
    return jnp.where(mask, jnp.broadcast_to(gray, x.shape), x)


def make_train_augment(input_cfg: Any) -> Callable:
    """Returns augment(key, imgs_uint8 [B,H,W,3]) -> normalized float images.

    One call per modality with a distinct key (independent augmentation per
    modality, matching reference ImageDataset.__getitem__).
    """
    prob = input_cfg.PROB
    padding = input_cfg.PADDING
    re_prob = input_cfg.RE_PROB
    mean = tuple(input_cfg.PIXEL_MEAN)
    std = tuple(input_cfg.PIXEL_STD)

    def augment(key: Array, imgs: Array) -> Array:
        k1, k2, k3 = jax.random.split(key, 3)
        x = imgs.astype(jnp.float32) / 255.0
        x = random_hflip(k1, x, prob)
        x = pad_random_crop(k2, x, padding)
        x = normalize(x, mean, std)
        x = random_erasing(k3, x, re_prob)
        return x

    return augment


def make_eval_transform(input_cfg: Any) -> Callable:
    mean = tuple(input_cfg.PIXEL_MEAN)
    std = tuple(input_cfg.PIXEL_STD)

    def transform(imgs: Array) -> Array:
        return normalize(imgs.astype(jnp.float32) / 255.0, mean, std)

    return transform
