"""SpecAugment-style time/freq masking, on-device inside the jitted train
step (config 3, BASELINE.json:9; SURVEY.md §2.2 "Augmentation").

Pure functional: masks are sampled from an explicit jax.random key, so the
train step stays reproducible and resumable. Time masks are sampled within
each utterance's valid length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SpecAugmentConfig


def apply_specaugment(
    rng: jax.Array,
    feats: jnp.ndarray,        # [B, T, F, C]
    lengths: jnp.ndarray,      # [B] valid frame counts
    cfg: SpecAugmentConfig,
) -> jnp.ndarray:
    if not cfg.enabled:
        return feats
    B, T, F, C = feats.shape
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]       # [1, T]
    f_idx = jnp.arange(F, dtype=jnp.int32)[None, :]       # [1, F]
    tmask = jnp.ones((B, T), feats.dtype)
    fmask = jnp.ones((B, F), feats.dtype)

    keys = jax.random.split(rng, 2 * (cfg.num_time_masks + cfg.num_freq_masks))
    k = 0
    for _ in range(cfg.num_time_masks):
        width = jax.random.randint(keys[k], (B, 1), 0, cfg.time_mask_max + 1)
        start = (jax.random.uniform(keys[k + 1], (B, 1))
                 * jnp.maximum(lengths[:, None] - width, 1)).astype(jnp.int32)
        hit = (t_idx >= start) & (t_idx < start + width)
        tmask = tmask * (1.0 - hit.astype(feats.dtype))
        k += 2
    for _ in range(cfg.num_freq_masks):
        width = jax.random.randint(keys[k], (B, 1), 0, cfg.freq_mask_max + 1)
        start = (jax.random.uniform(keys[k + 1], (B, 1))
                 * jnp.maximum(F - width, 1)).astype(jnp.int32)
        hit = (f_idx >= start) & (f_idx < start + width)
        fmask = fmask * (1.0 - hit.astype(feats.dtype))
        k += 2

    return feats * tmask[:, :, None, None] * fmask[:, None, :, None]
