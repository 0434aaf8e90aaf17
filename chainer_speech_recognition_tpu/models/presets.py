"""Acoustic model assembly + the model registry (SURVEY.md §2.3).

One config-driven builder covers the three contract presets
(BASELINE.json:7-9): ``tiny_conv`` (config 1), ``bigru`` (config 2),
``bilstm_deep`` (config 3). The forward contract mirrors the reference:
``forward(features [B,T,F,3], frame_lengths) → (logits [B,T',V], out_lengths)``
with V including the CTC blank at index 0.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import ModelConfig
from .conv import ConvSubsampler, GLUConvBlock
from .rnn import BiRNNLayer, time_mask


class AcousticModel(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, feats: jnp.ndarray, lengths: jnp.ndarray):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        x, lens = ConvSubsampler(
            channels=tuple(cfg.conv_channels),
            kernel=tuple(cfg.conv_kernel),
            stride_time=tuple(cfg.conv_stride_time),
            stride_freq=tuple(cfg.conv_stride_freq),
            dtype=dtype,
        )(feats.astype(dtype), lengths)

        for i in range(cfg.glu_blocks):
            x = GLUConvBlock(channels=cfg.glu_channels, dtype=dtype,
                             name=f"glu{i}")(x, lens)

        if cfg.rnn_type != "none":
            for i in range(cfg.rnn_layers):
                x = BiRNNLayer(
                    hidden=cfg.rnn_hidden, cell=cfg.rnn_type, dtype=dtype,
                    remat=cfg.remat_rnn, impl=cfg.rnn_impl, name=f"birnn{i}",
                )(x, lens)

        if cfg.proj_dim:
            x = nn.tanh(nn.Dense(cfg.proj_dim, dtype=dtype,
                                 param_dtype=jnp.float32, name="proj")(x))
        # fp32 logits: CTC math is fp32 (BASELINE.json:5)
        logits = nn.Dense(cfg.vocab_size, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="output")(x.astype(jnp.float32))
        mask = time_mask(logits.shape[1], lens)
        logits = logits * mask[:, :, None]
        return logits, lens

    def subsample_factor(self) -> int:
        f = 1
        for s in self.cfg.conv_stride_time:
            f *= s
        return f


def build_model(cfg: ModelConfig) -> AcousticModel:
    """Registry entry point: every preset is expressed as a ModelConfig."""
    return AcousticModel(cfg)
