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
from .attention import ConformerBlock
from .conv import ConvSubsampler, GLUConvBlock
from .rnn import BiRNNLayer, time_mask


class AcousticModel(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, feats: jnp.ndarray, lengths: jnp.ndarray,
                 rnn_carries=None, carry_at: int | None = None,
                 drop_left: int = 0):
        """Full-utterance call: ``(feats [B,T,F,3], lengths) → (logits, lens)``.

        Streaming call (decode/streaming.py): ``rnn_carries`` is the list
        of per-layer forward-direction states carried from the previous
        chunk ([] for conv-only models), ``carry_at`` the static chunk
        length in SUBSAMPLED frames, and ``drop_left`` the number of
        subsampled left-margin frames to discard after the conv stack
        (they only exist to give the convs a real receptive field at the
        window edge). Returns ``(logits, lens, new_carries)``; parameters
        are identical to the full-utterance call, so any trained
        checkpoint can be served streaming.
        """
        cfg = self.cfg
        stream = rnn_carries is not None
        if stream and carry_at is None:
            raise ValueError("streaming call needs carry_at")
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

        if drop_left:
            x = x[:, drop_left:]
            lens = jnp.maximum(lens - drop_left, 0)

        if cfg.attn_blocks:
            if stream:
                # full self-attention has a GLOBAL receptive field: a
                # chunked call cannot reproduce the offline computation,
                # so streaming refuses loudly instead of silently
                # degrading (decode/streaming.py guards on this too)
                raise ValueError(
                    "attention presets do not support streaming calls")
            if x.shape[-1] != cfg.attn_dim:
                x = nn.Dense(cfg.attn_dim, dtype=dtype,
                             param_dtype=jnp.float32, name="attn_in")(x)
            for i in range(cfg.attn_blocks):
                x = ConformerBlock(
                    heads=cfg.attn_heads, ff_mult=cfg.attn_ff_mult,
                    conv_kernel=cfg.attn_conv_kernel, dtype=dtype,
                    name=f"conformer{i}")(x, lens)

        new_carries = []
        if cfg.rnn_type != "none":
            for i in range(cfg.rnn_layers):
                layer = BiRNNLayer(
                    hidden=cfg.rnn_hidden, cell=cfg.rnn_type, dtype=dtype,
                    remat=cfg.remat_rnn, impl=cfg.rnn_impl,
                    bidirectional=cfg.rnn_bidirectional, name=f"birnn{i}",
                )
                if stream:
                    x, h = layer(x, lens, h0_fwd=rnn_carries[i],
                                 emit_carry_at=carry_at)
                    new_carries.append(h)
                else:
                    x = layer(x, lens)

        if cfg.proj_dim:
            x = nn.tanh(nn.Dense(cfg.proj_dim, dtype=dtype,
                                 param_dtype=jnp.float32, name="proj")(x))
        # fp32 logits: CTC math is fp32 (BASELINE.json:5)
        logits = nn.Dense(cfg.vocab_size, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="output")(x.astype(jnp.float32))
        mask = time_mask(logits.shape[1], lens)
        logits = logits * mask[:, :, None]
        if stream:
            return logits, lens, new_carries
        return logits, lens

    def subsample_factor(self) -> int:
        f = 1
        for s in self.cfg.conv_stride_time:
            f *= s
        return f

    def init_stream_carries(self, batch: int) -> list:
        """Zero forward-direction RNN states for a fresh stream (one per
        BiRNN layer; [] for conv-only models)."""
        cfg = self.cfg
        if cfg.rnn_type == "none":
            return []
        dim = cfg.rnn_hidden * (2 if cfg.rnn_type == "lstm" else 1)
        return [jnp.zeros((batch, dim), jnp.float32)
                for _ in range(cfg.rnn_layers)]

    def conv_receptive_margin(self) -> int:
        """Input-frame margin that fully covers the conv (+GLU) stack's
        one-sided receptive field: window-edge conv outputs farther than
        this many INPUT frames from the edge are identical to the
        full-utterance computation (decode/streaming.py uses it as the
        left-margin floor)."""
        cfg = self.cfg
        kt = cfg.conv_kernel[0]
        rf, jump = 1, 1                    # receptive field, input stride
        for st in cfg.conv_stride_time:
            rf += (kt - 1) * jump
            jump *= st
        # GLU blocks run at the subsampled rate; extent derives from the
        # module's actual kernel_time so the two cannot drift apart
        rf += cfg.glu_blocks * (GLUConvBlock.kernel_time - 1) * jump
        return (rf - 1) // 2 + 1

    def conv_right_margin(self) -> int:
        """INPUT frames of real future context past a chunk's emit region
        needed for the emitted conv outputs to equal the full-utterance
        computation — the streaming ``right_frames`` floor for conv
        exactness (decode/streaming.py ``stream_geometry``).

        With the stack's explicit ((k−1)//2, k//2) padding, the rightmost
        input of output ``p`` is ``p·S + O`` where ``O = Σᵢ (kᵢ//2)·Jᵢ``
        (Jᵢ = input jump at layer i, S = total stride); the last emitted
        output therefore reaches ``max(0, O − S + 1)`` frames past the
        emit region. 0 for the plain subsampling stacks (their per-layer
        reach k//2 < stride), 48 for ``glu_conv`` (6 stride-1 GLU blocks
        of time-kernel 5 at jump 4)."""
        cfg = self.cfg
        kt = cfg.conv_kernel[0]
        off, jump = 0, 1
        for st in cfg.conv_stride_time:
            off += (kt // 2) * jump
            jump *= st
        off += cfg.glu_blocks * (GLUConvBlock.kernel_time // 2) * jump
        return max(0, off - jump + 1)


def build_model(cfg: ModelConfig) -> AcousticModel:
    """Registry entry point: every preset is expressed as a ModelConfig."""
    return AcousticModel(cfg)
