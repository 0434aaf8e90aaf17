"""The jitted train/eval steps — everything between the two host↔device
boundaries of the reference's iteration (SURVEY.md §3.2) fused into ONE
compiled program: on-device front-end → SpecAugment → acoustic model →
CTC → grad → clip → update, with the gradient all-reduce over the DP mesh
inside ``shard_map`` (BASELINE.json:5,11).

Batches are dicts of padded host arrays:
  signals        [B, N_max] float32 PCM
  num_samples    [B] int32
  labels         [B, L_max] int32 (PAD_LABEL_ID beyond label_lengths)
  label_lengths  [B] int32
Per-bucket static shapes → one XLA compile per bucket (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..config import Config
from ..frontend import select_frontend
from ..ops.ctc_jax import ctc_loss, mean_ctc_loss
from ..ops.ctc_pallas import mean_ctc_loss_pallas
from ..ops.specaugment import apply_specaugment
from .state import TrainState, make_optimizer


def _mean_ctc(cfg: Config):
    impl = cfg.train.ctc_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    return {"pallas": mean_ctc_loss_pallas, "jnp": mean_ctc_loss}[impl]


def _frontend(cfg: Config):
    return select_frontend(cfg.features)


def _forward_loss(model, cfg: Config, params, batch, rng, train: bool):
    if "features" in batch:          # cached-feature batches (SURVEY §2.1)
        feats, flens = batch["features"], batch["frame_lengths"]
    else:                            # on-device front-end (default TPU path)
        feats, flens = _frontend(cfg)(
            batch["signals"], batch["num_samples"],
            apply_cmvn=cfg.features.cmvn)
    if train and cfg.specaugment.enabled:
        feats = apply_specaugment(rng, feats, flens, cfg.specaugment)
    logits, olens = model.apply(params, feats, flens)
    loss, valid_frac = _mean_ctc(cfg)(
        logits, olens, batch["labels"], batch["label_lengths"])
    return loss, (valid_frac, logits, olens)


def make_train_step(model, cfg: Config, mesh) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics) jitted over mesh.

    Inside shard_map each device computes grads on its batch shard, then
    ``lax.pmean`` all-reduces them over the ``data`` axis (ICI); the optax
    update runs replicated.
    """
    tx = make_optimizer(cfg.optim)
    axis = cfg.parallel.data_axis

    def device_step(state: TrainState, batch):
        step_rng = jax.random.fold_in(
            jax.random.wrap_key_data(state.rng), state.step)
        step_rng = jax.random.fold_in(step_rng, jax.lax.axis_index(axis))

        (loss, (valid_frac, _, _)), grads = jax.value_and_grad(
            lambda p: _forward_loss(model, cfg, p, batch, step_rng, train=True),
            has_aux=True)(state.params)

        grads = jax.lax.pmean(grads, axis)            # all-reduce over ICI
        loss = jax.lax.pmean(loss, axis)
        valid_frac = jax.lax.pmean(valid_frac, axis)
        gnorm = optax.global_norm(grads)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(
            params=new_params, opt_state=new_opt,
            step=state.step + 1, rng=state.rng)
        metrics = {"loss": loss, "grad_norm": gnorm, "valid_frac": valid_frac}
        return new_state, metrics

    # one compiled shard_map per batch key-set (signals-mode vs cached-
    # feature-mode batches carry different keys; shapes are per-bucket)
    cache: dict = {}

    def call(state, batch):
        keys = tuple(sorted(batch.keys()))
        if keys not in cache:
            specs = {k: P(axis) for k in keys}
            cache[keys] = jax.jit(
                shard_map(device_step, mesh=mesh,
                          in_specs=(P(), specs), out_specs=(P(), P()),
                          check_vma=False),
                donate_argnums=(0,))
        return cache[keys](state, batch)

    return call


def make_eval_step(model, cfg: Config) -> Callable:
    """eval_step(params, batch) → (per-utt ctc loss [B], logits, out_lens).

    Single-program jit (eval batches are small); greedy decode is applied by
    the caller so beam/LM variants can share this step.
    """

    @jax.jit
    def eval_step(params, batch):
        if "features" in batch:
            feats, flens = batch["features"], batch["frame_lengths"]
        else:
            feats, flens = _frontend(cfg)(
                batch["signals"], batch["num_samples"],
                apply_cmvn=cfg.features.cmvn)
        logits, olens = model.apply(params, feats, flens)
        losses = ctc_loss(logits, olens, batch["labels"], batch["label_lengths"])
        return losses, logits, olens

    return eval_step
