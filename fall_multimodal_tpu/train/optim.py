"""Optimizer + LR-schedule factory (optax).

Capability parity with the reference factories
(``Fall_2_Spatial_Temporal_SR/optimizer.py:8-35``,
``Multimodal_Fall3/optimizer.py:8-31``): sgd / adam / adamw / rmsprop and
step / multistep / cosine-with-warmup schedules. RMSprop is implemented to
match torch's update exactly (eps added *outside* the sqrt; the workhorse
optimizer of every reference experiment: RMSprop(lr=1e-3)).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

from fall_multimodal_tpu.configs import Config, OptimConfig, SchedulerConfig


class TorchRmsState(NamedTuple):
    square_avg: optax.Updates


def scale_by_torch_rms(decay: float = 0.99, eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.RMSprop (no momentum, uncentered):

    ``s <- decay * s + (1-decay) * g^2;  update <- g / (sqrt(s) + eps)``.
    """

    def init(params):
        return TorchRmsState(jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        sq = jax.tree.map(
            lambda s, g: decay * s + (1.0 - decay) * jnp.square(g),
            state.square_avg,
            updates,
        )
        scaled = jax.tree.map(lambda g, s: g / (jnp.sqrt(s) + eps), updates, sq)
        return scaled, TorchRmsState(sq)

    return optax.GradientTransformation(init, update)


def build_schedule(
    cfg: SchedulerConfig, base_lr: float, steps_per_epoch: int = 1
) -> Union[float, optax.Schedule]:
    """Epoch-granular schedules applied per optimizer step.

    The reference steps its scheduler once per epoch (``main.py:321-322``);
    we replicate by flooring step/steps_per_epoch to an epoch index.
    """
    if cfg.type is None:
        return base_lr

    def warmup_lr(epoch):
        # timm warmup: lr = warmup_lr_init + t * (base - init) / warmup_t
        return cfg.warmup_lr_init + epoch * (base_lr - cfg.warmup_lr_init) / max(
            cfg.warmup_t, 1
        )

    if cfg.type == "cosine":
        # timm CosineLRScheduler (t_in_epochs=True, cycle_limit=1,
        # warmup_prefix=False — the reference's exact construction,
        # Fall_2_Spatial_Temporal_SR/optimizer.py:32): linear warmup for
        # t < warmup_t, then cosine evaluated at the UNSHIFTED epoch index
        # (warmup_prefix=False does not subtract warmup_t), lr_min once the
        # single cycle ends at t_initial.
        def schedule(step):
            epoch = jnp.floor(step / steps_per_epoch)
            cos_lr = cfg.lr_min + 0.5 * (base_lr - cfg.lr_min) * (
                1 + jnp.cos(jnp.pi * epoch / cfg.t_initial)
            )
            cos_lr = jnp.where(epoch < cfg.t_initial, cos_lr, cfg.lr_min)
            return jnp.where(epoch < cfg.warmup_t, warmup_lr(epoch), cos_lr)

        return schedule

    if cfg.type == "step":
        # timm StepLRScheduler: base * decay_rate ** (t // decay_t), with
        # the same linear warmup head.
        def schedule(step):
            epoch = jnp.floor(step / steps_per_epoch)
            n_decays = jnp.floor(epoch / jnp.maximum(cfg.t_initial, 1))
            lr = base_lr * (cfg.decay_rate ** n_decays)
            return jnp.where(epoch < cfg.warmup_t, warmup_lr(epoch), lr) \
                if cfg.warmup_t > 0 else lr

        return schedule

    if cfg.type == "multistep":
        # timm MultiStepLRScheduler: base * rate ** bisect_right(decay_t, t)
        # ((epoch >= b).sum() == bisect_right for sorted boundaries).
        boundaries = jnp.asarray(cfg.decay_steps, dtype=jnp.float32)

        def schedule(step):
            epoch = jnp.floor(step / steps_per_epoch)
            n_decays = (epoch >= boundaries).sum()
            lr = base_lr * (cfg.decay_rate ** n_decays)
            return jnp.where(epoch < cfg.warmup_t, warmup_lr(epoch), lr) \
                if cfg.warmup_t > 0 else lr

        return schedule

    raise ValueError(f"Unknown LR scheduler type: {cfg.type!r}")


def build_optimizer(
    cfg: Union[Config, OptimConfig],
    scheduler: Optional[SchedulerConfig] = None,
    steps_per_epoch: int = 1,
    max_norm: Optional[float] = None,
    accum_iter: int = 1,
) -> optax.GradientTransformation:
    if isinstance(cfg, Config):
        scheduler = cfg.lr_scheduler
        max_norm = cfg.train.max_norm
        accum_iter = cfg.train.accum_iter
        cfg = cfg.optim
    # Under MultiSteps the inner schedule's step count advances once per
    # GRADIENT step (every accum_iter micro-steps), while steps_per_epoch
    # arrives in micro-steps — pace the schedule in gradient steps so one
    # schedule epoch stays one data epoch (the reference steps its
    # scheduler per epoch regardless of ACCUM_ITER, main.py:321-322).
    schedule_steps = steps_per_epoch
    if accum_iter and accum_iter > 1:
        schedule_steps = max(1, steps_per_epoch // accum_iter)
    lr = build_schedule(scheduler or SchedulerConfig(), cfg.lr, schedule_steps)

    if cfg.type == "sgd":
        core = optax.sgd(lr, momentum=cfg.momentum or None)
        if cfg.weight_decay:
            core = optax.chain(optax.add_decayed_weights(cfg.weight_decay), core)
    elif cfg.type == "adam":
        core = optax.adam(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)
        if cfg.weight_decay:
            core = optax.chain(optax.add_decayed_weights(cfg.weight_decay), core)
    elif cfg.type == "adamw":
        core = optax.adamw(
            lr,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    elif cfg.type in ("rmsprop", "rms"):
        core = optax.chain(
            scale_by_torch_rms(decay=cfg.rms_decay, eps=cfg.eps),
            optax.scale_by_learning_rate(lr),
        )
        if cfg.weight_decay:
            # torch RMSprop adds wd*p to the gradient BEFORE the
            # square-average update (no reference run sets this — both
            # factories pass lr only, Fall_2_Spatial_Temporal_SR/
            # optimizer.py:21, Multimodal_Fall3/main.py:355-357 — but a
            # user-set optim.weight_decay must not be silently dropped)
            core = optax.chain(
                optax.add_decayed_weights(cfg.weight_decay), core
            )
    else:
        raise ValueError(f"Unknown optimizer type: {cfg.type!r}")

    if max_norm is not None and max_norm > 0:
        core = optax.chain(optax.clip_by_global_norm(max_norm), core)
    if accum_iter and accum_iter > 1:
        # microbatch gradient accumulation (reference ACCUM_ITER,
        # config.py:10 / main.py:118-132): k steps of gradient averaging
        # per optimizer update, as a pure optax wrapper so the scanned
        # train step is unchanged.
        core = optax.MultiSteps(core, every_k_schedule=accum_iter)
    return core
