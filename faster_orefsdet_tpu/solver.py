"""Optimizer + LR schedule: SGD with momentum, warmup-multistep, param groups.

Re-derivation of fewx/solver/build.py:93-167 on optax:
  - SGD + momentum 0.9, weight decay 1e-4 (decoupled exactly as torch SGD
    couples it: wd folded into the gradient before momentum);
  - `box_predictor` params get HEAD_LR_FACTOR x LR (:132-133) — here the
    cascade cls/bbox Dense layers;
  - norm params get WEIGHT_DECAY_NORM (= 0.0);
  - WarmupMultiStepLR (steps (10000, 11000), gamma 0.1, linear warmup 500
    iters from factor 2.5e-4);
  - elementwise gradient clipping at 1.0 (SOLVER.CLIP_GRADIENTS, type
    "value" — d2 clip_grad_value_);
  - backbone freezing (FREEZE_AT=3: stem, stage2, stage3; vovnet.py:455-469)
    and FrozenBN params are masked out of the update entirely.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from .config import SolverConfig


def warmup_multistep_schedule(cfg: SolverConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """d2 WarmupMultiStepLR: linear warmup from warmup_factor -> 1 over
    warmup_iters, then gamma^k decay at each milestone."""
    steps = jnp.asarray(cfg.steps)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        alpha = count / cfg.warmup_iters
        warmup = jnp.where(
            count < cfg.warmup_iters,
            cfg.warmup_factor * (1 - alpha) + alpha,
            1.0,
        )
        k = jnp.sum(count >= steps)
        return cfg.base_lr * warmup * (cfg.gamma**k)

    return schedule


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def param_labels(params) -> Any:
    """Label pytree: 'frozen' | 'head' | 'norm' | 'base'.

    frozen: backbone stem+stage2+stage3 (FREEZE_AT=3) and every FrozenBN
            scale/bias anywhere (the reference freezes all BN, vovnet.py:459-461)
    head:   cascade box predictor cls/bbox (HEAD_LR_FACTOR, solver/build.py:132)
    norm:   GroupNorm scale/bias (WEIGHT_DECAY_NORM=0)
    """

    def label(path, _):
        p = _path_str(path)
        if "/norm/" in p or p.endswith("/norm/scale") or p.endswith("/norm/bias"):
            # FrozenBN params — never trained in the reference
            return "frozen"
        if p.startswith("backbone/stem") or p.startswith("backbone/stage2_") or p.startswith(
            "backbone/stage3_"
        ):
            return "frozen"
        if "_cls/" in p or "_bbox/" in p:
            return "head"
        if "_gn/" in p or "GroupNorm" in p or "/gn/" in p or "/bn/" in p:
            # trainable norms: BiFPN GroupNorm + DLA BatchNorm (dla.norm="BN")
            # — WEIGHT_DECAY_NORM group, never frozen (d2 solver/build.py)
            return "norm"
        return "base"

    return jax.tree_util.tree_map_with_path(label, params)


def _sgd(lr_schedule, cfg: SolverConfig, lr_factor: float, weight_decay: float):
    return optax.chain(
        optax.clip(cfg.clip_value) if cfg.clip_gradients else optax.identity(),
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.sgd(
            lambda c: lr_schedule(c) * lr_factor,
            momentum=cfg.momentum,
            nesterov=cfg.nesterov,
        ),
    )


def build_optimizer(cfg: SolverConfig, params) -> optax.GradientTransformation:
    schedule = warmup_multistep_schedule(cfg)
    labels = param_labels(params)
    tx = optax.multi_transform(
        {
            "base": _sgd(schedule, cfg, 1.0, cfg.weight_decay),
            "head": _sgd(schedule, cfg, cfg.head_lr_factor, cfg.weight_decay),
            "norm": _sgd(schedule, cfg, 1.0, cfg.weight_decay_norm),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    return tx
