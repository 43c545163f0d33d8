"""Optimizer + LR schedule: SGD with momentum, warmup schedules, param groups.

Re-derivation of fewx/solver/build.py:93-167 on optax:
  - SGD + momentum 0.9, weight decay 1e-4 (decoupled exactly as torch SGD
    couples it: wd folded into the gradient before momentum);
  - `box_predictor` params get HEAD_LR_FACTOR x LR (:132-133) — here the
    cascade cls/bbox Dense layers;
  - norm params get WEIGHT_DECAY_NORM (= 0.0);
  - SOLVER.LR_SCHEDULER_NAME selects WarmupMultiStepLR (steps (10000, 11000),
    gamma 0.1, linear warmup 500 iters from factor 2.5e-4 — the live path) or
    WarmupCosineLR (build.py:148-167; formulas from
    detectron2.7z!solver/lr_scheduler.py:132-238);
  - SOLVER.CLIP_GRADIENTS: CLIP_TYPE "value" (d2 clip_grad_value_, the live
    path) or "norm" (clip_grad_norm_ with NORM_TYPE, applied PER PARAMETER —
    d2's wrapper loops `for p in group["params"]: clipper(p)`,
    build.py:47-51, so the norm is per-tensor, not global);
  - backbone freezing (FREEZE_AT=3: stem, stage2, stage3; vovnet.py:455-469)
    and FrozenBN params are masked out of the update entirely.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from .config import SolverConfig


def _warmup_factor(count: jnp.ndarray, cfg: SolverConfig) -> jnp.ndarray:
    """d2 _get_warmup_factor_at_iter (detectron2.7z!solver/lr_scheduler.py:
    212-238): 1.0 past warmup_iters; during warmup, "linear" interpolates
    warmup_factor -> 1 and "constant" holds warmup_factor."""
    if cfg.warmup_method == "linear":
        alpha = count / cfg.warmup_iters
        during = cfg.warmup_factor * (1 - alpha) + alpha
    elif cfg.warmup_method == "constant":
        during = jnp.asarray(cfg.warmup_factor, jnp.float32)
    else:
        raise ValueError(f"Unknown warmup method: {cfg.warmup_method}")
    return jnp.where(count < cfg.warmup_iters, during, 1.0)


def warmup_multistep_schedule(cfg: SolverConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """d2 WarmupMultiStepLR (detectron2.7z!solver/lr_scheduler.py:132-164):
    warmup to 1, then gamma^k decay at each milestone."""
    steps = jnp.asarray(cfg.steps)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        k = jnp.sum(count >= steps)
        return cfg.base_lr * _warmup_factor(count, cfg) * (cfg.gamma**k)

    return schedule


def warmup_cosine_schedule(cfg: SolverConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """d2 WarmupCosineLR (detectron2.7z!solver/lr_scheduler.py:171-205):
    warmup factor times the standard half-cosine over [0, max_iter] — the
    cosine period starts at iter 0, not at warmup end (their comment
    :194-198 makes that choice explicit)."""

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * count / cfg.max_iter))
        return cfg.base_lr * _warmup_factor(count, cfg) * cos

    return schedule


def build_schedule(cfg: SolverConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """SOLVER.LR_SCHEDULER_NAME dispatch (fewx/solver/build.py:142-167)."""
    if cfg.lr_scheduler_name == "WarmupMultiStepLR":
        return warmup_multistep_schedule(cfg)
    if cfg.lr_scheduler_name == "WarmupCosineLR":
        return warmup_cosine_schedule(cfg)
    raise ValueError(f"Unknown LR scheduler: {cfg.lr_scheduler_name}")


def clip_by_param_norm(max_norm: float, norm_type: float = 2.0):
    """Per-parameter p-norm clipping: each leaf g becomes
    g * min(1, max_norm / (||g||_p + 1e-6)).

    Matches torch clip_grad_norm_ applied to ONE tensor at a time — which is
    what the reference's wrapped optimizer does (`for p in group["params"]:
    clipper(p)`, fewx/solver/build.py:47-51), NOT a global-norm clip."""

    import math

    def clip(g):
        g32 = g.astype(jnp.float32)
        if math.isinf(norm_type):
            n = jnp.max(jnp.abs(g32))
        else:
            n = jnp.sum(jnp.abs(g32) ** norm_type) ** (1.0 / norm_type)
        scale = jnp.minimum(1.0, max_norm / (n + 1e-6))
        return (g32 * scale).astype(g.dtype)

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def _clip_transform(cfg: SolverConfig):
    """SOLVER.CLIP_GRADIENTS.CLIP_TYPE dispatch (fewx/solver/build.py:14-36)."""
    if not cfg.clip_gradients:
        return optax.identity()
    if cfg.clip_type == "value":
        return optax.clip(cfg.clip_value)
    if cfg.clip_type == "norm":
        return clip_by_param_norm(cfg.clip_value, cfg.norm_type)
    raise ValueError(f"Unknown gradient clip type: {cfg.clip_type}")


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
        _clip_transform(cfg),
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.sgd(
            lambda c: lr_schedule(c) * lr_factor,
            momentum=cfg.momentum,
            nesterov=cfg.nesterov,
        ),
    )


def build_optimizer(cfg: SolverConfig, params) -> optax.GradientTransformation:
    schedule = build_schedule(cfg)
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
