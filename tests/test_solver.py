"""Solver golden tests: LR schedules vs the d2 formulas, gradient clipping
vs torch, and the SOLVER.LR_SCHEDULER_NAME / CLIP_GRADIENTS.* yaml surface.

References: fewx/solver/build.py:14-36,142-167 (clip-type + scheduler-name
dispatch) and detectron2.7z!solver/lr_scheduler.py:132-238 (WarmupMultiStepLR,
WarmupCosineLR, _get_warmup_factor_at_iter — re-extract with
tools/extract_d2.py). The clipping goldens run torch's own
clip_grad_value_/clip_grad_norm_; the schedule goldens transcribe the d2
closed form in numpy.
"""

import dataclasses
import math

import numpy as np
import pytest

import jax.numpy as jnp

from faster_orefsdet_tpu.config import SolverConfig
from faster_orefsdet_tpu.solver import (
    build_schedule,
    clip_by_param_norm,
    warmup_cosine_schedule,
    warmup_multistep_schedule,
)


def _d2_warmup(method, it, warmup_iters, warmup_factor):
    # detectron2.7z!solver/lr_scheduler.py:212-238
    if it >= warmup_iters:
        return 1.0
    if method == "constant":
        return warmup_factor
    alpha = it / warmup_iters
    return warmup_factor * (1 - alpha) + alpha


CFG = SolverConfig(
    base_lr=0.02, steps=(60, 80), gamma=0.1, max_iter=100,
    warmup_iters=10, warmup_factor=0.001,
)


@pytest.mark.parametrize("method", ["linear", "constant"])
def test_cosine_schedule_matches_d2(method):
    cfg = dataclasses.replace(CFG, warmup_method=method)
    sched = warmup_cosine_schedule(cfg)
    for it in range(cfg.max_iter + 1):
        expected = (
            cfg.base_lr
            * _d2_warmup(method, it, cfg.warmup_iters, cfg.warmup_factor)
            * 0.5 * (1.0 + math.cos(math.pi * it / cfg.max_iter))
        )  # lr_scheduler.py:199-205
        # f32 on-device cos vs f64 host math
        np.testing.assert_allclose(float(sched(it)), expected, rtol=2e-5, atol=1e-9)


def test_multistep_schedule_matches_d2():
    sched = warmup_multistep_schedule(CFG)
    for it in range(CFG.max_iter + 1):
        k = sum(it >= s for s in CFG.steps)  # bisect_right(milestones, it)
        expected = (
            CFG.base_lr
            * _d2_warmup("linear", it, CFG.warmup_iters, CFG.warmup_factor)
            * CFG.gamma ** k
        )  # lr_scheduler.py:157-164
        np.testing.assert_allclose(float(sched(it)), expected, rtol=1e-6)


def test_build_schedule_dispatch():
    assert float(build_schedule(CFG)(50)) == pytest.approx(0.02)
    cos = build_schedule(dataclasses.replace(CFG, lr_scheduler_name="WarmupCosineLR"))
    assert float(cos(50)) == pytest.approx(0.01)  # half-cosine midpoint
    with pytest.raises(ValueError, match="Unknown LR scheduler"):
        build_schedule(dataclasses.replace(CFG, lr_scheduler_name="StepLR"))
    with pytest.raises(ValueError, match="Unknown warmup method"):
        build_schedule(dataclasses.replace(CFG, warmup_method="exp"))(0)


@pytest.mark.parametrize("norm_type", [2.0, 1.5, float("inf")])
def test_norm_clip_matches_torch_per_tensor(norm_type):
    """clip_by_param_norm == torch clip_grad_norm_ applied per tensor (the
    reference's wrapper clips each param separately, build.py:47-51)."""
    import torch

    rng = np.random.default_rng(0)
    leaves = {
        "a": rng.standard_normal((7, 5)).astype(np.float32) * 3.0,
        "b": rng.standard_normal((11,)).astype(np.float32) * 0.01,  # under the cap
        "c": rng.standard_normal((2, 3, 4)).astype(np.float32) * 10.0,
    }
    max_norm = 1.0
    tx = clip_by_param_norm(max_norm, norm_type)
    clipped, _ = tx.update({k: jnp.asarray(v) for k, v in leaves.items()}, tx.init(None))

    for k, g in leaves.items():
        p = torch.nn.Parameter(torch.zeros(g.shape))
        p.grad = torch.tensor(g)
        torch.nn.utils.clip_grad_norm_([p], max_norm, norm_type=norm_type)
        np.testing.assert_allclose(
            np.asarray(clipped[k]), p.grad.numpy(), rtol=1e-5, atol=1e-7
        )


def test_value_clip_matches_torch():
    import torch

    import optax

    rng = np.random.default_rng(1)
    g = rng.standard_normal((6, 4)).astype(np.float32) * 5.0
    clipped = optax.clip(1.0).update({"w": jnp.asarray(g)}, optax.EmptyState())[0]
    p = torch.nn.Parameter(torch.zeros(g.shape))
    p.grad = torch.tensor(g)
    torch.nn.utils.clip_grad_value_([p], 1.0)
    np.testing.assert_allclose(np.asarray(clipped["w"]), p.grad.numpy(), rtol=1e-6)


def test_optimizer_honors_clip_type_and_scheduler():
    """build_optimizer with clip_type='norm' + WarmupCosineLR produces a
    different (finite) update than the default config on the same grads —
    proving the config fields are wired through, not ignored."""
    from faster_orefsdet_tpu.solver import build_optimizer

    params = {"head": {"cascade1_cls": {"kernel": jnp.ones((4, 2)) * 0.1}}}
    grads = {"head": {"cascade1_cls": {"kernel": jnp.full((4, 2), 3.0)}}}

    def one_update(scfg):
        tx = build_optimizer(scfg, params)
        upd, _ = tx.update(grads, tx.init(params), params)
        return np.asarray(upd["head"]["cascade1_cls"]["kernel"])

    base = dataclasses.replace(CFG, warmup_iters=0)
    u_value = one_update(base)
    u_norm = one_update(dataclasses.replace(
        base, clip_type="norm", lr_scheduler_name="WarmupCosineLR"))
    assert np.isfinite(u_value).all() and np.isfinite(u_norm).all()
    assert not np.allclose(u_value, u_norm)
    with pytest.raises(ValueError, match="Unknown gradient clip type"):
        one_update(dataclasses.replace(base, clip_type="full_model"))


def test_yaml_solver_alt_keys(tmp_path):
    from faster_orefsdet_tpu.config_yaml import load_yaml_config

    y = tmp_path / "alt.yaml"
    y.write_text(
        """
MODEL:
  META_ARCHITECTURE: "CenterNet2Detector"
SOLVER:
  LR_SCHEDULER_NAME: "WarmupCosineLR"
  WARMUP_METHOD: "constant"
  CLIP_GRADIENTS:
    ENABLED: True
    CLIP_TYPE: "norm"
    CLIP_VALUE: 5.0
    NORM_TYPE: 2.0
"""
    )
    cfg = load_yaml_config(str(y))
    assert cfg.solver.lr_scheduler_name == "WarmupCosineLR"
    assert cfg.solver.warmup_method == "constant"
    assert cfg.solver.clip_type == "norm"
    assert cfg.solver.clip_value == 5.0
    assert cfg.solver.norm_type == 2.0
