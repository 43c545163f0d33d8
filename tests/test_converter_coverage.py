"""Converter key-coverage guard (VERDICT r2 next #4): a synthetic state_dict
with the EXACT key set of the published model (parsed from the module tree
the reference's own test log prints,
log/fsod_finetune_stone_vovnet_25_test_log.txt:548-805, vendored as
tests/data/published_state_dict.json by tools/gen_published_keys.py) must be
FULLY consumed by convert_torch_checkpoint — every key either read into the
flax tree or on the documented dead list. The day a real model_final.pth
appears, conversion is mechanical."""

import json
import os

import numpy as np
import pytest
import torch

import jax

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector
from faster_orefsdet_tpu.utils.params import init_params
from faster_orefsdet_tpu.utils.torch_convert import convert_torch_checkpoint

DATA = os.path.join(os.path.dirname(__file__), "data", "published_state_dict.json")

# Parameters present in model_final.pth that the converter deliberately
# drops — each dead in the reference's own forward:
DEAD_KEYS = {
    # 4x4 cls_attn branch computed then DISCARDED (fsod_roi_heads.py:513-517
    # — `_run_stage` returns box_predictor(attn_8), never cls_attn)
    "roi_heads.fc2.weight", "roi_heads.fc2.bias",
    "roi_heads.fc3.weight", "roi_heads.fc3.bias",
    # CGM residual branch commented out at every use site
    # (fsod_cen.py:246,261,276: `#+torch.cat((self.conv1(attn)...`)
    "conv1.weight", "conv1.bias",
    "conv2.weight", "conv2.bias",
}


class TrackingDict(dict):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.read = set()

    def __getitem__(self, key):
        self.read.add(key)
        return super().__getitem__(key)

    def get(self, key, default=None):
        if key in self:
            return self[key]
        return default


@pytest.fixture(scope="module")
def published_sd():
    with open(DATA) as f:
        shapes = json.load(f)
    g = np.random.default_rng(0)
    sd = {}
    for k, shp in shapes.items():
        v = np.asarray(g.standard_normal(shp) * 0.05, np.float32)
        if k.endswith("running_var"):
            v = np.abs(v) + 0.1  # variances are positive in a real ckpt
        sd[k] = torch.from_numpy(v)
    return TrackingDict(sd)


def test_converter_consumes_every_published_key(published_sd):
    params = convert_torch_checkpoint(published_sd)
    all_keys = set(published_sd.keys())
    consumed = published_sd.read
    assert consumed <= all_keys  # converter never fabricates key names
    assert not (consumed & DEAD_KEYS), (
        f"documented-dead keys were read: {sorted(consumed & DEAD_KEYS)}"
    )
    leftover = all_keys - consumed - DEAD_KEYS
    assert not leftover, (
        f"{len(leftover)} published keys neither converted nor documented "
        f"dead: {sorted(leftover)[:10]}"
    )
    assert params  # a tree came out


def test_converted_tree_matches_model_init(published_sd):
    """Shape-exact against the live model's init tree: conversion output can
    replace init_params verbatim."""
    cfg = get_config("finetune_vovnet")
    model = make_detector(cfg)
    init = init_params(model, cfg, jax.random.PRNGKey(0))
    converted = convert_torch_checkpoint(published_sd)

    flat_i = {"/".join(map(str, p)): v.shape
              for p, v in jax.tree_util.tree_flatten_with_path(init)[0]}
    flat_c = {"/".join(map(str, p)): v.shape
              for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert flat_i.keys() == flat_c.keys(), (
        sorted(set(flat_i) ^ set(flat_c))[:10]
    )
    mismatched = {k: (flat_i[k], flat_c[k]) for k in flat_i
                  if flat_i[k] != flat_c[k]}
    assert not mismatched, mismatched
