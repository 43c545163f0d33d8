"""Weight-import workflow integration: synthetic torch checkpoint →
convert → npz → CLI-style load → inference produces identical outputs to
applying the converted tree directly."""

import numpy as np

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.config import get_config
from faster_orefsdet_tpu.pipelines.inference import make_detector
from faster_orefsdet_tpu.utils.checkpoint import load_params_npz, save_params_npz
from faster_orefsdet_tpu.utils.params import init_params
from faster_orefsdet_tpu.utils.torch_convert import convert_torch_checkpoint

from test_torch_parity import make_torch_state_dict


def test_convert_save_load_roundtrip(tmp_path):
    cfg = get_config("finetune_vovnet")
    model = make_detector(cfg)
    template = init_params(model, cfg, jax.random.PRNGKey(0))

    sd = make_torch_state_dict(seed=3)
    converted = convert_torch_checkpoint(sd)
    p = str(tmp_path / "model_final.npz")
    save_params_npz(p, converted)
    loaded = load_params_npz(p, template)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 96, 3), dtype=np.float32))
    a = model.apply({"params": converted}, x, method=model.features)
    b = model.apply({"params": loaded}, x, method=model.features)
    for lvl in ("p3", "p4", "p5"):
        np.testing.assert_array_equal(np.asarray(a[lvl]), np.asarray(b[lvl]))


def test_d2_checkpoint_wrapper_accepted():
    """d2 saves {'model': state_dict, 'optimizer': ..., ...} — the converter
    must unwrap it (DetectionCheckpointer format)."""
    sd = make_torch_state_dict(seed=4)
    wrapped = {"model": sd, "iteration": 11999}
    tree = convert_torch_checkpoint(wrapped)
    assert "backbone" in tree and "roi" in tree
