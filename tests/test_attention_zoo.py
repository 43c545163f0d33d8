"""Torch-parity for the attention zoo (CoT / CBAM — dead code in the
reference, rebuilt for inventory completeness; fsod_cen.py:638-812)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.ops.attention import CBAMBlock, CoTAttention


def _t(w):
    return torch.from_numpy(np.asarray(w))


def _tconv(k):  # flax HWIO -> torch OIHW
    return _t(np.transpose(np.asarray(k), (3, 2, 0, 1)).copy())


def _bn_eval(x, scale, bias, mean, var):
    return (x - _t(mean)[:, None, None]) / torch.sqrt(
        _t(var)[:, None, None] + 1e-5
    ) * _t(scale)[:, None, None] + _t(bias)[:, None, None]


def test_cot_attention_matches_torch():
    rng = np.random.default_rng(0)
    c, h, w = 8, 6, 5
    x = rng.standard_normal((2, h, w, c)).astype(np.float32)
    m = CoTAttention(dim=c)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape).astype(np.float32) * 0.2),
        v["params"],
    )
    stats = jax.tree.map(
        lambda p: jnp.asarray(
            (0.5 + np.abs(rng.standard_normal(p.shape))).astype(np.float32)
            if p.shape else p
        ),
        v["batch_stats"],
    )
    out = m.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))

    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    bs = stats

    def bn(y, name):
        return _bn_eval(y, params[name]["scale"], params[name]["bias"],
                        bs[name]["mean"], bs[name]["var"])

    with torch.no_grad():
        k1 = F.conv2d(tx, _tconv(params["key_conv"]["kernel"]), None,
                      padding=1, groups=4)
        k1 = F.relu(bn(k1, "key_bn"))
        val = bn(F.conv2d(tx, _tconv(params["value_conv"]["kernel"])),
                 "value_bn").reshape(2, c, -1)
        y = torch.cat([k1, tx], dim=1)
        att = F.relu(bn(F.conv2d(y, _tconv(params["att_conv1"]["kernel"])),
                        "att_bn"))
        att = F.conv2d(att, _tconv(params["att_conv2"]["kernel"]),
                       _t(params["att_conv2"]["bias"]))
        att = att.reshape(2, c, 9, h, w).mean(2).reshape(2, c, -1)
        k2 = (F.softmax(att, dim=-1) * val).reshape(2, c, h, w)
        t_out = k1 + k2

    np.testing.assert_allclose(
        np.asarray(out), np.transpose(t_out.numpy(), (0, 2, 3, 1)), atol=3e-5
    )


def test_cbam_matches_torch():
    rng = np.random.default_rng(1)
    c, h, w = 32, 7, 9
    red, ks = 16, 7
    x = rng.standard_normal((2, h, w, c)).astype(np.float32)
    m = CBAMBlock(channel=c, reduction=red, kernel_size=ks)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape).astype(np.float32) * 0.3),
        v["params"],
    )
    out = m.apply({"params": params}, jnp.asarray(x))

    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        w1 = _t(np.transpose(np.asarray(params["ca"]["se_fc1"]["kernel"]), (1, 0)).copy())
        w2 = _t(np.transpose(np.asarray(params["ca"]["se_fc2"]["kernel"]), (1, 0)).copy())

        def se(p):  # p: [B,C]
            return F.linear(F.relu(F.linear(p, w1)), w2)

        mx = torch.amax(tx, dim=(2, 3))
        av = torch.mean(tx, dim=(2, 3))
        ca = torch.sigmoid(se(mx) + se(av))[:, :, None, None]
        o = tx * ca
        mx_s = torch.max(o, dim=1, keepdim=True).values
        av_s = torch.mean(o, dim=1, keepdim=True)
        sa = torch.sigmoid(
            F.conv2d(torch.cat([mx_s, av_s], 1),
                     _tconv(params["sa"]["conv"]["kernel"]),
                     _t(params["sa"]["conv"]["bias"]), padding=ks // 2)
        )
        t_out = o * sa + tx

    np.testing.assert_allclose(
        np.asarray(out), np.transpose(t_out.numpy(), (0, 2, 3, 1)), atol=3e-5
    )
