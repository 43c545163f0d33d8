"""Parse the published model-structure dump (the reference test log's module
tree, log/fsod_finetune_stone_vovnet_25_test_log.txt:548-805) into the exact
state_dict key->shape map, vendored to tests/data/published_state_dict.json.

The key NAMES are the checkpoint file-format spec (what a real
model_final.pth will contain); this is data, not code."""
import json
import os
import re
import sys

LOG = "/root/reference/log/fsod_finetune_stone_vovnet_25_test_log.txt"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "published_state_dict.json")

lines = open(LOG, errors="ignore").read().splitlines()[547:805]
assert lines[0].startswith("CenterNet2Detector(")

keys = {}
stack = []  # module path segments


def add(path, suffix, shape):
    keys[".".join(path + [suffix])] = shape


mod_re = re.compile(r"^\s*\((.+?)\): (\w+)(\(.*)?$")
for ln in lines[1:]:
    s = ln.strip()
    if not s:
        continue
    if s == ")":
        if stack:
            stack.pop()
        continue
    m = mod_re.match(ln)
    if not m:
        continue
    name, typ, rest = m.group(1), m.group(2), m.group(3) or ""
    opens = rest.count("(") - rest.count(")")  # rest includes the Type's own (
    is_block = opens > 0
    path = stack + [name]
    if typ == "Conv2d":
        cm = re.match(r"\((\d+), (\d+), kernel_size=\((\d+), (\d+)\)", rest)
        cin, cout, kh, kw = map(int, cm.groups())
        add(path, "weight", [cout, cin, kh, kw])
        if "bias=False" not in rest:
            add(path, "bias", [cout])
    elif typ == "Linear":
        lm = re.search(r"in_features=(\d+), out_features=(\d+)", rest)
        i, o = map(int, lm.groups())
        add(path, "weight", [o, i])
        if "bias=False" not in rest:
            add(path, "bias", [o])
    elif typ == "FrozenBatchNorm2d":
        c = int(re.search(r"num_features=(\d+)", rest).group(1))
        for suf in ("weight", "bias", "running_mean", "running_var"):
            add(path, suf, [c])
    elif typ == "GroupNorm":
        c = int(re.search(r"GroupNorm\(\d+, (\d+)", s).group(1))
        add(path, "weight", [c])
        add(path, "bias", [c])
    elif typ == "Scale":
        # nn.Parameter(torch.FloatTensor([1.0])) — shape (1,)
        # (CenterNet2/centernet/modeling/dense_heads/centernet_head.py:16)
        add(path, "scale", [1])
    if is_block:
        stack.append(name)

os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as f:
    json.dump(keys, f, indent=0, sort_keys=True)
print(f"{len(keys)} keys -> {OUT}")
# sanity: spot-check a few
for k in ("backbone.bottom_up.stem.stem_1/conv.weight",
          "roi_heads.box_head.0.fc1.weight",
          "proposal_generator.centernet_head.scales.0.scale",
          "vip_p3.mlp_h.weight", "conv3.weight", "roi_heads.fc2.weight"):
    assert k in keys, k
print("spot checks ok")
