"""faster_orefsdet_tpu — a TPU-native (JAX/XLA/Pallas) few-shot ore detection framework.

A from-scratch rebuild of the capabilities of MVME-HBUT/Faster-OreFSDet
(Pattern Recognition 2023, arXiv:2305.01183): a lightweight few-shot object
detector composed of a VoVNet-19-slim-eSE + FPN backbone, a support/query
matching stage (spatial-shift MLP "SM block" + factorized depthwise
cross-correlation "CGM"), and a CenterNet2 probabilistic two-stage head.

Design stance (see SURVEY.md §7): pure-functional Flax modules, one jitted
query-path graph, static shapes everywhere, shard_map data parallelism,
orbax checkpoints, typed config. Reference call sites are cited in
docstrings as ``<path>:<line>`` into /root/reference for parity review;
no reference code is copied.
"""

__version__ = "0.1.0"
