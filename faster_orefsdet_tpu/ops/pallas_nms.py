"""Pallas TPU kernel: greedy NMS with the IoU matrix resident in VMEM.

The XLA fixpoint (ops/nms.nms_mask) materializes the [K,K] suppression
matrix in HBM and re-reads it twice per peeling round — at K=1024 that is
the dominant HBM traffic of the whole decode+NMS stage (131 MB/img at
batch 128, tools/serving_profile.py). Replaces torchvision nms /
detectron2 batched_nms exactly like ops/nms does (strict > threshold,
descending-score greedy, fsod_rpn.py:1184-1210 usage).

This kernel computes IoU in row-chunks into two int8 [K,K] VMEM scratches
(K=1024 → 2 MB total, within the ~16 MB/core budget; see supported()) and
runs the same peeling fixpoint as
VMEM-resident matvecs: HBM traffic is one read of the [K,4] boxes and one
write of the [K] keep mask (~20 KB) — a >1000x byte reduction, moving the
stage off the memory roofline entirely.

Semantics are IDENTICAL to ops.nms.nms_mask (same fixpoint, same masks);
tests/test_pallas_nms.py cross-checks against it and the sequential oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row-chunk for the IoU build: bounds the [CH, K] f32 temporaries. 256 rows
# up to K=1024 (~1 MB each); above that the [K,K] int8 scratches already eat
# 4.5-6.2 MB of the ~16 MB core budget, so the chunk halves to keep the
# loop-body transient stack bounded.
_CHUNK = 256
_MAX_K = 1792  # 2*K*K int8 = 6.125 MiB at the cap — sized against the
# ~16 MB/core v5e VMEM budget with the 128-row chunk transients; interpret-
# mode equivalence tested to the cap (tests/test_pallas_nms.py); compiled-
# mode validation on hardware is step (a) of tools/round5_tpu_queue.sh
# (bench.py carries an XLA-fixpoint fallback until that lands)


def _chunk_for(k: int) -> int:
    return min(_CHUNK if k <= 1024 else 128, k)


def _nms_kernel(boxes_ref, boxes_t_ref, sr_ref, sc_ref, vr_ref, vc_ref,
                kept_ref, e_ref, et_ref, colbuf_ref, vecbuf_ref, *, thr):
    k = boxes_ref.shape[0]
    ch = _chunk_for(k)

    x1c = boxes_t_ref[0:1, :]  # [1, K] column layouts (pre-transposed by XLA)
    y1c = boxes_t_ref[1:2, :]
    x2c = boxes_t_ref[2:3, :]
    y2c = boxes_t_ref[3:4, :]
    area_c = (x2c - x1c) * (y2c - y1c)
    vc = vc_ref[0:1, :]
    sc = sc_ref[0:1, :]

    # ---- suppression matrix e[i, j] = higher-scored i would suppress j
    # (higher-scored == lower sorted row index), built chunk-by-chunk via
    # fori_loop: python-loop unrolling made Mosaic's scoped-VMEM stack sum
    # every iteration's temporaries (blew the 16 MB limit in the batched
    # program); a loop body allocates them ONCE.
    # IoU is SYMMETRIC, so e's transpose is just the opposite strict order on
    # the same chunk — both orientations come out of one pass, no transposes.
    def build_chunk(i, _):
        r0 = i * ch
        x1 = boxes_ref[pl.ds(r0, ch), 0:1]  # [CH, 1] row layouts
        y1 = boxes_ref[pl.ds(r0, ch), 1:2]
        x2 = boxes_ref[pl.ds(r0, ch), 2:3]
        y2 = boxes_ref[pl.ds(r0, ch), 3:4]
        vr = vr_ref[pl.ds(r0, ch), 0:1]
        sr = sr_ref[pl.ds(r0, ch), 0:1]
        iw = jnp.maximum(jnp.minimum(x2, x2c) - jnp.maximum(x1, x1c), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, y2c) - jnp.maximum(y1, y1c), 0.0)
        inter = iw * ih  # [CH, K]
        union = (x2 - x1) * (y2 - y1) + area_c - inter
        iou = inter / jnp.maximum(union, 1e-12)
        rows = jax.lax.broadcasted_iota(jnp.int32, (ch, k), 0) + r0
        cols = jax.lax.broadcasted_iota(jnp.int32, (ch, k), 1)
        hit = (iou > thr) & (vr > 0.5) & (vc > 0.5)
        # NO SORT (same trick as ops.nms): rank by direct score comparison,
        # ties by original index (stable descending-argsort semantics).
        higher = (sr > sc) | ((sr == sc) & (rows < cols))
        lower = (sr < sc) | ((sr == sc) & (rows > cols))
        # int8 storage: 0/1 values, quarter of f32 residency
        e_ref[pl.ds(r0, ch), :] = (hit & higher).astype(jnp.int8)
        et_ref[pl.ds(r0, ch), :] = (hit & lower).astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, k // ch, build_chunk, 0)

    # ---- peeling fixpoint, all state in VMEM. State lives in BOTH
    # orientations ([1,K] rows / [K,1] cols) so every any-reduce is a plain
    # VPU broadcast+reduce against the matching matrix — no MXU matvecs
    # (M=1, 6% packed) and no per-round relayouts. newly_kept/newly_removed
    # are disjoint (crushed => blocked), so 0/1 survives adds/subtracts.
    def cond(state):
        _, _, _, und_c = state
        return jnp.sum(und_c) > 0.0

    f32 = jnp.float32
    # MUST divide k (the wrapper pads k to a multiple of 256, and both chunk
    # sizes {128, 256} divide that): a larger tile would truncate the
    # fori_loop trip count — any_rows would skip rows >= (k//tile)*tile and
    # any_cols would leave the colbuf tail uninitialized, corrupting the
    # keep mask.
    red_ch = _chunk_for(k)

    def any_rows(mat_ref, vec_col):
        """any_i mat[i,j]*vec[i] -> [1,K] bool. fori-chunked over rows: the
        f32 upcast of the int8 scratch is one bounded loop-body transient.
        vec_col is staged through the vecbuf scratch — Mosaic refs support
        pl.ds dynamic slices but plain values do not."""
        vecbuf_ref[:] = vec_col
        def step(i, m):
            r0 = i * red_ch
            part = jnp.max(
                mat_ref[pl.ds(r0, red_ch), :].astype(f32)
                * vecbuf_ref[pl.ds(r0, red_ch), :],
                axis=0, keepdims=True,
            )
            return jnp.maximum(m, part)
        m = jax.lax.fori_loop(0, k // red_ch, step, jnp.zeros((1, k), f32))
        return m > 0.0

    def any_cols(mat_ref, vec_row, out_ref):
        """any_j mat[i,j]*vec[j] -> [K,1] bool via the colbuf scratch
        (row-chunked; lane slices of tiled scratch trip Mosaic layouts)."""
        def step(i, _):
            r0 = i * red_ch
            out_ref[pl.ds(r0, red_ch), :] = jnp.max(
                mat_ref[pl.ds(r0, red_ch), :].astype(f32) * vec_row,
                axis=1, keepdims=True,
            )
            return 0
        jax.lax.fori_loop(0, k // red_ch, step, 0)
        return out_ref[:] > 0.0

    def body(state):
        kept_r, kept_c, und_r, und_c = state
        active_c = jnp.minimum(kept_c + und_c, 1.0)
        active_r = jnp.minimum(kept_r + und_r, 1.0)
        # blocked[j] = any_i e[i,j] & active[i]
        blocked_r = any_rows(e_ref, active_c)
        blocked_c = any_cols(et_ref, active_r, colbuf_ref)
        nk_r = und_r * (1.0 - blocked_r.astype(f32))
        nk_c = und_c * (1.0 - blocked_c.astype(f32))
        kept2_r = kept_r + nk_r
        kept2_c = kept_c + nk_c
        crushed_r = any_rows(e_ref, kept2_c)
        crushed_c = any_cols(et_ref, kept2_r, colbuf_ref)
        nr_r = und_r * crushed_r.astype(jnp.float32)
        nr_c = und_c * crushed_c.astype(jnp.float32)
        return kept2_r, kept2_c, und_r - nk_r - nr_r, und_c - nk_c - nr_c

    kept0_r = jnp.zeros((1, k), jnp.float32)
    kept0_c = jnp.zeros((k, 1), jnp.float32)
    kept, _, _, _ = jax.lax.while_loop(
        cond, body, (kept0_r, kept0_c, vc, vr_ref[:, 0:1])
    )
    kept_ref[:] = kept


def nms_mask_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for ops.nms.nms_mask: boxes [K,4], scores [K], valid [K] ->
    keep mask [K].

    interpret=None auto-selects the Pallas interpreter on the CPU backend
    (numerically identical, slow — CI/tests), the compiled kernel on TPU.

    K is padded up to a multiple of 256 with invalid rows (score -1, valid 0)
    so any K <= supported() cap works; invalid rows can never suppress (the
    hit test requires both sides valid) and start decided-out of the
    fixpoint, so the padded program's first-K keep mask is exactly the
    unpadded program's."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    k = boxes.shape[0]
    kp = -(-k // 256) * 256
    fboxes = boxes.astype(jnp.float32)
    fscores = scores.astype(jnp.float32)
    fvalid = valid.astype(jnp.float32)
    if kp != k:
        pad = kp - k
        fboxes = jnp.concatenate([fboxes, jnp.zeros((pad, 4), jnp.float32)])
        fscores = jnp.concatenate([fscores, jnp.full((pad,), -1.0, jnp.float32)])
        fvalid = jnp.concatenate([fvalid, jnp.zeros((pad,), jnp.float32)])

    kept = pl.pallas_call(
        functools.partial(_nms_kernel, thr=float(iou_threshold)),
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((kp, kp), jnp.int8),  # e (rank-DAG suppression)
            pltpu.VMEM((kp, kp), jnp.int8),  # e^T (by IoU symmetry)
            pltpu.VMEM((kp, 1), jnp.float32),  # column-reduce buffer
            pltpu.VMEM((kp, 1), jnp.float32),  # any_rows vector staging
        ],
        interpret=interpret,
    )(fboxes, fboxes.T, fscores[:, None], fscores[None, :],
      fvalid[:, None], fvalid[None, :])

    return kept[0, :k] > 0.5


def batched_nms_mask_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Class-aware variant via the coordinate-offset trick (d2 batched_nms)."""
    if boxes.shape[0] == 0:
        return valid
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = classes.astype(boxes.dtype) * max_coord
    return nms_mask_pallas(
        boxes + offsets[:, None], scores, valid, iou_threshold, interpret=interpret
    )


def supported(k: int) -> bool:
    """Kernel applicability: any K <= _MAX_K (=1792). The wrapper pads K up
    to a multiple of 256, so there is no divisibility cliff (pre-round-5 the
    gate also required K % 256 == 0, which dropped every non-multiple K to
    the XLA fixpoint — e.g. the fast preset's 64-box ROI final NMS and any
    small-canvas decode set. NOTE the decode-stage NMS at the standard
    320x448 canvas runs at the nms_budget_test=1024 working set — a
    multiple, so it has been kernel-covered since round 2; the ~1700 figure
    sometimes quoted for it is the PRE-budget candidate count, trimmed by
    top-k before NMS, models/centernet.py:112-117). At the cap the two
    [K,K] int8 scratches are 6.125 MiB and the build/reduce loops run
    128-row chunks ([128, K] f32 transients, 0.875 MiB each) — together a
    bounded slice of the ~16 MB/core VMEM budget."""
    return 0 < k <= _MAX_K
