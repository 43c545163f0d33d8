"""Micro-bench: multilevel ROIAlign packing variants at serving batch.

Times (two-point slope, RTT-cancelling) the dual-pooler multilevel pooling
at batch B images x R boxes, plus each contraction stage of the separable
formulation in isolation, to verify the MXU packing of the box-shared
matmul (ops/roi_align.py). Usage: python tools/roi_bench.py [B] [reps]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from faster_orefsdet_tpu.ops.roi_align import multilevel_roi_align, roi_align


def main():
    b = int(_sys.argv[1]) if len(_sys.argv) > 1 else 128
    reps = int(_sys.argv[2]) if len(_sys.argv) > 2 else 10
    c = 128
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32)).astype(jnp.bfloat16)
        for h, w in ((40, 56), (20, 28), (10, 14))
    ]
    r = 256
    centers = rng.uniform(30, 280, (b, r, 2)).astype(np.float32)
    wh = rng.uniform(16.0, 120.0, (b, r, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([centers - wh / 2, centers + wh / 2], -1))

    def slope(name, fn, *args):
        def chained(n):
            @jax.jit
            def run(*a):
                def body(i, carry):
                    return jnp.sum(fn(carry, *a)).astype(jnp.float32) * 1e-12
                return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))
            return run
        lo, hi = chained(reps), chained(4 * reps)
        t0 = time.perf_counter()
        float(lo(*args)); float(hi(*args))
        compile_s = time.perf_counter() - t0
        def best(run):
            rs = []
            for _ in range(3):
                t0 = time.perf_counter(); float(run(*args)); rs.append(time.perf_counter() - t0)
            return min(rs)
        t_lo, t_hi = best(lo), best(hi)
        us = (t_hi - t_lo) / (3 * reps) / b * 1e6
        print(f"[{name}] {us:.1f} us/img (compile {compile_s:.0f}s)", flush=True)

    def pool_dual(carry, f3, f4, f5, bx):
        def one(a3, a4, a5, bb):
            p8 = multilevel_roi_align([a3, a4, a5], bb + carry, [8, 16, 32], 8, 0)
            p4 = multilevel_roi_align([a3, a4, a5], bb + carry, [8, 16, 32], 4, 0)
            return jnp.sum(p8).astype(jnp.float32) + jnp.sum(p4).astype(jnp.float32)
        return jax.vmap(one)(f3, f4, f5, bx)

    slope("dual-pooler multilevel", pool_dual, *feats, boxes)

    # stage isolation on p3 only, 8x8
    from faster_orefsdet_tpu.ops.roi_align import _interp_matrix

    def mats(bb, hh, ww, scale, p):
        def one(box):
            sx = box[0] * scale - 0.5
            sy = box[1] * scale - 0.5
            w = jnp.maximum(box[2] * scale - 0.5 - sx, 1e-6)
            h = jnp.maximum(box[3] * scale - 0.5 - sy, 1e-6)
            return (_interp_matrix(sy, h, hh, p, 0), _interp_matrix(sx, w, ww, p, 0))
        return jax.vmap(one)(bb)

    def stage1(carry, f3, bx):
        def one(a3, bb):
            ays, _ = mats(bb, 40, 56, 1 / 8, 8)
            t = jnp.einsum("rph,hwc->rpwc", ays, a3 + carry,
                           preferred_element_type=jnp.float32)
            return jnp.sum(t).astype(jnp.float32)
        return jax.vmap(one)(f3, bx)

    slope("stage1 einsum p3", stage1, feats[0], boxes)

    def stage1_explicit(carry, f3, bx):
        def one(a3, bb):
            ays, _ = mats(bb, 40, 56, 1 / 8, 8)
            rp = ays.reshape(-1, 40)
            fm = (a3 + carry).reshape(40, -1)
            t = jnp.dot(rp, fm, preferred_element_type=jnp.float32)
            return jnp.sum(t).astype(jnp.float32)
        return jax.vmap(one)(f3, bx)

    slope("stage1 explicit reshape-matmul p3", stage1_explicit, feats[0], boxes)

    def stage2(carry, f3, bx):
        def one(a3, bb):
            ays, axs = mats(bb, 40, 56, 1 / 8, 8)
            t = jnp.einsum("rph,hwc->rpwc", ays, a3,
                           preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            out = jnp.einsum("rqw,rpwc->rpqc", axs + carry, t,
                             preferred_element_type=jnp.float32)
            return jnp.sum(out).astype(jnp.float32)
        return jax.vmap(one)(f3, bx)

    slope("stage1+2 p3", stage2, feats[0], boxes)

    def matsonly(carry, f3, bx):
        def one(a3, bb):
            ays, axs = mats(bb + carry, 40, 56, 1 / 8, 8)
            return jnp.sum(ays).astype(jnp.float32) + jnp.sum(axs).astype(jnp.float32)
        return jax.vmap(one)(f3, bx)

    slope("interp-matrix build p3", matsonly, feats[0], boxes)




def variants():
    b = int(_sys.argv[1]) if len(_sys.argv) > 1 else 128
    reps = int(_sys.argv[2]) if len(_sys.argv) > 2 else 10
    c = 128
    rng = np.random.default_rng(0)
    f3 = jnp.asarray(rng.standard_normal((b, 40, 56, c)).astype(np.float32)).astype(jnp.bfloat16)
    r = 256
    centers = rng.uniform(30, 280, (b, r, 2)).astype(np.float32)
    wh = rng.uniform(16.0, 120.0, (b, r, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([centers - wh / 2, centers + wh / 2], -1))

    from faster_orefsdet_tpu.ops.roi_align import _interp_matrix

    def mats(bb, hh, ww, scale, p):
        def one(box):
            sx = box[0] * scale - 0.5
            sy = box[1] * scale - 0.5
            w = jnp.maximum(box[2] * scale - 0.5 - sx, 1e-6)
            h = jnp.maximum(box[3] * scale - 0.5 - sy, 1e-6)
            return (_interp_matrix(sy, h, hh, p, 0), _interp_matrix(sx, w, ww, p, 0))
        return jax.vmap(one)(bb)

    def slope(name, fn, *args):
        def chained(n):
            @jax.jit
            def run(*a):
                def body(i, carry):
                    return jnp.sum(fn(carry, *a)).astype(jnp.float32) * 1e-12
                return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))
            return run
        lo, hi = chained(reps), chained(4 * reps)
        float(lo(*args)); float(hi(*args))
        def best(run):
            rs = []
            for _ in range(3):
                t0 = time.perf_counter(); float(run(*args)); rs.append(time.perf_counter() - t0)
            return min(rs)
        t_lo, t_hi = best(lo), best(hi)
        print(f"[{name}] {(t_hi - t_lo) / (3 * reps) / b * 1e6:.1f} us/img", flush=True)

    def full_b(carry, f3, bx):
        """stage1 on F pre-permuted to [H, C, W]; stage2 as ONE batched
        dot_general [R, P*C, W] x [R, Q, W]."""
        def one(a3, bb):
            ays, axs = mats(bb, 40, 56, 1 / 8, 8)
            fp = (a3 + carry).transpose(0, 2, 1).reshape(40, c * 56)
            t = jnp.dot(ays.reshape(-1, 40), fp, preferred_element_type=jnp.float32)
            t = t.astype(jnp.bfloat16).reshape(r, 8 * c, 56)
            out = jax.lax.dot_general(
                t, axs, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [R, P*C, Q]
            return jnp.sum(out).astype(jnp.float32)
        return jax.vmap(one)(f3, bx)

    slope("variantB f-perm + batched dg", full_b, f3, boxes)

    def full_c(carry, f3, bx):
        """stage2 as einsum rqw,rpcw->rpqc on [R,P,C,W] t."""
        def one(a3, bb):
            ays, axs = mats(bb, 40, 56, 1 / 8, 8)
            fp = (a3 + carry).transpose(0, 2, 1).reshape(40, c * 56)
            t = jnp.dot(ays.reshape(-1, 40), fp, preferred_element_type=jnp.float32)
            t = t.astype(jnp.bfloat16).reshape(r, 8, c, 56)
            out = jnp.einsum("rqw,rpcw->rpqc", axs, t,
                             preferred_element_type=jnp.float32)
            return jnp.sum(out).astype(jnp.float32)
        return jax.vmap(one)(f3, bx)

    slope("variantC einsum rpcw", full_c, f3, boxes)





if __name__ == "__main__":
    if "--variants" in _sys.argv:
        variants()
    else:
        main()
