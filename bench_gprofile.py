#!/usr/bin/env python
"""Fine-grained generator attribution + per-block s2d A/B.

Where do the ~138 ms of 'residual G fwd+bwd' (PERF.md §4) actually go,
block by block and op-class by op-class — and which blocks does the
space-to-depth conv lowering (RUNTIME.S2D_CONVS, ops/s2d_conv.py)
actually speed up on this backend?

For each SAGB block and cumulative-fusion block at the flagship recipe
(GF=32, batch 32, bf16) this times, fwd+bwd, value-fetch synchronised:

  1. the block's two 3x3 convs ALONE at the block's exact shapes
     (the MXU-bound part),
  2. the FULL block with the plain conv lowering, and
  3. the FULL block with the s2d lowering (narrow-Cout blocks only).

(2)-(1) per block is the elementwise/BN overhead XLA could not fuse away;
(3) vs (2) is the s2d decision for that block's channel width. Low conv
TFLOP/s on the (1) rows = MXU starvation from quarter-full output-channel
lanes (PERF.md §4).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _time_compiled(compiled, args, iters=8, windows=3):
    import jax
    import numpy as np

    def fetch(out):
        leaves = jax.tree_util.tree_leaves(out)
        v = float(np.asarray(leaves[0]).ravel()[0])
        assert v == v, "NaN from timed program"
        return v

    out = compiled(*args)
    fetch(out)
    best = None
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(*args)
        fetch(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def _grad_program(loss_fn, args):
    """Compile the full fwd+bwd of ``loss_fn`` w.r.t. EVERY argument.

    Differentiating w.r.t. all args (params AND activations) and using a
    quadratic reduction keeps the forward alive: with a linear sum loss
    and params-only grads, XLA dead-code-eliminates the forward conv and
    the dx conv, leaving only the dW conv (~1/3 of real fwd+bwd cost) —
    which is what an earlier version of this script silently measured.
    Returns (compiled, cost_flops_tflop, time_args).
    """
    import jax

    g = jax.jit(jax.grad(loss_fn, argnums=tuple(range(len(args)))))
    comp = g.lower(*args).compile()
    cost = comp.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    return comp, float(cost.get("flops", 0.0)) / 1e12


def main():
    import jax
    import jax.numpy as jnp

    from eegan_tpu.models.generator import CumBlock, SAGBBlock
    from eegan_tpu.models.layers import conv3x3

    b = int(os.environ.get("EEGAN_GPROF_BATCH", "32"))
    ngf = int(os.environ.get("EEGAN_GPROF_NGF", "32"))
    key = jax.random.PRNGKey(0)

    # (name, spatial_in, in_ch, out_ch, upsample_first, pred_mask)
    blocks = [
        ("block0", 4, ngf * 8, ngf * 8, False, True),
        ("block1", 4, ngf * 8, ngf * 8, True, True),
        ("block2", 8, ngf * 8, ngf * 8, True, True),
        ("block3", 16, ngf * 8, ngf * 8, True, True),
        ("block4", 32, ngf * 8, ngf * 4, True, True),
        ("block5", 64, ngf * 4, ngf * 2, True, True),
        ("block6", 128, ngf * 2, ngf * 1, True, False),  # no mask head at 256
    ]

    def sq(y):
        return jnp.sum(jnp.square(y.astype(jnp.float32)))

    def time_convs(s, cin, cout, s2d):
        """The block's two 3x3 convs alone, REAL fwd+bwd (dx+dW), bf16."""
        conv_a = conv3x3(cout, dtype=jnp.bfloat16, s2d=s2d, name="a")
        conv_b = conv3x3(cout, dtype=jnp.bfloat16, s2d=s2d, name="bconv")
        x1 = jax.random.normal(key, (b, s, s, cin), jnp.bfloat16)
        pa = conv_a.init(key, x1)["params"]
        x2 = jax.random.normal(key, (b, s, s, cout), jnp.bfloat16)
        pb = conv_b.init(key, x2)["params"]

        def convs_loss(pa, pb, x1, x2):
            return (sq(conv_a.apply({"params": pa}, x1))
                    + sq(conv_b.apply({"params": pb}, x2)))

        args = (pa, pb, x1, x2)
        comp, tf = _grad_program(convs_loss, args)
        ms = _time_compiled(comp, args) * 1e3
        return ms, tf

    def time_block(name, s_in, cin, cout, up, pred, s2d):
        feat = jax.random.normal(key, (b, s_in, s_in, cin), jnp.float32)
        cond = jax.random.normal(key, (b, 256), jnp.float32)
        mask_logits = jax.random.normal(key, (b, s_in, s_in, 1), jnp.float32)
        blk = SAGBBlock(cout, pred_mask=pred, dtype=jnp.bfloat16, up=up,
                        s2d=s2d, name=name)
        bvars = blk.init(key, feat, cond, cond, mask_logits, True)

        def block_loss(p, feat, cond):
            out = blk.apply({"params": p, "batch_stats": bvars["batch_stats"]},
                            feat, cond, cond, mask_logits, True,
                            mutable=["batch_stats"])[0]
            o, m = out
            r = sq(o)
            if m is not None:
                r = r + sq(m)
            return r

        args = (bvars["params"], feat, cond)
        comp, tf = _grad_program(block_loss, args)
        ms = _time_compiled(comp, args) * 1e3
        return ms, tf

    def time_cum(name, s_prev, cin_prev, cur_ch, s2d):
        prev = jax.random.normal(key, (b, s_prev, s_prev, cin_prev),
                                 jnp.float32)
        cur = jax.random.normal(key, (b, s_prev * 2, s_prev * 2, cur_ch),
                                jnp.float32)
        blk = CumBlock(cur_ch, dtype=jnp.bfloat16, s2d=s2d, name=name)
        bvars = blk.init(key, prev, cur)

        def loss(p, prev, cur):
            return sq(blk.apply({"params": p}, prev, cur))

        args = (bvars["params"], prev, cur)
        comp, _ = _grad_program(loss, args)
        ms = _time_compiled(comp, args) * 1e3
        return ms

    total_conv = 0.0
    total_block = 0.0
    total_s2d = 0.0
    for name, s_in, cin, cout, up, pred in blocks:
        s = s_in * 2 if up else s_in
        conv_ms, conv_tf = time_convs(s, cin, cout, s2d=False)
        blk_ms, blk_tf = time_block(name, s_in, cin, cout, up, pred, s2d=False)
        row = {
            "metric": "gprofile_block", "block": name,
            "res": s, "cin": cin, "cout": cout,
            "conv_ms": round(conv_ms, 2),
            "conv_tflops": round(conv_tf / (conv_ms / 1e3), 1),
            "block_ms": round(blk_ms, 2),
            "overhead_ms": round(blk_ms - conv_ms, 2),
            "value": round(blk_ms, 2), "unit": "ms", "vs_baseline": 1.0,
        }
        if cout < 128:
            s2d_conv_ms, _ = time_convs(s, cin, cout, s2d=True)
            s2d_blk_ms, _ = time_block(name, s_in, cin, cout, up, pred,
                                       s2d=True)
            row["s2d_conv_ms"] = round(s2d_conv_ms, 2)
            row["s2d_block_ms"] = round(s2d_blk_ms, 2)
            row["s2d_speedup"] = round(blk_ms / s2d_blk_ms, 2)
            total_s2d += s2d_blk_ms
        else:
            total_s2d += blk_ms
        total_conv += conv_ms
        total_block += blk_ms
        print(json.dumps(row))
        sys.stdout.flush()

    # Cumulative-fusion tail: (name, prev spatial, prev ch, cur ch)
    cums = [("cum_64", 32, ngf * 8, ngf * 4),
            ("cum_128", 64, ngf * 4, ngf * 2),
            ("cum_256", 128, ngf * 2, ngf * 1)]
    for name, s_prev, cin_prev, cur_ch in cums:
        ms = time_cum(name, s_prev, cin_prev, cur_ch, s2d=False)
        row = {"metric": "gprofile_cum", "block": name,
               "res": s_prev * 2, "ch": cur_ch,
               "block_ms": round(ms, 2),
               "value": round(ms, 2), "unit": "ms", "vs_baseline": 1.0}
        if cur_ch < 128:
            ms2 = time_cum(name, s_prev, cin_prev, cur_ch, s2d=True)
            row["s2d_block_ms"] = round(ms2, 2)
            row["s2d_speedup"] = round(ms / ms2, 2)
            total_s2d += ms2
        else:
            total_s2d += ms
        total_block += ms
        print(json.dumps(row))
        sys.stdout.flush()

    # ToImage heads (BN -> lrelu -> conv3x3(3) -> tanh) at each scale.
    from eegan_tpu.models.layers import ToImage

    for scale, ch in ((64, ngf * 4), (128, ngf * 2), (256, ngf * 1)):
        x = jax.random.normal(key, (b, scale, scale, ch), jnp.float32)
        head = ToImage(dtype=jnp.bfloat16, name=f"toimg{scale}")
        hvars = head.init(key, x, True)

        def loss(p, x):
            y = head.apply(
                {"params": p, "batch_stats": hvars["batch_stats"]},
                x, True, mutable=["batch_stats"])[0]
            return sq(y)

        args = (hvars["params"], x)
        comp, _ = _grad_program(loss, args)
        ms = _time_compiled(comp, args) * 1e3
        total_block += ms
        total_s2d += ms
        print(json.dumps({"metric": "gprofile_toimage", "res": scale,
                          "ch": ch, "block_ms": round(ms, 2),
                          "value": round(ms, 2), "unit": "ms",
                          "vs_baseline": 1.0}))
        sys.stdout.flush()

    print(json.dumps({
        "metric": "gprofile_totals", "value": round(total_block, 1),
        "unit": "ms", "vs_baseline": 1.0,
        "sagb_conv_ms": round(total_conv, 1),
        "with_s2d_ms": round(total_s2d, 1),
        "batch": b,
    }))


if __name__ == "__main__":
    main()
