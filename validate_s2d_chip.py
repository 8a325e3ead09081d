#!/usr/bin/env python
"""Chip numerics gate for RUNTIME.S2D_CONVS (ops/s2d_conv.py).

The axon backend has miscompiled one conv-backward before (the stride-4
head conv, PERF.md §2a), so a new conv lowering must prove its gradients
on the REAL backend, not just on XLA:CPU. This compares generator
grads between the plain and s2d lowerings on the attached device at a
small config and fails loudly on divergence or non-finiteness.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def compare_grad_trees(grad_ref, grad_s2d, label: str):
    """Returns (worst_rel, worst_name, n_bad) over matching leaves."""
    assert (jax.tree_util.tree_structure(grad_ref)
            == jax.tree_util.tree_structure(grad_s2d)), \
        f"{label}: grad trees differ in structure — not param-compatible"
    worst_rel, worst_name, n_bad = 0.0, "", 0
    flat_ref = jax.tree_util.tree_flatten_with_path(grad_ref)[0]
    flat_s2d = jax.tree_util.tree_leaves(grad_s2d)
    for (path, a), b_ in zip(flat_ref, flat_s2d):
        a = np.asarray(a, np.float64)
        b_ = np.asarray(b_, np.float64)
        name = f"{label}{jax.tree_util.keystr(path)}"
        # Check BOTH sides: a NaN reference grad would otherwise make
        # rel = NaN, and NaN comparisons are all False — a silent pass in
        # exactly the miscompile case this gate exists for.
        if not np.isfinite(a).all():
            print(f"NON-FINITE reference grad at {name}", file=sys.stderr)
            n_bad += 1
            continue
        if not np.isfinite(b_).all():
            print(f"NON-FINITE s2d grad at {name}", file=sys.stderr)
            n_bad += 1
            continue
        denom = np.abs(a).max() + 1e-12
        rel = np.abs(a - b_).max() / denom
        if rel > worst_rel:
            worst_rel, worst_name = float(rel), name
        if rel > 2e-2:
            print(f"grad mismatch {rel:.3e} at {name}", file=sys.stderr)
            n_bad += 1
    return worst_rel, worst_name, n_bad


def generator_grads():
    from eegan_tpu.models.generator import Generator

    b, ngf = 4, 16
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (b, 100), jnp.float32)
    sent = jax.random.normal(jax.random.PRNGKey(1), (b, 256), jnp.float32)
    attrs = jax.random.normal(jax.random.PRNGKey(2), (b, 256), jnp.float32)

    g_ref = Generator(ngf=ngf, s2d=False)
    g_s2d = Generator(ngf=ngf, s2d=True)
    variables = g_ref.init(jax.random.PRNGKey(3), z, sent, attrs, True)
    params, stats = variables["params"], variables["batch_stats"]

    def loss(gen, p):
        imgs = gen.apply({"params": p, "batch_stats": stats},
                         z, sent, attrs, True, mutable=["batch_stats"])[0]
        return sum(jnp.sum(jnp.abs(i.astype(jnp.float32))) for i in imgs)

    grad_ref = jax.jit(jax.grad(lambda p: loss(g_ref, p)))(params)
    grad_s2d = jax.jit(jax.grad(lambda p: loss(g_s2d, p)))(params)
    return grad_ref, grad_s2d


def discriminator_grads():
    """D-tower gate, including the input-image grad (the MAGP
    gradient-penalty path differentiates D w.r.t. its input, and the one
    miscompile seen so far lived in a D head backward — PERF.md §2a)."""
    from eegan_tpu.models.discriminator import Discriminator

    b, ndf = 4, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, 256, 256, 3), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(1), (b, 256), jnp.float32)

    d_ref = Discriminator(ndf=ndf, scale=256, disc_class=True, class_nums=10)
    d_s2d = Discriminator(ndf=ndf, scale=256, disc_class=True, class_nums=10,
                          s2d=True)
    v = d_ref.init(jax.random.PRNGKey(2), x, cond)

    def loss(mod, params, xx):
        pair, cls = mod.apply(params, xx, cond)
        return jnp.sum(pair) + jnp.sum(jnp.tanh(cls))

    g_ref = jax.jit(jax.grad(lambda p, xx: loss(d_ref, p, xx),
                             argnums=(0, 1)))(v, x)
    g_s2d = jax.jit(jax.grad(lambda p, xx: loss(d_s2d, p, xx),
                             argnums=(0, 1)))(v, x)
    return g_ref, g_s2d


def main():
    grad_ref, grad_s2d = generator_grads()
    d_ref, d_s2d = discriminator_grads()

    rel_g, name_g, bad_g = compare_grad_trees(grad_ref, grad_s2d, "G")
    rel_d, name_d, bad_d = compare_grad_trees(d_ref, d_s2d, "D")
    worst_rel, worst_name = max((rel_g, name_g), (rel_d, name_d))
    n_bad = bad_g + bad_d
    ok = n_bad == 0
    print(json.dumps({
        "metric": "s2d_chip_grad_parity", "value": worst_rel,
        "unit": "max_rel_err", "vs_baseline": 1.0,
        "worst_leaf": worst_name, "ok": ok,
        "platform": jax.devices()[0].platform,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
