#!/usr/bin/env python
"""Chip numerics gate for RUNTIME.FUSED_UPSAMPLE (ops/upconv.py).

Why this gate is CPU-anchored (unlike validate_s2d_chip.py's direct
plain-vs-fused compare): on this backend fp32 convolutions execute as
multi-pass bf16 MXU decompositions, so two *different-but-equivalent*
program shapes decorrelate at ambient rounding, and backprop through
seven zero-init-gamma blocks amplifies that into O(0.1-1) RELATIVE error
on the cancellation-heavy scalar-gamma grads — for the PLAIN path vs its
own CPU oracle just as much as for the fused one (measured round 4:
chip-plain vs cpu-plain worst rel 0.90, chip-fused vs cpu-fused 0.88,
chip-plain vs chip-fused 0.39, cpu-plain vs cpu-fused 3.0e-4). A naive
plain-vs-fused chip compare therefore fails for reasons that have nothing
to do with the lowering. (The s2d gate survived the naive form only
because its rewrite keeps every BN/elementwise reduction bit-identical,
making the ambient noise common-mode.)

Pass criteria:
  1. all chip grads finite (both lowerings);
  2. CPU fp32 proves the rewrite exact: tree-max rel(plain, fused) on
     CPU <= 2e-3;
  3. the fused program is no noisier against its CPU oracle than the
     plain program is against ITS CPU oracle:
     max_rel(chip_fused, cpu_fused) <= 2 * max_rel(chip_plain, cpu_plain)
     + 1e-3.
Criterion 3 is the miscompile detector: a broken fused backward would
show up as fused-vs-oracle error orders of magnitude above the ambient
plain-vs-oracle level (the §2a stride-head miscompile produced NaNs and
O(1) absolute garbage, far outside any ambient band).
"""

from __future__ import annotations

import json
import os
import pickle
import subprocess
import sys
import tempfile

import numpy as np


def grads_pair():
    """(plain_grads, fused_grads, platform) on the process's backend."""
    import jax
    import jax.numpy as jnp

    from eegan_tpu.models.generator import Generator

    b, ngf = 4, 16
    z = jax.random.normal(jax.random.PRNGKey(0), (b, 100), jnp.float32)
    sent = jax.random.normal(jax.random.PRNGKey(1), (b, 256), jnp.float32)
    attrs = jax.random.normal(jax.random.PRNGKey(2), (b, 256), jnp.float32)

    g_ref = Generator(ngf=ngf)
    g_fused = Generator(ngf=ngf, up_fused=True)
    variables = g_ref.init(jax.random.PRNGKey(3), z, sent, attrs, True)
    params, stats = variables["params"], variables["batch_stats"]

    def loss(gen, p):
        imgs = gen.apply({"params": p, "batch_stats": stats},
                         z, sent, attrs, True, mutable=["batch_stats"])[0]
        return sum(jnp.sum(jnp.abs(i.astype(jnp.float32))) for i in imgs)

    gp = jax.jit(jax.grad(lambda p: loss(g_ref, p)))(params)
    gf = jax.jit(jax.grad(lambda p: loss(g_fused, p)))(params)
    return (jax.device_get(gp), jax.device_get(gf),
            jax.devices()[0].platform)


def tree_max_rel(a_tree, b_tree):
    """(worst_rel, worst_leaf, any_nonfinite) between matching leaves."""
    import jax

    worst, name, nonfinite = 0.0, "", False
    fa = jax.tree_util.tree_flatten_with_path(a_tree)[0]
    fb = jax.tree_util.tree_leaves(b_tree)
    for (path, a), b_ in zip(fa, fb):
        a = np.asarray(a, np.float64)
        b_ = np.asarray(b_, np.float64)
        if not (np.isfinite(a).all() and np.isfinite(b_).all()):
            nonfinite = True
            print(f"NON-FINITE grad at {jax.tree_util.keystr(path)}",
                  file=sys.stderr)
            continue
        rel = np.abs(a - b_).max() / (np.abs(a).max() + 1e-12)
        if rel > worst:
            worst, name = float(rel), jax.tree_util.keystr(path)
    return worst, name, nonfinite


def _run_in_subprocess(platform: str):
    """Compute grads_pair on a dedicated backend in a fresh process
    (jax binds one backend per process; the chip run must not inherit a
    CPU-pinned parent)."""
    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        out = f.name
    code = ("import pickle, validate_upfuse_chip as g;"
            f"pickle.dump(g.grads_pair(), open({out!r}, 'wb'))")
    env = dict(os.environ)
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    else:
        env.pop("JAX_PLATFORMS", None)
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   cwd=os.path.dirname(os.path.abspath(__file__)))
    res = pickle.load(open(out, "rb"))
    os.unlink(out)
    return res


def main():
    cpu_p, cpu_f, _ = _run_in_subprocess("cpu")
    chip_p, chip_f, chip_name = _run_in_subprocess("chip")

    cpu_exact, cpu_leaf, bad0 = tree_max_rel(cpu_p, cpu_f)
    ambient, _, bad1 = tree_max_rel(cpu_p, chip_p)
    fused_err, fused_leaf, bad2 = tree_max_rel(cpu_f, chip_f)

    ok = (not (bad0 or bad1 or bad2)
          and cpu_exact <= 2e-3
          and fused_err <= 2.0 * ambient + 1e-3)
    print(json.dumps({
        "metric": "upfuse_chip_grad_parity", "value": fused_err,
        "unit": "max_rel_vs_cpu_oracle", "vs_baseline": 1.0,
        "ambient_plain_vs_oracle": ambient,
        "cpu_plain_vs_fused": cpu_exact, "cpu_worst_leaf": cpu_leaf,
        "worst_leaf": fused_leaf, "ok": ok, "platform": chip_name,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
