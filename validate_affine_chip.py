#!/usr/bin/env python
"""Chip numerics gate for RUNTIME.PALLAS_AFFINE (ops/affine_pallas.py).

Same CPU-anchored design as validate_upfuse_chip.py (see its docstring for
why a naive plain-vs-pallas chip compare cannot work on this backend: fp32
convs are multi-pass bf16 decompositions, so any two equivalent program
shapes decorrelate at ambient rounding and the zero-init-gamma backprop
amplifies it). Pass criteria:

  1. all chip grads finite (both paths);
  2. CPU fp32 proves the kernel math exact: tree-max rel(plain, pallas)
     on CPU (interpret mode) <= 2e-3;
  3. the pallas program is no noisier against its CPU oracle than the
     plain program is against ITS CPU oracle:
     max_rel(chip_pallas, cpu_pallas) <= 2 * max_rel(chip_plain, cpu_plain)
     + 1e-3.
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
    """(plain_grads, pallas_grads, platform) on the process's backend."""
    import jax
    import jax.numpy as jnp

    from eegan_tpu.models.generator import Generator

    b, ngf = 4, 16
    z = jax.random.normal(jax.random.PRNGKey(0), (b, 100), jnp.float32)
    sent = jax.random.normal(jax.random.PRNGKey(1), (b, 256), jnp.float32)
    attrs = jax.random.normal(jax.random.PRNGKey(2), (b, 256), jnp.float32)

    g_ref = Generator(ngf=ngf, up_fused=True)
    g_pal = Generator(ngf=ngf, up_fused=True, pallas_affine=True)
    variables = g_ref.init(jax.random.PRNGKey(3), z, sent, attrs, True)
    params, stats = variables["params"], variables["batch_stats"]

    def loss(gen, p):
        imgs = gen.apply({"params": p, "batch_stats": stats},
                         z, sent, attrs, True, mutable=["batch_stats"])[0]
        return sum(jnp.sum(jnp.abs(i.astype(jnp.float32))) for i in imgs)

    gp = jax.jit(jax.grad(lambda p: loss(g_ref, p)))(params)
    gf = jax.jit(jax.grad(lambda p: loss(g_pal, p)))(params)
    return (jax.device_get(gp), jax.device_get(gf),
            jax.devices()[0].platform)


def _run_in_subprocess(platform: str):
    from validate_upfuse_chip import tree_max_rel  # noqa: F401  (reuse)

    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        out = f.name
    code = ("import pickle, validate_affine_chip as g;"
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
    from validate_upfuse_chip import tree_max_rel

    cpu_p, cpu_f, _ = _run_in_subprocess("cpu")
    chip_p, chip_f, chip_name = _run_in_subprocess("chip")

    cpu_exact, cpu_leaf, bad0 = tree_max_rel(cpu_p, cpu_f)
    ambient, _, bad1 = tree_max_rel(cpu_p, chip_p)
    pallas_err, pallas_leaf, bad2 = tree_max_rel(cpu_f, chip_f)

    ok = (not (bad0 or bad1 or bad2)
          and cpu_exact <= 2e-3
          and pallas_err <= 2.0 * ambient + 1e-3)
    print(json.dumps({
        "metric": "affine_chip_grad_parity", "value": pallas_err,
        "unit": "max_rel_vs_cpu_oracle", "vs_baseline": 1.0,
        "ambient_plain_vs_oracle": ambient,
        "cpu_plain_vs_pallas": cpu_exact, "cpu_worst_leaf": cpu_leaf,
        "worst_leaf": pallas_leaf, "ok": ok, "platform": chip_name,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
