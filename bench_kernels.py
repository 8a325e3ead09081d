#!/usr/bin/env python
"""Kernel microbenchmarks on the attached TPU chip.

Compares the fused Pallas DAMSM word-region similarity kernel against the
batched-einsum XLA path at several batch sizes, checking parity as it goes.
(Separate from bench.py, which the driver runs for the headline number.)
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from eegan_tpu.losses.damsm import words_similarity
    from eegan_tpu.ops.damsm_pallas import words_similarity_pallas

    S, L, D = 289, 20, 256
    results = {}
    for B in (32, 64, 128, 256):
        rng = np.random.RandomState(0)
        regions = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
        words_np = rng.randn(B, L, D).astype(np.float32)
        lens = rng.randint(3, L + 1, B)
        for i in range(B):
            words_np[i, lens[i]:] = 0.0
        words = jnp.asarray(words_np)
        lens_j = jnp.asarray(lens)

        xla = jax.jit(lambda r, w, l: words_similarity(r, w, l, None))
        a = xla(regions, words, lens_j).block_until_ready()
        b = words_similarity_pallas(regions, words, lens_j, None)
        b.block_until_ready()
        diff = float(jnp.max(jnp.abs(a - b)))

        def timeit(f):
            # Chain each iteration's input on the previous output so no
            # iteration can be elided, and END WITH A VALUE FETCH: on this
            # tunnelled platform block_until_ready is not an execution
            # barrier (see bench_truth.py), so only fetching a value
            # computed by the chain guarantees the work actually ran.
            out = f(regions)
            float(out.sum())
            t0 = time.perf_counter()
            r = regions
            for _ in range(20):
                r = regions + 1e-12 * out[0, 0]
                out = f(r)
            float(out.sum())
            return (time.perf_counter() - t0) / 20 * 1e3

        t_xla = timeit(lambda r: xla(r, words, lens_j))
        t_pl = timeit(lambda r: words_similarity_pallas(r, words, lens_j,
                                                        None))
        results[B] = {"xla_ms": round(t_xla, 3), "pallas_ms": round(t_pl, 3),
                      "speedup": round(t_xla / t_pl, 2), "max_diff": diff}
        print(f"B={B}: xla {t_xla:.3f} ms, pallas {t_pl:.3f} ms "
              f"({t_xla / t_pl:.2f}x), max diff {diff:.4f}")

    print(json.dumps({"metric": "damsm_words_similarity_speedup_vs_xla_b256",
                      "value": results[256]["speedup"], "unit": "x",
                      "vs_baseline": results[256]["speedup"]}))


if __name__ == "__main__":
    main()
