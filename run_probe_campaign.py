#!/usr/bin/env python
"""Multi-seed learning-probe campaign (VERDICT r2 #5).

Round 2's learning evidence was one recorded passing run plus anecdotes.
This driver runs `validate_learning.main` across seeds × guard-rail
configurations in ONE process (compiled programs are shared across seeds —
only the first run of each config pays the compile) and reports pass-rate
and the peak distribution per config. Pass criterion per run is unchanged:
best sweep checkpoint >= 4/8 (P[Binom(8,1/8) >= 4] ~ 5.5e-4 < 1e-3) and
final >= 2/8.

Configs:
  baseline   fp32, no guard rails (D_GRAD_CLIP=0), EMA probe on
  clip       + TRAIN.D_GRAD_CLIP=100
  raw        EMA disabled entirely (probe scores raw params only)

Usage: run_probe_campaign.py [--seeds 5] [--steps 3000]
       [--configs baseline,clip,raw]
The recorded results live in PERF.md §8.
"""

from __future__ import annotations

import argparse
import json
import time

CONFIGS = {
    "baseline": dict(clip=0.0, ema=0.995),
    "clip": dict(clip=100.0, ema=0.995),
    "raw": dict(clip=0.0, ema=0.0),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--configs", default="baseline,clip,raw")
    p.add_argument("--dtype", default="float32")
    a = p.parse_args()

    import validate_learning as vl

    table = {}
    for name in a.configs.split(","):
        cfg = CONFIGS[name]
        runs = []
        for seed in range(a.seeds):
            t0 = time.perf_counter()
            r = vl.main(steps=a.steps, dtype=a.dtype, seed=seed,
                        check=False, **cfg)
            r["wall_s"] = round(time.perf_counter() - t0, 1)
            runs.append(r)
            print(f"[campaign] {name} seed {seed}: best {r['best']}/8 "
                  f"@ {r['best_step']}, final {r['final']}/8, "
                  f"{'PASS' if r['passed'] else 'FAIL'} "
                  f"({r['wall_s']}s)", flush=True)
        table[name] = runs

    print("\n== campaign summary ==")
    for name, runs in table.items():
        n_pass = sum(r["passed"] for r in runs)
        peaks = [r["best"] for r in runs]
        print(json.dumps({
            "metric": f"probe_campaign_{name}",
            "value": n_pass / len(runs), "unit": "pass_rate",
            "vs_baseline": n_pass / len(runs),
            "peaks": peaks,
            "finals": [r["final"] for r in runs],
            "best_steps": [r["best_step"] for r in runs],
            "seeds": len(runs), "steps": a.steps,
        }))


if __name__ == "__main__":
    main()
