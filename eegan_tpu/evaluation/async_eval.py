"""Asynchronous evaluation overlapped with training.

BASELINE.md's north-star asks for FID/IS sweeps with on-device Inception
features *overlapped with training* — a capability the reference lacks
entirely (its test.py/FID/IS are separate post-hoc processes). Here a
background thread picks up each new generator snapshot, generates a sample
set and scores FID (and optionally R-precision) while the training loop
keeps stepping: device work from both threads interleaves through JAX's
async dispatch queue on the same chip/mesh, and all host-side work (PNG-free
feature extraction, Gaussian statistics, sqrtm) stays off the training
thread.
"""

from __future__ import annotations

import queue
import threading
import traceback
from typing import Dict, Optional

import numpy as np


def _device_copy(tree):
    """Copy every jax.Array leaf into a fresh buffer (host leaves pass
    through). Protects queued snapshots from buffer donation by later
    train steps."""
    import jax

    return jax.tree_util.tree_map(
        lambda x: x.copy() if isinstance(x, jax.Array) else x, tree)


class AsyncEvaluator:
    """Background FID (and R-precision) evaluation of generator snapshots.

    Parameters
    ----------
    tester: evaluation.tester.Tester (provides generation + encoders)
    real_stats: path to a mu/sigma ``.npz`` or a folder of real images; when
        None, FID is skipped and only R-precision runs.
    """

    def __init__(self, tester, writer=None, real_stats: Optional[str] = None,
                 eval_nums: int = 2048, compute_r_precision: bool = False):
        self.tester = tester
        self.writer = writer
        self.eval_nums = eval_nums
        self.compute_r_precision = compute_r_precision
        self.results: Dict[int, Dict[str, float]] = {}

        self._extractor = None
        self._real = None
        if real_stats is not None:
            from eegan_tpu.evaluation.fid import FIDExtractor, MeasureFID

            self._extractor = FIDExtractor()
            self._real = MeasureFID(self._extractor).stats_for(real_stats)

        self._q: "queue.Queue" = queue.Queue(maxsize=2)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    def submit(self, epoch: int, g_params, attr_params, g_stats) -> bool:
        """Queue a snapshot for evaluation; drops (returns False) when the
        evaluator is still busy so training never blocks.

        The snapshot is copied to fresh device buffers before queueing:
        with ``RUNTIME.DONATE`` the next train step donates the live
        ``state`` buffers the caller passes in, and an eval thread reading
        a donated buffer gets a backend error mid-sweep (observed on-chip:
        ``INVALID_ARGUMENT`` from the feature fetch). The copy is enqueued
        before any subsequent donating step, so it reads valid data; its
        cost is one device-to-device param copy per accepted snapshot.
        """
        if self._q.full():
            return False
        snap = _device_copy((g_params, attr_params, g_stats))
        try:
            self._q.put_nowait((epoch, *snap))
            return True
        except queue.Full:
            return False

    def close(self, wait: bool = True):
        self._q.put(None)
        if wait:
            self._thread.join()

    # ------------------------------------------------------------------
    def _worker(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            epoch, g_params, attr_params, g_stats = item
            try:
                self._evaluate(epoch, g_params, attr_params, g_stats)
            except Exception:
                traceback.print_exc()
                # Record the failure so anything waiting on this epoch's
                # result (tests, benches, a final drain) never hangs.
                self.results[epoch] = {"eval/error": 1.0}

    def _evaluate(self, epoch, g_params, attr_params, g_stats):
        import jax
        import jax.numpy as jnp

        from eegan_tpu.evaluation.fid import (
            activation_statistics,
            frechet_distance,
        )

        tester = self.tester
        rng = np.random.default_rng([epoch])
        feats = []
        hits = []
        produced = 0
        batch_idx = 0
        for batch in tester._batches(self.eval_nums, rng):
            key = jax.random.PRNGKey(epoch * 99991 + batch_idx)
            imgs = tester.sample_step(
                g_params, attr_params, g_stats, tester.frozen,
                jnp.asarray(batch["caps"]), jnp.asarray(batch["cap_lens"]),
                jnp.asarray(batch["attrs"]), jnp.asarray(batch["attr_lens"]),
                key)
            img256 = imgs[-1]  # stays on device
            if self._extractor is not None:
                feats.append(np.asarray(self._extractor.features_jax(img256)))
            if self.compute_r_precision:
                hits.append(tester._r_precision_batch(batch, img256, 100, rng))
            produced += len(img256)
            batch_idx += 1

        scalars: Dict[str, float] = {}
        if feats:
            mu, sigma = activation_statistics(np.concatenate(feats))
            scalars["eval/fid"] = frechet_distance(*self._real, mu, sigma)
        if hits:
            scalars["eval/r_precision"] = float(np.mean(np.concatenate(hits)))
        self.results[epoch] = scalars
        if self.writer is not None and scalars:
            self.writer.write_scalars(epoch, scalars)
        print(f"[async-eval] epoch {epoch}: {scalars}")
