"""Training driver: epoch loop, logging, checkpointing, fixed-batch sampling.

Rebuilds `Trainer` (reference `train.py:105-502`) on TPU-native plumbing:

* one fused jitted train step per iteration (see `training/steps.py`);
* data flows through the deterministic host pipeline with device prefetch;
* Orbax checkpoints carry the FULL train state (optimizer moments included)
  so training truly resumes — the reference restarts from epoch 1 always;
* per-epoch fixed-batch image grids + caption/attr text dump, scalar metrics
  every UPDATE_INTERVAL iterations (reference tags preserved);
* wall-clock images/sec is tracked and logged — the perf metric the
  reference never measured.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from eegan_tpu.config import Config
from eegan_tpu.data.pipeline import (
    DataPipeline,
    device_prefetch,
    group_batches,
)
from eegan_tpu.models.factory import ModelBundle, build_models
from eegan_tpu.parallel.mesh import make_mesh
from eegan_tpu.training.checkpoint import CheckpointManager
from eegan_tpu.training.logging import MetricWriter, StepTimer
from eegan_tpu.training.state import FrozenEncoders, create_train_state
from eegan_tpu.training.steps import (
    make_multi_train_step,
    make_sample_step,
    make_train_step,
)
from eegan_tpu.utils.images import (
    mkdir_p,
    save_img_results,
    save_text_results,
)

UPDATE_INTERVAL = 100  # reference train.py:34


def load_frozen_encoders(config: Config, models: ModelBundle,
                         init_frozen: FrozenEncoders) -> FrozenEncoders:
    """Resolve the frozen DAMSM encoders.

    Priority: torch .pth via the converter (reference loads AttnGAN
    checkpoints, `train.py:233-248`) > previously converted Orbax dir >
    random init — but random init is ONLY allowed with the explicit
    RUNTIME.ALLOW_RANDOM_ENCODERS smoke flag (train.py --synthetic sets it);
    anything else hard-fails, matching the reference's hard requirement
    (`train.py:233-248`). A run that silently trains against random
    encoders has no text conditioning at all.
    """
    name = config.TEXT.DAMSM_NAME
    if name and name.endswith(".pth") and os.path.isfile(name):
        from eegan_tpu.utils.torch_convert import load_damsm_encoders

        return load_damsm_encoders(name, models, init_frozen)
    if name and os.path.isdir(name):
        import orbax.checkpoint as ocp

        # Accept either the converted-encoder directory itself or its
        # parent Model dir (CheckpointManager.save_frozen writes to
        # <model_dir>/frozen_encoders).
        sub = os.path.join(name, "frozen_encoders")
        if os.path.isdir(sub):
            name = sub
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(name), target={
            "text_vars": init_frozen.text_vars,
            "image_vars": init_frozen.image_vars})
        return FrozenEncoders(**restored)
    if name and not config.RUNTIME.ALLOW_RANDOM_ENCODERS:
        raise FileNotFoundError(
            f"TEXT.DAMSM_NAME={name!r} is neither a .pth file nor a "
            "converted Orbax directory")
    if name:
        # Explicit smoke mode: a configured-but-absent path downgrades to a
        # warning (e.g. `test.py --debug` with the stock cfg on a box
        # without the AttnGAN artefacts).
        print(f"WARNING: TEXT.DAMSM_NAME={name!r} not found — using "
              "randomly initialised frozen encoders "
              "(RUNTIME.ALLOW_RANDOM_ENCODERS)")
        return init_frozen
    if not config.RUNTIME.ALLOW_RANDOM_ENCODERS:
        raise RuntimeError(
            "TEXT.DAMSM_NAME is unset: training would proceed with randomly "
            "initialised frozen DAMSM encoders and NO text conditioning. "
            "Point TEXT.DAMSM_NAME at the pretrained encoders (reference "
            "train.py:233-248 hard-requires them), or opt into smoke mode "
            "explicitly with --synthetic / "
            "--set RUNTIME.ALLOW_RANDOM_ENCODERS=true")
    print("WARNING: TEXT.DAMSM_NAME unset — using randomly initialised "
          "frozen encoders (smoke mode)")
    return init_frozen


class Trainer:
    def __init__(self, config: Config, output_dir: str, dataset=None,
                 seed: int = 3407, data_workers: Optional[int] = None,
                 async_eval=None):
        self.config = config
        self.output_dir = output_dir
        self.model_dir = os.path.join(output_dir, "Model")
        self.image_dir = os.path.join(output_dir, "Image")
        mkdir_p(self.image_dir)
        mkdir_p(self.model_dir)
        self.seed = seed

        self.mesh = make_mesh(config.RUNTIME.MESH)
        self.batch_size = config.TRAIN.BATCH_SIZE
        if self.batch_size % self.mesh.devices.size != 0:
            raise ValueError(
                f"batch size {self.batch_size} not divisible by "
                f"{self.mesh.devices.size} devices")

        # ---- data ----------------------------------------------------
        if dataset is None:
            from eegan_tpu.data.datasets import TextImageDataset

            dataset = TextImageDataset(
                config, split="train",
                preload=config.RUNTIME.DATA_PRELOAD,
                uint8_images=config.RUNTIME.UINT8_TRANSFER)
        self.dataset = dataset
        self.n_words = dataset.n_words
        self.ixtoword = dataset.ixtoword
        workers = (config.RUNTIME.DATA_WORKERS
                   if data_workers is None else data_workers)
        self.pipeline = DataPipeline(dataset, self.batch_size, seed=seed,
                                     num_workers=workers)

        # ---- models / state -----------------------------------------
        self.models = build_models(config, self.n_words)
        rng = jax.random.PRNGKey(seed)
        self.state, init_frozen = create_train_state(config, self.models, rng)
        self.frozen = load_frozen_encoders(config, self.models, init_frozen)
        self.frozen = jax.device_put(
            self.frozen, jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec()))

        # Optional FSDP: a mesh like "data:4,fsdp:2" shards params/opt/EMA
        # leaves over the fsdp axis (parallel/fsdp.py); default meshes keep
        # the reference-parity replicated layout.
        from eegan_tpu.parallel.fsdp import has_fsdp_axis, state_shardings

        self.state_shardings = (state_shardings(self.state, self.mesh)
                                if has_fsdp_axis(self.mesh) else None)
        self.train_step = make_train_step(config, self.models, mesh=self.mesh,
                                          donate=config.RUNTIME.DONATE,
                                          state_shardings=self.state_shardings)
        # K steps per compiled dispatch (lax.scan over the same step) hides
        # the host round-trip; numerics identical to K single dispatches.
        self.steps_per_dispatch = max(1, config.RUNTIME.STEPS_PER_DISPATCH)
        self.multi_train_step = (
            make_multi_train_step(config, self.models, mesh=self.mesh,
                                  donate=config.RUNTIME.DONATE,
                                  state_shardings=self.state_shardings)
            if self.steps_per_dispatch > 1 else None)
        self.sample_step = make_sample_step(config, self.models, mesh=self.mesh)

        # ---- bookkeeping --------------------------------------------
        self.ckpt = CheckpointManager(self.model_dir)
        self.writer = MetricWriter(os.path.join(output_dir, "writer"))
        self.start_epoch = 1
        latest = self.ckpt.latest_epoch()
        if latest is not None:
            self.state, epoch = self.ckpt.restore_state(self.state)
            self.start_epoch = epoch + 1
            print(f"Resumed from epoch {epoch}")
        self.max_epoch = config.TRAIN.MAX_EPOCH + 1
        self.timer = StepTimer(self.batch_size)
        self.last_metrics = None

        # Optional overlapped evaluation (evaluation/async_eval.py): each
        # generator snapshot is scored (FID / R-precision) on a background
        # thread while training keeps stepping.
        self.async_eval = async_eval

        self._sample_batch = self._prepare_sampling()

    # ------------------------------------------------------------------
    def _prepare_sampling(self) -> Dict[str, np.ndarray]:
        """Fixed batch for per-epoch visualisation (reference
        `prepare_sampling`, train.py:282-306)."""
        batch = next(self.pipeline.epoch(0))
        save_text_results(
            batch["caps"], batch["cap_lens"], self.ixtoword,
            os.path.join(self.image_dir, "sampling_text.txt"),
            batch.get("attrs"), batch.get("attr_lens"))
        pyramid = [batch[f"img{s}"] for s in self.config.imsizes]
        save_img_results(pyramid, prefix="sample_image",
                         image_dir=self.image_dir)
        return batch

    def save_images(self, epoch: int) -> None:
        b = self._sample_batch
        # Sample from the EMA generator when TRAIN.G_EMA_DECAY is on — the
        # orbit-averaged params give the stable eval-quality samples.
        g_p = self.state.g_ema if self.state.g_ema is not None \
            else self.state.g_params
        a_p = self.state.attr_ema if self.state.attr_ema is not None \
            else self.state.attr_params
        imgs = self.sample_step(
            g_p, a_p, self.state.g_stats,
            self.frozen,
            jnp.asarray(b["caps"]), jnp.asarray(b["cap_lens"]),
            jnp.asarray(b["attrs"]), jnp.asarray(b["attr_lens"]),
            jax.random.PRNGKey(epoch))
        save_img_results([np.asarray(im) for im in imgs],
                         prefix=f"epoch_{epoch}", image_dir=self.image_dir)

    def save_model(self, epoch: int) -> None:
        """Epoch-gated saving (reference `save_model`, train.py:308-319) +
        full-state checkpoint for resume."""
        t = self.config.TRAIN
        if epoch == 1 or (epoch >= t.WARMUP_EPOCHS and epoch % t.GSAVE_INTERVAL == 0):
            self.ckpt.save_generator(epoch, self.state)
            print("Save Gen model.")
            if self.async_eval is not None:
                # Score the EMA generator when enabled — same weights the
                # epoch snapshot / test.py sweep sees.
                g_p = self.state.g_ema if self.state.g_ema is not None \
                    else self.state.g_params
                a_p = self.state.attr_ema if self.state.attr_ema is not None \
                    else self.state.attr_params
                accepted = self.async_eval.submit(
                    epoch, g_p, a_p, self.state.g_stats)
                if not accepted:
                    print(f"[async-eval] busy — skipped epoch {epoch}")
        if epoch == 1 or (epoch >= t.WARMUP_EPOCHS and epoch % t.DSAVE_INTERVAL == 0):
            self.ckpt.save_state(epoch, self.state)
            print("Save full train state.")

    # ------------------------------------------------------------------
    def train(self, max_epochs: Optional[int] = None,
              max_iters_per_epoch: Optional[int] = None,
              profile_steps: int = 0) -> None:
        """Epoch loop. With ``profile_steps`` > 0, capture a jax.profiler
        trace of that many post-warmup steps into <output_dir>/profile
        (the observability the reference never had — SURVEY.md §5)."""
        end_epoch = self.max_epoch if max_epochs is None \
            else min(self.max_epoch, self.start_epoch + max_epochs)
        base_rng = jax.random.PRNGKey(self.seed)
        profile_at = 2 if profile_steps > 0 else -1
        steps_done = 0

        # Profiling a K-step dispatch would trace one giant program; fall
        # back to per-step dispatch when a trace was requested.
        k = 1 if profile_steps > 0 else self.steps_per_dispatch
        log_every = max(1, UPDATE_INTERVAL // k)

        for epoch in range(self.start_epoch, end_epoch):
            src = self.pipeline.epoch(epoch)
            if max_iters_per_epoch is not None:
                import itertools

                src = itertools.islice(src, max_iters_per_epoch)
            if k > 1:
                it = device_prefetch(group_batches(src, k), self.mesh,
                                     stacked=True)
            else:
                it = device_prefetch(src, self.mesh)
            for i, batch in enumerate(it):
                if steps_done == profile_at:
                    jax.profiler.start_trace(
                        os.path.join(self.output_dir, "profile"))
                step_rng = jax.random.fold_in(
                    base_rng, int(self.state.step))
                if k > 1:
                    self.state, metrics = self.multi_train_step(
                        self.state, self.frozen, batch, step_rng)
                    n_sub = next(iter(metrics.values())).shape[0]
                else:
                    self.state, metrics = self.train_step(
                        self.state, self.frozen, batch, step_rng)
                    n_sub = 1
                for _ in range(n_sub):
                    self.timer.tick()
                # async device values; fetched by benches/tests to assert the
                # last step computed finite losses (PERF.md §2a)
                self.last_metrics = metrics
                steps_done += 1
                if profile_at >= 0 and steps_done == profile_at + profile_steps:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), metrics)
                    jax.profiler.stop_trace()
                    profile_at = -1

                if i % log_every == 0:
                    # K-stacked metrics reduce by MEAN so the logged value
                    # reflects every measured sub-step, not a 1-in-K
                    # subsample (reference logs each UPDATE_INTERVAL,
                    # train.py:462-498). Reduction happens only at log time
                    # — per-iteration it would add ~|metrics| tiny
                    # dispatches to the hot loop.
                    scalars = {
                        key: float(np.asarray(v).mean())
                        for key, v in metrics.items()}
                    ips = self.timer.images_per_sec
                    if ips is not None:
                        scalars["perf/images_per_sec"] = ips
                    # Log against the PERSISTENT optimizer step, not a
                    # process-local counter: after an Orbax resume the
                    # metric stream must continue where it stopped (the
                    # round-5 kill/resume proof caught the old iters_cnt
                    # restarting at 1 and interleaving TB/jsonl streams).
                    self.writer.write_scalars(int(self.state.step), scalars)

            self.save_images(epoch)
            self.save_model(epoch)

    def close(self):
        if self.async_eval is not None:
            self.async_eval.close()
        self.pipeline.close()
        self.writer.close()
        self.ckpt.close()
