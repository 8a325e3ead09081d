"""eegan_tpu — a TPU-native JAX/Flax/Pallas text-to-image GAN framework.

A ground-up rebuild of the capabilities of qikizh/EE-GAN ("Explore and then
Exploit: A Fine-grained Hierarchical Network for Text-to-Image Synthesis")
designed for TPU hardware: NHWC layouts feeding the MXU, GSPMD data
parallelism over a `jax.sharding.Mesh` (cross-replica batch-norm falls out of
full-batch statistics under jit — no sync_batchnorm machinery needed), fused
Pallas kernels for the DAMSM word-region attention hot loop, and Orbax
checkpointing with true resume.

Layout:
    config        typed config tree + strict YAML merge (ref miscc/config.py)
    data          caption/bbox/attribute prep, datasets, host pipeline
    models        generator / discriminators / encoders as Flax modules
    losses        hinge + MAGP GAN losses, vectorised DAMSM losses
    ops           Pallas TPU kernels and resize/upsample primitives
    parallel      mesh construction and sharding rules
    training      train state, jitted steps, trainer driver, checkpoints
    evaluation    30k-sweep tester, R-precision, FID, Inception Score
    utils         image/text IO, torch checkpoint conversion, profiling
"""

import os as _os

# Honor JAX_PLATFORMS even when the host environment pre-imported jax with a
# different platform (e.g. a sitecustomize that pins the TPU): once jax is
# imported, the env var alone is ignored, so re-assert it through the config
# API. Lets `JAX_PLATFORMS=cpu python prepare_attributes.py ...` etc. run
# host-side on a TPU VM without touching the chip.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax_p

        _jax_p.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

# Persistent XLA compilation cache: compiles through this environment's
# remote-compile tunnel run minutes-per-program; the cache turns warm starts
# into seconds. Opt out with EEGAN_NO_COMPILE_CACHE=1.
if not _os.environ.get("EEGAN_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"))
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from eegan_tpu.config import Config, cfg, cfg_from_file, fresh_config

__version__ = "0.1.0"

__all__ = ["Config", "cfg", "cfg_from_file", "fresh_config", "__version__"]
