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

from eegan_tpu.config import Config, cfg, cfg_from_file, fresh_config

__version__ = "0.1.0"

__all__ = ["Config", "cfg", "cfg_from_file", "fresh_config", "__version__"]
