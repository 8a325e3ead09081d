"""Shared miniature CUB-shaped corpus builder for data/eval tests.

The builder itself lives in the package (eegan_tpu/data/demo_corpus.py) so
production tooling — convert_checkpoints.py --verify's sweep rehearsal —
can generate the same corpus; this module keeps the historical test import.
"""

from eegan_tpu.data.demo_corpus import CAPS_PER_IMAGE, N_FILES, build_corpus

__all__ = ["CAPS_PER_IMAGE", "N_FILES", "build_corpus"]
