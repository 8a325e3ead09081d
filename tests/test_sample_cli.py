"""sample.py CLI end-to-end (--from_code, live NLP attribute parse).

The reference's sampling driver crashes on several paths (SURVEY.md
appendix); this verifies ours runs: free-text captions -> attribute parse ->
token transfer -> generator -> saved grids/singles.
"""

import os
import sys

import pytest

from corpus_util import CAPS_PER_IMAGE, build_corpus


def test_sample_from_code(tmp_path_factory, monkeypatch, tmp_path):
    root = build_corpus(tmp_path_factory.mktemp("birds"))
    out_root = str(tmp_path / "viz")

    # config: tiny dims via --set, SAVE_DIR inside tmp
    import yaml

    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({
            "DATASET_NAME": "bird", "DATA_DIR": root, "SAVE_DIR": out_root,
            "TEXT": {"CAPTIONS_PER_IMAGE": CAPS_PER_IMAGE},
        }, f)

    import sample as sample_cli

    monkeypatch.setattr(sys, "argv", [
        "sample.py", "--cfg", cfg_path, "--from_code",
        "--output_dir", "example", "--noise_times", "2",
        "--set", "GAN.GF_DIM=4", "--set", "GAN.DF_DIM=4",
        "--set", "RUNTIME.COMPUTE_DTYPE=float32",
    ])
    sample_cli.main()

    vis = os.path.join(out_root, "example")
    caps = sorted(d for d in os.listdir(vis) if d.startswith("cap_"))
    assert len(caps) == len(sample_cli.EXAMPLE_CAPTIONS)
    first = os.path.join(vis, caps[0])
    assert os.path.isfile(os.path.join(first, "samples.png"))
    assert os.path.isfile(os.path.join(first, "sample_0.png"))
    assert os.path.isfile(os.path.join(first, "sample_1.png"))
    assert os.path.isfile(os.path.join(first, "caption.txt"))


def test_sample_from_dataset(tmp_path_factory, monkeypatch, tmp_path):
    """--from_dataset also dumps the paired real images + text file
    (reference sample.py:280-286; VERDICT r1 missing #4)."""
    root = build_corpus(tmp_path_factory.mktemp("birds"))
    out_root = str(tmp_path / "viz")

    import yaml

    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({
            "DATASET_NAME": "bird", "DATA_DIR": root, "SAVE_DIR": out_root,
            "TEXT": {"CAPTIONS_PER_IMAGE": CAPS_PER_IMAGE},
        }, f)

    import sample as sample_cli

    monkeypatch.setattr(sys, "argv", [
        "sample.py", "--cfg", cfg_path, "--from_dataset",
        "--output_dir", "example_ds", "--noise_times", "1",
        "--batch_size", "2", "--split", "test",
        "--set", "GAN.GF_DIM=4", "--set", "GAN.DF_DIM=4",
        "--set", "RUNTIME.COMPUTE_DTYPE=float32",
    ])
    sample_cli.main()

    vis = os.path.join(out_root, "example_ds")
    real_dir = os.path.join(vis, "real_images")
    assert os.path.isfile(os.path.join(real_dir, "cap_0.png"))
    assert os.path.isfile(os.path.join(real_dir, "cap_1.png"))
    assert os.path.isfile(os.path.join(real_dir, "real_images.png"))
    with open(os.path.join(vis, "dataset_example.txt")) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    assert len(lines) == 2  # one per sampled caption
    assert os.path.isfile(os.path.join(vis, "cap_0", "samples.png"))
