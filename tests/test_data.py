"""Data layer: pickle-format compatibility, fixed shapes, determinism."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from eegan_tpu.config import Config
from eegan_tpu.data.datasets import TextImageDataset, TextOnlyDataset
from eegan_tpu.data.pipeline import DataPipeline
from eegan_tpu.data.prep import build_dictionary, tokenize_caption

from corpus_util import CAPS_PER_IMAGE, build_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Miniature CUB-shaped corpus with every artefact the loaders read."""
    return build_corpus(tmp_path_factory.mktemp("birds"))


def make_config(corpus):
    c = Config()
    c.DATA_DIR = corpus
    c.DATASET_NAME = "bird"
    c.TEXT.CAPTIONS_PER_IMAGE = CAPS_PER_IMAGE
    return c


def test_tokenize():
    assert tokenize_caption("This bird's head, is RED!") == \
        ["this", "bird", "s", "head", "is", "red"]


def test_build_dictionary_ids_roundtrip():
    train = [["red", "bird"], ["blue", "bird"]]
    test = [["red", "wing"]]
    tr, te, ixtoword, wordtoix = build_dictionary(train, test)
    assert ixtoword[0] == "<end>"
    assert [ixtoword[i] for i in tr[0]] == ["red", "bird"]
    assert [ixtoword[i] for i in te[0]] == ["red", "wing"]


def test_dataset_sample_shapes_and_determinism(corpus):
    c = make_config(corpus)
    ds = TextImageDataset(c, split="train")
    assert len(ds) == 4
    assert ds.n_words > 5

    rng = np.random.default_rng([1, 2, 3])
    s = ds.sample(0, rng)
    assert s["img64"].shape == (64, 64, 3)
    assert s["img128"].shape == (128, 128, 3)
    assert s["img256"].shape == (256, 256, 3)
    assert s["img256"].min() >= -1.0 and s["img256"].max() <= 1.0
    assert s["caps"].shape == (20,)
    assert s["attrs"].shape == (3, 5)
    assert s["attr_lens"].shape == (3,)
    assert 1 <= s["cap_lens"] <= 20
    # unpaired caption comes from a different class
    assert s["unpair_caps"].shape == (20,)

    # identical generator state -> identical sample (reproducibility)
    rng2 = np.random.default_rng([1, 2, 3])
    s2 = ds.sample(0, rng2)
    for k in s:
        np.testing.assert_array_equal(np.asarray(s[k]), np.asarray(s2[k]))


def test_unpair_class_differs(corpus):
    c = make_config(corpus)
    ds = TextImageDataset(c, split="train")
    rng = np.random.default_rng([7])
    for idx in range(len(ds)):
        cls = ds.class_id[idx]
        _, _, u_cls = ds.unpair_caption(cls, rng)
        assert u_cls != cls


def test_pipeline_batching(corpus):
    c = make_config(corpus)
    ds = TextImageDataset(c, split="train")
    pipe = DataPipeline(ds, batch_size=2, seed=0, num_workers=0)
    batches = list(pipe.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b["img256"].shape == (2, 256, 256, 3)
    assert b["caps"].shape == (2, 20)
    assert b["caps"].dtype == np.int32

    # same epoch -> identical stream; different epoch -> different
    b_again = next(iter(pipe.epoch(0)))
    np.testing.assert_array_equal(b["img256"], b_again["img256"])
    b_other = next(iter(pipe.epoch(1)))
    assert not np.array_equal(b["caps"], b_other["caps"]) or \
        not np.array_equal(b["img256"], b_other["img256"])


def test_pipeline_multihost_requires_drop_last(corpus):
    """Per-host batch slicing assumes full global batches; a ragged epoch
    tail would mis-assemble the global array (ADVICE r2)."""
    import pytest

    c = make_config(corpus)
    ds = TextImageDataset(c, split="train")
    with pytest.raises(ValueError, match="drop_last"):
        DataPipeline(ds, batch_size=2, seed=0, drop_last=False,
                     process_index=0, process_count=2)


def test_text_only_dataset(corpus):
    c = make_config(corpus)
    ds = TextOnlyDataset(c, split="test")
    assert len(ds) == 2
    rng = np.random.default_rng([5])
    s = ds.sample(0, rng)
    assert s["caps"].shape == (20,)
    assert isinstance(s["keys"], str)

    wc, wl = ds.wrong_captions(int(ds.class_id[0]), rng, r_val=10)
    assert wc.shape == (9, 20) and wl.shape == (9,)


def test_long_caption_subsample():
    from eegan_tpu.data.datasets import pad_caption

    rng = np.random.default_rng([0])
    ids = list(range(1, 31))  # 30 words
    out, n = pad_caption(ids, 20, rng)
    assert n == 20
    # sorted subset of the original (reference keeps order, datasets.py:355-359)
    assert all(np.diff(out) > 0)
    assert set(out).issubset(set(ids))


def test_attribute_padding_overflow():
    from eegan_tpu.data.datasets import pad_attributes

    rng = np.random.default_rng([0])
    attrs = [[1, 2, 3, 4, 5, 6, 7], [8, 9], [], [10]]
    out, n, lens = pad_attributes(attrs, 3, 5, rng)
    assert out.shape == (3, 5)
    assert n == 3
    assert lens.min() >= 1  # empty slots keep len 1 (datasets.py:318)


def test_preload_cache_equivalent_shapes(corpus):
    c = make_config(corpus)
    ds = TextImageDataset(c, split="train", preload=True)
    rng = np.random.default_rng([1, 2, 3])
    s = ds.sample(0, rng)
    assert s["img64"].shape == (64, 64, 3)
    assert s["img256"].shape == (256, 256, 3)
    assert s["img256"].dtype == np.float32
    assert s["img256"].min() >= -1.0 and s["img256"].max() <= 1.0
    # determinism holds on the cached path too
    rng2 = np.random.default_rng([1, 2, 3])
    s2 = ds.sample(0, rng2)
    np.testing.assert_array_equal(s["img128"], s2["img128"])


def test_uint8_transfer_matches_float_path(corpus):
    """RUNTIME.UINT8_TRANSFER: uint8 pyramids, once normalised on device,
    sit within half an LSB of the float path (and the batched native path
    matches the per-sample path bit-for-bit)."""
    c = make_config(corpus)
    ds_f = TextImageDataset(c, split="train", preload=True)
    ds_u = TextImageDataset(c, split="train", preload=True,
                            uint8_images=True)
    for index in (0, 1):
        s_f = ds_f.sample(index, np.random.default_rng([4, 5, index]))
        s_u = ds_u.sample(index, np.random.default_rng([4, 5, index]))
        for k in ("img64", "img128", "img256"):
            assert s_u[k].dtype == np.uint8
            dev_norm = s_u[k].astype(np.float32) / 127.5 - 1.0
            # float path keeps unquantised resample values; uint8 path
            # rounds them — max divergence is half an LSB.
            assert np.abs(dev_norm - s_f[k]).max() <= 0.5 / 127.5 + 1e-6

    from eegan_tpu.data import native

    if native.available():
        idxs = [0, 1, 2]
        batch = ds_u.sample_batch(
            idxs, [np.random.default_rng([9, 1, i]) for i in idxs])
        singles = [ds_u.sample(i, np.random.default_rng([9, 1, i]))
                   for i in idxs]
        for k in batch:
            assert batch[k].dtype == singles[0][k].dtype
            stacked = np.stack([s[k] for s in singles])
            if batch[k].dtype == np.uint8:
                # rounding may differ by 1 LSB where the per-sample path
                # quantises through a different float summation order
                assert np.abs(batch[k].astype(np.int16)
                              - stacked.astype(np.int16)).max() <= 1
            else:
                np.testing.assert_allclose(batch[k], stacked, atol=2e-5,
                                           err_msg=k)


def test_normalize_image_leaves():
    import jax.numpy as jnp

    from eegan_tpu.training.steps import normalize_image_leaves

    batch = {"img64": jnp.asarray(np.array([[0, 128, 255]], np.uint8)),
             "img256": jnp.ones((1, 2), jnp.float32) * 0.5,
             "caps": jnp.zeros((1, 3), jnp.int32)}
    out = normalize_image_leaves(batch)
    np.testing.assert_allclose(
        np.asarray(out["img64"]),
        np.array([[0, 128, 255]], np.float32) / 127.5 - 1.0)
    # float leaves and non-image leaves pass through untouched
    assert out["img256"] is batch["img256"]
    assert out["caps"] is batch["caps"]


def test_sample_batch_matches_per_sample(corpus):
    from eegan_tpu.data import native

    if not native.available():
        import pytest as _pytest

        _pytest.skip("native lib unavailable")
    c = make_config(corpus)
    ds = TextImageDataset(c, split="train", preload=True)
    idxs = [0, 1, 2]
    rngs1 = [np.random.default_rng([9, 0, i]) for i in idxs]
    rngs2 = [np.random.default_rng([9, 0, i]) for i in idxs]
    batch = ds.sample_batch(idxs, rngs1)
    singles = [ds.sample(i, r) for i, r in zip(idxs, rngs2)]
    for k in batch:
        stacked = np.stack([s[k] for s in singles])
        np.testing.assert_allclose(batch[k], stacked, atol=2e-5,
                                   err_msg=k)
