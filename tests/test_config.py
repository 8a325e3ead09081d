import os

import pytest

from eegan_tpu.config import Config, fresh_config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "cfg")


def test_defaults_match_reference_surface():
    c = Config()
    # Reference defaults: miscc/config.py:13-67
    assert c.DATASET_NAME == "bird"
    assert c.RNN_TYPE == "LSTM"
    assert c.TREE.BRANCH_NUM == 3 and c.TREE.BASE_SIZE == 64
    assert c.TRAIN.BATCH_SIZE == 64
    assert c.TRAIN.SMOOTH.GAMMA1 == 5.0
    assert c.TRAIN.SMOOTH.GAMMA3 == 10.0
    assert c.GAN.GF_DIM == 64 and c.GAN.Z_DIM == 100
    assert c.TEXT.WORDS_NUM == 20
    assert c.TEXT.MAX_ATTR_NUM == 3 and c.TEXT.MAX_ATTR_LEN == 5
    assert c.imsizes == [64, 128, 256]


@pytest.mark.parametrize("name", ["bird.yml", "coco.yml", "flower.yml", "sample_bird.yml"])
def test_load_all_shipped_configs(name):
    c = fresh_config(os.path.join(CFG_DIR, name))
    assert c.TREE.BRANCH_NUM == 3


def test_bird_yaml_values():
    c = fresh_config(os.path.join(CFG_DIR, "bird.yml"))
    assert c.GAN.GF_DIM == 32
    assert c.TRAIN.MAX_EPOCH == 650
    assert c.TRAIN.WARMUP_EPOCHS == 550
    assert c.TRAIN.USE_CLASS and c.TRAIN.CLASS_NUM == 200


def test_unknown_key_raises():
    c = Config()
    with pytest.raises(KeyError):
        c.merge_dict({"NOT_A_KEY": 1})
    with pytest.raises(KeyError):
        c.merge_dict({"TRAIN": {"NOT_A_KEY": 1}})


def test_type_mismatch_raises():
    c = Config()
    with pytest.raises(ValueError):
        c.merge_dict({"DATASET_NAME": 3})
    with pytest.raises(ValueError):
        c.merge_dict({"TRAIN": {"USE_CLASS": "yes"}})


def test_int_to_float_coercion():
    c = Config()
    c.merge_dict({"TRAIN": {"SMOOTH": {"GAMMA1": 4}}})
    assert c.TRAIN.SMOOTH.GAMMA1 == 4.0
    assert isinstance(c.TRAIN.SMOOTH.GAMMA1, float)


def test_gpu_id_accepted():
    # Reference landmine: coco.yml sets GPU_ID which its defaults lack
    # (SURVEY.md §5); we accept it.
    c = Config()
    c.merge_dict({"GPU_ID": 3})
    assert c.GPU_ID == 3


def test_apply_overrides():
    from eegan_tpu.config import apply_overrides

    c = Config()
    apply_overrides(c, ["GAN.GF_DIM=16", "TRAIN.SMOOTH.GAMMA1=2.5",
                        "DATASET_NAME=coco", "TRAIN.USE_CLASS=false"])
    assert c.GAN.GF_DIM == 16
    assert c.TRAIN.SMOOTH.GAMMA1 == 2.5
    assert c.DATASET_NAME == "coco"
    assert c.TRAIN.USE_CLASS is False
    import pytest as _pytest

    with _pytest.raises(KeyError):
        apply_overrides(c, ["NOPE.NOPE=1"])
    with _pytest.raises(ValueError):
        apply_overrides(c, ["GAN.GF_DIM"])
