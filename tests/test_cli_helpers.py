"""CLI helper functions: epoch-spec parsing, token/attr transfer."""

import numpy as np

import sample as sample_cli
import test as test_cli


def test_parse_epochs_default():
    # reference default sweep 550..700 step 10 (test.py:96-97)
    eps = test_cli.parse_epochs("")
    assert eps[0] == 550 and eps[-1] == 700 and eps[1] - eps[0] == 10


def test_parse_epochs_forms():
    assert test_cli.parse_epochs("10,20,30") == [10, 20, 30]
    assert test_cli.parse_epochs("100:120:10") == [100, 110, 120]


def test_captions_to_tokens():
    wordtoix = {"<end>": 0, "bird": 1, "red": 2, "head": 3}
    caps, lens = sample_cli.captions_to_tokens(
        ["a red bird", "bird head red unknownword"], wordtoix, 5)
    np.testing.assert_array_equal(caps[0], [2, 1, 0, 0, 0])
    assert lens[0] == 2
    np.testing.assert_array_equal(caps[1], [1, 3, 2, 0, 0])
    assert lens[1] == 3


def test_attrs_to_tokens():
    wordtoix = {"<end>": 0, "red": 1, "head": 2, "black": 3, "wing": 4}
    attr_lists = [[["red", "head"], ["black", "wing"], ["nothere"]],
                  []]
    attrs, lens = sample_cli.attrs_to_tokens(attr_lists, wordtoix, 3, 5)
    assert attrs.shape == (2, 3, 5)
    np.testing.assert_array_equal(attrs[0, 0, :2], [1, 2])
    assert lens[0, 0] == 2
    # empty phrase keeps length 1 (text encoder needs len >= 1)
    assert lens[0, 2] == 1
    assert lens[1].min() == 1
