"""Attribute extraction: grammar behaviour goldens + pipeline pieces."""

import pickle

import numpy as np
import pytest

from eegan_tpu.data.attributes import (
    AttributeExtractor,
    LexiconTagger,
    build_attributes_pickle,
    extract_all,
)

from corpus_util import build_corpus


def test_lexicon_tagger_basics():
    tags = dict(LexiconTagger().tag(
        "this bird has a bright red head and black wings".split()))
    assert tags["this"] == "DT"
    assert tags["has"] == "VBZ"
    assert tags["red"] == "JJ"
    assert tags["and"] == "CC"
    assert tags["wings"] == "NNS"
    assert tags["head"] == "NN"


def test_bird_grammar_extracts_adjective_noun_groups():
    ex = AttributeExtractor("bird")
    attrs = ex.parse_caption("this bird has a bright red head and black wings")
    flat = {" ".join(a) for a in attrs}
    # adjective+noun groups must come out
    assert any("red head" in p for p in flat)
    assert any("black wings" in p for p in flat)


def test_bird_copular_description():
    ex = AttributeExtractor("bird")
    attrs = ex.parse_caption("the wings are brown and the beak is yellow")
    flat = {" ".join(a) for a in attrs}
    assert any("wings" in p and "brown" in p for p in flat)
    assert any("beak" in p and "yellow" in p for p in flat)


def test_subtract_grammar_removes_noun_verb_stub():
    ex = AttributeExtractor("bird")
    # "bird has" alone (noun+verb, no description) must not survive
    attrs = ex.parse_caption("bird has")
    assert attrs == [] or all(len(a) > 2 for a in attrs)


def test_coco_grammar():
    ex = AttributeExtractor("coco")
    attrs = ex.parse_caption("a man riding a wave on top of a surfboard")
    flat = {" ".join(a) for a in attrs}
    assert any("man" in p for p in flat)
    assert any("surfboard" in p or "wave" in p for p in flat)


def test_empty_and_unknown_input():
    ex = AttributeExtractor("bird")
    assert ex.parse_caption("") == []
    assert ex.parse_caption([]) == []


def test_id_roundtrip_and_pickle(tmp_path_factory):
    root = build_corpus(tmp_path_factory.mktemp("birds"))
    path = build_attributes_pickle(root, "bird", attr_name="TEST",
                                   workers=1)
    with open(path, "rb") as f:
        train_attrs, test_attrs = pickle.load(f)
    from eegan_tpu.data.datasets import load_captions_pickle

    train_caps, _, ixtoword, _, _ = load_captions_pickle(root)
    assert len(train_attrs) == len(train_caps)
    # every extracted attr id must decode through the vocab
    for attrs in train_attrs:
        for attr in attrs:
            for wid in attr:
                assert wid in ixtoword
