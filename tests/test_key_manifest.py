"""Verbatim-checkpoint key-manifest conversion tests (VERDICT r4 #4).

The converters are activation-parity tested against in-repo torch oracles
(tests/test_inception_torch_parity.py, test_text_encoder_torch_parity.py),
but Google's actual torchvision ``inception_v3`` weights and AttnGAN's
actual ``text_encoder200.pth`` have never been on this box. These tests
close most of the residual risk WITHOUT network access: the key/shape
manifests below are re-typed here from the published torchvision
`inception_v3` architecture (torchvision/models/inception.py — BasicConv2d
= conv(bias=False)+BatchNorm2d, InceptionA/B/C/D/E branch tables) and from
torch's documented ``nn.LSTM`` parameter naming — i.e. they are an
INDEPENDENT pin, not derived from this repo's own oracle modules.

A synthetic ``.pth``-shaped state dict with exactly those keys/shapes is
converted; the tests then assert

  * conversion succeeds with strict templates (no flax leaf left at its
    random init — a real checkpoint cannot be silently half-loaded), and
  * every torch key is consumed (``num_batches_tracked`` excepted — integer
    batch counters carry no model state), so no real-checkpoint weight
    would be silently dropped.

Reference load sites this protects: `DAMSM.py:124-134` (torchvision trunk
into CNN_ENCODER), `train.py:233-248` (RNN_ENCODER/CNN_ENCODER .pth).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eegan_tpu.models.image_encoder import ImageEncoder
from eegan_tpu.models.text_encoder import TextEncoder
from eegan_tpu.utils.torch_convert import (
    convert_image_encoder,
    convert_text_encoder,
)


# ---------------------------------------------------------------------------
# The torchvision inception_v3 manifest (verbatim architecture tables)
# ---------------------------------------------------------------------------

def _basic_conv(prefix, cin, cout, kh, kw):
    """torchvision BasicConv2d: Conv2d(bias=False) + BatchNorm2d(eps=1e-3)."""
    return {
        f"{prefix}.conv.weight": (cout, cin, kh, kw),
        f"{prefix}.bn.weight": (cout,),
        f"{prefix}.bn.bias": (cout,),
        f"{prefix}.bn.running_mean": (cout,),
        f"{prefix}.bn.running_var": (cout,),
        f"{prefix}.bn.num_batches_tracked": (),
    }


def _inception_a(prefix, cin, pool_features):
    out = {}
    out.update(_basic_conv(f"{prefix}.branch1x1", cin, 64, 1, 1))
    out.update(_basic_conv(f"{prefix}.branch5x5_1", cin, 48, 1, 1))
    out.update(_basic_conv(f"{prefix}.branch5x5_2", 48, 64, 5, 5))
    out.update(_basic_conv(f"{prefix}.branch3x3dbl_1", cin, 64, 1, 1))
    out.update(_basic_conv(f"{prefix}.branch3x3dbl_2", 64, 96, 3, 3))
    out.update(_basic_conv(f"{prefix}.branch3x3dbl_3", 96, 96, 3, 3))
    out.update(_basic_conv(f"{prefix}.branch_pool", cin, pool_features, 1, 1))
    return out


def _inception_b(prefix, cin):
    out = {}
    out.update(_basic_conv(f"{prefix}.branch3x3", cin, 384, 3, 3))
    out.update(_basic_conv(f"{prefix}.branch3x3dbl_1", cin, 64, 1, 1))
    out.update(_basic_conv(f"{prefix}.branch3x3dbl_2", 64, 96, 3, 3))
    out.update(_basic_conv(f"{prefix}.branch3x3dbl_3", 96, 96, 3, 3))
    return out


def _inception_c(prefix, cin, c7):
    out = {}
    out.update(_basic_conv(f"{prefix}.branch1x1", cin, 192, 1, 1))
    out.update(_basic_conv(f"{prefix}.branch7x7_1", cin, c7, 1, 1))
    out.update(_basic_conv(f"{prefix}.branch7x7_2", c7, c7, 1, 7))
    out.update(_basic_conv(f"{prefix}.branch7x7_3", c7, 192, 7, 1))
    out.update(_basic_conv(f"{prefix}.branch7x7dbl_1", cin, c7, 1, 1))
    out.update(_basic_conv(f"{prefix}.branch7x7dbl_2", c7, c7, 7, 1))
    out.update(_basic_conv(f"{prefix}.branch7x7dbl_3", c7, c7, 1, 7))
    out.update(_basic_conv(f"{prefix}.branch7x7dbl_4", c7, c7, 7, 1))
    out.update(_basic_conv(f"{prefix}.branch7x7dbl_5", c7, 192, 1, 7))
    out.update(_basic_conv(f"{prefix}.branch_pool", cin, 192, 1, 1))
    return out


def _inception_d(prefix, cin):
    out = {}
    out.update(_basic_conv(f"{prefix}.branch3x3_1", cin, 192, 1, 1))
    out.update(_basic_conv(f"{prefix}.branch3x3_2", 192, 320, 3, 3))
    out.update(_basic_conv(f"{prefix}.branch7x7x3_1", cin, 192, 1, 1))
    out.update(_basic_conv(f"{prefix}.branch7x7x3_2", 192, 192, 1, 7))
    out.update(_basic_conv(f"{prefix}.branch7x7x3_3", 192, 192, 7, 1))
    out.update(_basic_conv(f"{prefix}.branch7x7x3_4", 192, 192, 3, 3))
    return out


def _inception_e(prefix, cin):
    out = {}
    out.update(_basic_conv(f"{prefix}.branch1x1", cin, 320, 1, 1))
    out.update(_basic_conv(f"{prefix}.branch3x3_1", cin, 384, 1, 1))
    out.update(_basic_conv(f"{prefix}.branch3x3_2a", 384, 384, 1, 3))
    out.update(_basic_conv(f"{prefix}.branch3x3_2b", 384, 384, 3, 1))
    out.update(_basic_conv(f"{prefix}.branch3x3dbl_1", cin, 448, 1, 1))
    out.update(_basic_conv(f"{prefix}.branch3x3dbl_2", 448, 384, 3, 3))
    out.update(_basic_conv(f"{prefix}.branch3x3dbl_3a", 384, 384, 1, 3))
    out.update(_basic_conv(f"{prefix}.branch3x3dbl_3b", 384, 384, 3, 1))
    out.update(_basic_conv(f"{prefix}.branch_pool", cin, 192, 1, 1))
    return out


def attngan_image_encoder_manifest(nef: int = 256):
    """Key->shape manifest of a real AttnGAN ``image_encoder*.pth``.

    = the torchvision inception_v3 trunk Conv2d_1a..Mixed_7c (CNN_ENCODER
    copies exactly those modules flat onto itself, `DAMSM.py:144-165` —
    no AuxLogits/fc) plus the two trained projection heads
    (emb_features: conv1x1(768, nef, bias=False); emb_cnn_code:
    Linear(2048, nef), `DAMSM.py:164-165`).
    """
    m = {}
    m.update(_basic_conv("Conv2d_1a_3x3", 3, 32, 3, 3))
    m.update(_basic_conv("Conv2d_2a_3x3", 32, 32, 3, 3))
    m.update(_basic_conv("Conv2d_2b_3x3", 32, 64, 3, 3))
    m.update(_basic_conv("Conv2d_3b_1x1", 64, 80, 1, 1))
    m.update(_basic_conv("Conv2d_4a_3x3", 80, 192, 3, 3))
    m.update(_inception_a("Mixed_5b", 192, 32))
    m.update(_inception_a("Mixed_5c", 256, 64))
    m.update(_inception_a("Mixed_5d", 288, 64))
    m.update(_inception_b("Mixed_6a", 288))
    m.update(_inception_c("Mixed_6b", 768, 128))
    m.update(_inception_c("Mixed_6c", 768, 160))
    m.update(_inception_c("Mixed_6d", 768, 160))
    m.update(_inception_c("Mixed_6e", 768, 192))
    m.update(_inception_d("Mixed_7a", 768))
    m.update(_inception_e("Mixed_7b", 1280))
    m.update(_inception_e("Mixed_7c", 2048))
    m["emb_features.weight"] = (nef, 768, 1, 1)
    m["emb_cnn_code.weight"] = (nef, 2048)
    m["emb_cnn_code.bias"] = (nef,)
    return m


def attngan_text_encoder_manifest(n_words: int, ninput=300, h_per_dir=128):
    """Key->shape manifest of a real AttnGAN ``text_encoder*.pth``:
    nn.Embedding + torch's verbatim bidirectional nn.LSTM parameter names
    (RNN_ENCODER, `DAMSM.py:30-115`; nhidden=256 total => 128/direction,
    gate order i,f,g,o packed on dim 0)."""
    m = {"encoder.weight": (n_words, ninput)}
    for suffix in ("", "_reverse"):
        m[f"rnn.weight_ih_l0{suffix}"] = (4 * h_per_dir, ninput)
        m[f"rnn.weight_hh_l0{suffix}"] = (4 * h_per_dir, h_per_dir)
        m[f"rnn.bias_ih_l0{suffix}"] = (4 * h_per_dir,)
        m[f"rnn.bias_hh_l0{suffix}"] = (4 * h_per_dir,)
    return m


FILL = 0.12345  # every synthetic weight carries this marker value


def _synthetic_sd(manifest):
    return {k: np.full(s, FILL, np.float32) if s else np.zeros((), np.int64)
            for k, s in manifest.items()}


def _assert_all_filled(tree, where):
    """Every leaf must be the marker value => nothing stayed at random init."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        assert np.allclose(arr, FILL), (
            f"{where}: leaf {jax.tree_util.keystr(path)} not filled from the "
            f"synthetic checkpoint (defaulted param would silently diverge "
            f"from a real checkpoint)")


def test_image_encoder_consumes_full_torchvision_manifest():
    manifest = attngan_image_encoder_manifest()
    sd = _synthetic_sd(manifest)

    template = ImageEncoder(nef=256).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    consumed = set()
    variables = convert_image_encoder(sd, template, consumed=consumed)

    dropped = {k for k in manifest
               if k not in consumed and "num_batches_tracked" not in k}
    assert not dropped, (
        f"{len(dropped)} real-checkpoint keys would be silently dropped, "
        f"e.g. {sorted(dropped)[:8]}")
    _assert_all_filled(variables["params"], "image_encoder params")
    _assert_all_filled(variables["batch_stats"], "image_encoder batch_stats")


def test_image_encoder_rejects_wrong_shape():
    """A transposed/resized real checkpoint must fail loudly, not load."""
    manifest = attngan_image_encoder_manifest()
    sd = _synthetic_sd(manifest)
    sd["Mixed_6e.branch7x7_2.conv.weight"] = np.full(
        (192, 192, 7, 1), FILL, np.float32)  # wrong: real is (c7,c7,1,7)

    template = ImageEncoder(nef=256).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_image_encoder(sd, template)


def test_text_encoder_consumes_full_lstm_manifest():
    n_words = 57
    manifest = attngan_text_encoder_manifest(n_words)
    sd = _synthetic_sd(manifest)

    enc = TextEncoder(ntoken=n_words, nhidden=256, rnn_type="LSTM")
    template = enc.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 5), jnp.int32),
                        jnp.array([5, 3], jnp.int32), train=False)
    consumed = set()
    variables = convert_text_encoder(sd, template, consumed=consumed)

    dropped = set(manifest) - consumed
    assert not dropped, f"text-encoder keys silently dropped: {sorted(dropped)}"
    _assert_all_filled(
        {k: v for k, v in variables["params"].items() if k != "embedding"},
        "text_encoder rnn params")
    assert np.allclose(np.asarray(variables["params"]["embedding"]), FILL)


def test_text_encoder_rejects_wrong_hidden_size():
    n_words = 57
    manifest = attngan_text_encoder_manifest(n_words, h_per_dir=100)
    sd = _synthetic_sd(manifest)
    enc = TextEncoder(ntoken=n_words, nhidden=256, rnn_type="LSTM")
    template = enc.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 5), jnp.int32),
                        jnp.array([5, 3], jnp.int32), train=False)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_text_encoder(sd, template)
