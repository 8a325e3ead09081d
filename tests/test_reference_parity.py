"""Numerical parity against the reference PyTorch models.

The strongest checkpoint-compatibility evidence we can produce without the
real CUB corpus: instantiate the *reference* torch modules (imported from
/root/reference, used purely as a black-box oracle), convert their randomly
initialised state dicts through `eegan_tpu.utils.torch_convert`, and demand
elementwise-equal outputs from our NHWC/Flax rebuilds. This is what FID
parity with reference checkpoints rests on (SURVEY.md §7 'hard parts').
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference tree not mounted")


class _EasyDict(dict):
    """Minimal easydict stand-in so the reference's config module imports."""

    def __init__(self, d=None, **kw):
        super().__init__()
        for k, v in {**(d or {}), **kw}.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, _EasyDict):
            v = _EasyDict(v)
        super().__setitem__(k, v)
        super().__setattr__(k, v)

    __setattr__ = __setitem__

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


@pytest.fixture(scope="module")
def ref_models():
    torch = pytest.importorskip("torch")
    shim = types.ModuleType("easydict")
    shim.EasyDict = _EasyDict
    sys.modules.setdefault("easydict", shim)
    sys.path.insert(0, REFERENCE)
    import models as ref  # noqa: the reference models module (oracle only)

    sys.path.remove(REFERENCE)
    return torch, ref


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_generator_parity(ref_models):
    torch, ref = ref_models
    torch.manual_seed(0)
    NGF = 8
    gen_t = ref.Gen(NGF, 100).eval()
    # non-trivial residual gates + running stats so the test has teeth
    with torch.no_grad():
        for name, p in gen_t.named_parameters():
            if name.endswith("gamma"):
                p.fill_(0.5)
        for m in gen_t.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    z = torch.randn(2, 100)
    sent = torch.randn(2, 256)
    attrs = torch.randn(2, 256)
    with torch.no_grad():
        imgs_t = gen_t(z, sent, attrs)

    from eegan_tpu.models.generator import Generator
    from eegan_tpu.utils.torch_convert import convert_generator

    gen_j = Generator(ngf=NGF, nz=100)
    template = gen_j.init(jax.random.PRNGKey(0), jnp.asarray(z.numpy()),
                          jnp.asarray(sent.numpy()), jnp.asarray(attrs.numpy()),
                          train=False)
    variables = convert_generator(_sd(gen_t), template)
    imgs_j = gen_j.apply(variables, jnp.asarray(z.numpy()),
                         jnp.asarray(sent.numpy()),
                         jnp.asarray(attrs.numpy()), train=False)

    for t_img, j_img in zip(imgs_t, imgs_j):
        np.testing.assert_allclose(
            np.asarray(j_img), t_img.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("scale", [64, 256])
def test_discriminator_parity(ref_models, scale):
    torch, ref = ref_models
    torch.manual_seed(1)
    NDF = 8
    if scale == 64:
        d_t = ref.Dis64(NDF).eval()
    else:
        d_t = ref.Dis256(NDF, True, 17).eval()
    with torch.no_grad():
        for name, p in d_t.named_parameters():
            if name.endswith("gamma"):
                p.fill_(0.3)

    x = torch.randn(2, 3, scale, scale)
    sent = torch.randn(2, 256)
    with torch.no_grad():
        feat_t = d_t(x)
        out_t = d_t.COND_DNET(feat_t, sent)

    from eegan_tpu.models.discriminator import Discriminator
    from eegan_tpu.utils.torch_convert import convert_discriminator

    d_j = Discriminator(ndf=NDF, scale=scale, disc_class=(scale == 256),
                        class_nums=17)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    sj = jnp.asarray(sent.numpy())
    template = d_j.init(jax.random.PRNGKey(0), xj, sj)
    variables = convert_discriminator(_sd(d_t), template)

    feat_j = d_j.apply(variables, xj, method="features")
    np.testing.assert_allclose(np.asarray(feat_j),
                               feat_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)
    out_j = d_j.apply(variables, feat_j, sj, method="head")
    if scale == 256:
        np.testing.assert_allclose(np.asarray(out_j[0]),
                                   out_t[0].numpy().reshape(-1),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(out_j[1]), out_t[1].numpy(),
                                   atol=2e-4, rtol=1e-3)
    else:
        np.testing.assert_allclose(np.asarray(out_j),
                                   out_t.numpy().reshape(-1),
                                   atol=2e-4, rtol=1e-3)


def test_attr_enhance_parity(ref_models):
    torch, ref = ref_models
    torch.manual_seed(2)
    m_t = ref.ATTR_Enhance(256).eval()
    sent = torch.randn(3, 256)
    attrs = torch.randn(3, 3, 256)
    with torch.no_grad():
        s_t, a_t = m_t(sent, attrs)
        merged_t = ref.ATTR_Enhance.attr_merge(a_t)

    from eegan_tpu.models.attr_enhance import AttrEnhance
    from eegan_tpu.utils.torch_convert import convert_attr_enhance

    m_j = AttrEnhance(ntf=256)
    template = m_j.init(jax.random.PRNGKey(0), jnp.asarray(sent.numpy()),
                        jnp.asarray(attrs.numpy()))
    variables = convert_attr_enhance(_sd(m_t), template)
    s_j, a_j = m_j.apply(variables, jnp.asarray(sent.numpy()),
                         jnp.asarray(attrs.numpy()))
    np.testing.assert_allclose(np.asarray(s_j), s_t.numpy(), atol=1e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(AttrEnhance.attr_merge(a_j)),
                               merged_t.numpy(), atol=1e-5, rtol=1e-4)


def test_convert_checkpoints_cli(ref_models, tmp_path, monkeypatch):
    """Full CLI path: reference .pth (DataParallel-prefixed) -> Orbax -> same
    outputs as the torch oracle."""
    torch, ref = ref_models
    torch.manual_seed(3)
    NGF = 8
    gen_t = ref.Gen(NGF, 100).eval()
    attr_t = ref.ATTR_Enhance(256).eval()
    with torch.no_grad():
        for _, p in gen_t.named_parameters():
            if p.ndim == 1 and p.shape[0] == 1:
                p.fill_(0.25)

    # the reference saves DataParallel-wrapped state dicts (train.py:310)
    g_pth = str(tmp_path / "netG_42.pth")
    a_pth = str(tmp_path / "attr_enhance_42.pth")
    torch.save({f"module.{k}": v for k, v in gen_t.state_dict().items()}, g_pth)
    torch.save({f"module.{k}": v for k, v in attr_t.state_dict().items()}, a_pth)

    import sys

    import convert_checkpoints as cc

    model_dir = str(tmp_path / "Model")
    # G_EMA on: regression for the snapshot silently carrying the random-init
    # EMA seed instead of the converted weights (round-3 review finding).
    monkeypatch.setattr(sys, "argv", [
        "convert_checkpoints.py", "--cfg", "cfg/bird.yml", "--n_words", "50",
        "--netG", g_pth, "--attr_enhance", a_pth, "--epoch", "42",
        "--out_model_dir", model_dir,
        "--set", "GAN.GF_DIM=8", "--set", "RUNTIME.COMPUTE_DTYPE=float32",
        "--set", "TRAIN.G_EMA_DECAY=0.995",
    ])
    cc.main()

    from eegan_tpu.models.generator import Generator
    from eegan_tpu.training.checkpoint import CheckpointManager

    mgr = CheckpointManager(model_dir)
    assert mgr.available_generator_epochs() == [42]
    restored = mgr.load_generator(42, None)

    z = torch.randn(2, 100)
    sent = torch.randn(2, 256)
    attrs = torch.randn(2, 256)
    with torch.no_grad():
        imgs_t = gen_t(z, sent, attrs)

    gen_j = Generator(ngf=NGF, nz=100)
    imgs_j = gen_j.apply({"params": restored["g_params"],
                          "batch_stats": restored["g_stats"]},
                         jnp.asarray(z.numpy()), jnp.asarray(sent.numpy()),
                         jnp.asarray(attrs.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(imgs_j[-1]),
                               imgs_t[-1].numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)
    mgr.close()


@pytest.mark.slow
def test_convert_checkpoints_verify_rehearsal(ref_models, tmp_path,
                                              monkeypatch):
    """VERDICT r2 #7: `--verify` runs conversion -> activation parity ->
    FID smoke in one command on synthetic .pth artefacts, and fails loudly
    (non-zero exit) when a weight is corrupted."""
    torch, ref = ref_models
    torch.manual_seed(5)
    NGF = 8
    gen_t = ref.Gen(NGF, 100).eval()
    attr_t = ref.ATTR_Enhance(256).eval()

    g_pth = str(tmp_path / "netG_9.pth")
    a_pth = str(tmp_path / "attr_enhance_9.pth")
    torch.save(gen_t.state_dict(), g_pth)
    torch.save(attr_t.state_dict(), a_pth)

    # Synthetic AttnGAN DAMSM pair: torch LSTM text encoder + the exact
    # torchvision-layout image-encoder oracle.
    rnn = torch.nn.LSTM(300, 128, batch_first=True, bidirectional=True)
    emb = torch.nn.Embedding(50, 300)
    text_sd = {"encoder.weight": emb.weight.detach(),
               **{f"rnn.{k}": v.detach() for k, v in rnn.state_dict().items()}}
    t_pth = str(tmp_path / "text_encoder9.pth")
    torch.save(text_sd, t_pth)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_inception_ref import RefCNNEncoder, randomize

    cnn = RefCNNEncoder(nef=256)
    randomize(cnn, seed=9)
    torch.save(cnn.state_dict(), t_pth.replace("text_encoder",
                                               "image_encoder"))

    import convert_checkpoints as cc

    argv = ["convert_checkpoints.py", "--cfg", "cfg/bird.yml",
            "--n_words", "50", "--netG", g_pth, "--attr_enhance", a_pth,
            "--damsm", t_pth, "--epoch", "9",
            "--out_model_dir", str(tmp_path / "Model"), "--verify",
            "--skip_sweep",  # oracle-path test; the sweep has its own test
            "--set", "GAN.GF_DIM=8", "--set",
            "RUNTIME.COMPUTE_DTYPE=float32"]
    monkeypatch.setattr(sys, "argv", argv)
    cc.main()  # must not raise: all oracles match

    # Inject a conversion fault: --verify must exit non-zero. (Corrupting
    # the source .pth can NOT trip verify — the torch oracle loads the same
    # file, so a faithful conversion of corrupted weights still matches.
    # What verify guards is the conversion itself, so break that.)
    import jax
    import numpy as np

    from eegan_tpu.utils import torch_convert as tc_mod

    real_convert = tc_mod.convert_generator

    def broken_convert(sd, template):
        # perturb every leaf: zero-init gates make single-leaf faults in
        # block interiors invisible at reference init
        out = real_convert(sd, template)
        return jax.tree_util.tree_map(lambda l: np.asarray(l) + 1e-2, out)

    monkeypatch.setattr(tc_mod, "convert_generator", broken_convert)
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(SystemExit):
        cc.main()


@pytest.mark.slow
def test_convert_checkpoints_sweep_rehearsal_end_to_end(ref_models, tmp_path,
                                                        monkeypatch):
    """VERDICT r3 #9: `--verify` WITHOUT --skip_sweep drives the production
    `test.py` sweep (R-precision + image writing) and the
    `metrics/fid_score.py` folder pass as subprocesses against the converted
    snapshot, on a miniature corpus it generates itself — the literal
    command sequence of the real-data quality run."""
    torch, ref = ref_models
    torch.manual_seed(7)
    NGF = 8
    gen_t = ref.Gen(NGF, 100).eval()
    attr_t = ref.ATTR_Enhance(256).eval()
    g_pth = str(tmp_path / "netG_3.pth")
    a_pth = str(tmp_path / "attr_enhance_3.pth")
    torch.save(gen_t.state_dict(), g_pth)
    torch.save(attr_t.state_dict(), a_pth)

    import convert_checkpoints as cc

    monkeypatch.setattr(sys, "argv", [
        "convert_checkpoints.py", "--cfg", "cfg/bird.yml", "--n_words", "50",
        "--netG", g_pth, "--attr_enhance", a_pth, "--epoch", "3",
        "--out_model_dir", str(tmp_path / "Model"), "--verify",
        "--set", "GAN.GF_DIM=8", "--set", "RUNTIME.COMPUTE_DTYPE=float32"])
    cc.main()  # raises SystemExit(!=0) on any sweep/FID failure
