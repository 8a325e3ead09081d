"""Numerical oracle: our masked-scan BiLSTM must match torch's packed BiLSTM.

This is the 'hard part' flagged in SURVEY.md §7: pack_padded_sequence
(enforce_sorted=False) semantics — per-sample final states at true lengths,
zero outputs at pads. We copy torch-initialised weights into our torch-layout
params and compare outputs elementwise.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _run_parity(rnn_type):
    torch.manual_seed(0)
    B, T, NIN, H = 5, 20, 12, 8
    ntoken = 30

    emb = torch.nn.Embedding(ntoken, NIN)
    rnn_cls = torch.nn.LSTM if rnn_type == "LSTM" else torch.nn.GRU
    rnn = rnn_cls(NIN, H, 1, batch_first=True, bidirectional=True)

    caps = torch.randint(1, ntoken, (B, T))
    lens = torch.tensor([20, 3, 11, 1, 7])

    with torch.no_grad():
        x = emb(caps)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            x, lens.tolist(), batch_first=True, enforce_sorted=False)
        h0 = torch.zeros(2, B, H)
        if rnn_type == "LSTM":
            out, hidden = rnn(packed, (h0, h0.clone()))
            h_fin = hidden[0]
        else:
            out, h_fin = rnn(packed, h0)
        out = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True,
                                                     total_length=T)[0]
        sent = h_fin.transpose(0, 1).contiguous().view(B, -1)

    # Build our encoder with identical weights.
    from eegan_tpu.models.text_encoder import TextEncoder

    model = TextEncoder(ntoken=ntoken, ninput=NIN, nhidden=2 * H,
                        rnn_type=rnn_type)
    params = {
        "embedding": jnp.asarray(emb.weight.detach().numpy()),
        "rnn_fwd": {
            "w_ih_l0": jnp.asarray(rnn.weight_ih_l0.detach().numpy()),
            "w_hh_l0": jnp.asarray(rnn.weight_hh_l0.detach().numpy()),
            "b_ih_l0": jnp.asarray(rnn.bias_ih_l0.detach().numpy()),
            "b_hh_l0": jnp.asarray(rnn.bias_hh_l0.detach().numpy()),
        },
        "rnn_bwd": {
            "w_ih_l0_reverse": jnp.asarray(rnn.weight_ih_l0_reverse.detach().numpy()),
            "w_hh_l0_reverse": jnp.asarray(rnn.weight_hh_l0_reverse.detach().numpy()),
            "b_ih_l0_reverse": jnp.asarray(rnn.bias_ih_l0_reverse.detach().numpy()),
            "b_hh_l0_reverse": jnp.asarray(rnn.bias_hh_l0_reverse.detach().numpy()),
        },
    }
    words_j, sent_j = model.apply({"params": params},
                                  jnp.asarray(caps.numpy()),
                                  jnp.asarray(lens.numpy()))

    np.testing.assert_allclose(np.asarray(words_j), out.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sent_j), sent.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_bilstm_packed_parity():
    _run_parity("LSTM")


def test_bigru_packed_parity():
    _run_parity("GRU")
