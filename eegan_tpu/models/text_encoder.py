"""Frozen DAMSM text encoder: bidirectional LSTM/GRU over captions.

Rebuilds `RNN_ENCODER` (reference `DAMSM.py:30-115`) with *packed-sequence
parity*: torch's ``pack_padded_sequence(enforce_sorted=False)`` means

* per-timestep outputs are zero for t >= length (``pad_packed_sequence``),
* the forward final state is taken at t = length-1 for each sample,
* the backward direction starts at t = length-1 and its final state is the
  state after processing t = 0.

We reproduce this with masked `lax.scan`s: the input projection for all
timesteps is one batched matmul (MXU), the recurrence only carries the
h @ W_hh step, and the backward direction runs on a per-sample
reversed-valid gather. Parameters are stored in the torch cuDNN layout
(``w_ih_l0`` of shape (4H, in), gate order i,f,g,o / r,z,n) so AttnGAN
checkpoints import weight-for-weight.

Returned shapes (note: unlike the reference's (B, D, T) ``words_emb`` we use
time-minor (B, T, D); the loss code is written for this layout):
    words_emb: (B, T, D_total)   zeros at padded steps
    sent_emb:  (B, D_total)      concat of final fwd/bwd states
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _lstm_gates(proj, h, c):
    i, f, g, o = jnp.split(proj, 4, axis=-1)
    i = nn.sigmoid(i)
    f = nn.sigmoid(f)
    g = jnp.tanh(g)
    o = nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


class _DirectionalRNN(nn.Module):
    """One direction of a torch-layout LSTM/GRU, masked scan."""

    ninput: int
    nhidden: int
    rnn_type: str = "LSTM"
    suffix: str = ""  # "" for forward, "_reverse" for backward
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, step_mask):
        """x: (B, T, ninput); step_mask: (B, T) 1.0 where the step is valid.

        Returns per-step outputs (B, T, H) (unmasked — caller masks) and the
        final hidden state (B, H) frozen at each sample's last valid step.
        """
        n_gates = 4 if self.rnn_type == "LSTM" else 3
        H = self.nhidden
        k = 1.0 / jnp.sqrt(float(H))

        def uinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        w_ih = self.param(f"w_ih_l0{self.suffix}", uinit, (n_gates * H, self.ninput))
        w_hh = self.param(f"w_hh_l0{self.suffix}", uinit, (n_gates * H, H))
        b_ih = self.param(f"b_ih_l0{self.suffix}", uinit, (n_gates * H,))
        b_hh = self.param(f"b_hh_l0{self.suffix}", uinit, (n_gates * H,))

        dt = self.dtype
        x = x.astype(dt)
        # Input projection for every timestep at once: (B,T,nG*H).
        x_proj = jnp.einsum("bti,gi->btg", x, w_ih.astype(dt)) + b_ih.astype(dt)

        B = x.shape[0]
        h0 = jnp.zeros((B, H), dt)
        c0 = jnp.zeros((B, H), dt)
        mask_t = step_mask.T[:, :, None].astype(dt)  # (T, B, 1)
        xp_t = x_proj.transpose(1, 0, 2)  # (T, B, nG*H)

        if self.rnn_type == "LSTM":
            def step(carry, inp):
                h, c = carry
                xp, m = inp
                proj = xp + h @ w_hh.astype(dt).T + b_hh.astype(dt)
                h_new, c_new = _lstm_gates(proj, h, c)
                h = m * h_new + (1.0 - m) * h
                c = m * c_new + (1.0 - m) * c
                return (h, c), h

            (h_fin, _), outs = jax.lax.scan(step, (h0, c0), (xp_t, mask_t))
        elif self.rnn_type == "GRU":
            def step(h, inp):
                xp, m = inp
                hp = h @ w_hh.astype(dt).T + b_hh.astype(dt)
                xr, xz, xn = jnp.split(xp, 3, axis=-1)
                hr, hz, hn = jnp.split(hp, 3, axis=-1)
                r = nn.sigmoid(xr + hr)
                z = nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1.0 - z) * n + z * h
                h = m * h_new + (1.0 - m) * h
                return h, h

            h_fin, outs = jax.lax.scan(step, h0, (xp_t, mask_t))
        else:
            raise NotImplementedError(self.rnn_type)

        return outs.transpose(1, 0, 2), h_fin  # (B,T,H), (B,H)


class TextEncoder(nn.Module):
    """Reference `RNN_ENCODER` (DAMSM.py:30-115)."""

    ntoken: int
    ninput: int = 300
    nhidden: int = 256  # total across directions (reference nhidden=EMBEDDING_DIM)
    rnn_type: str = "LSTM"
    drop_prob: float = 0.5
    bidirectional: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, captions, cap_lens, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """captions: (B, T) int32; cap_lens: (B,) int32 in [1, T]."""
        B, T = captions.shape
        H = self.nhidden // (2 if self.bidirectional else 1)

        emb_table = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -0.1, 0.1),
            (self.ntoken, self.ninput))
        emb = jnp.take(emb_table, captions, axis=0)
        emb = nn.Dropout(self.drop_prob, deterministic=not train)(emb)

        t_idx = jnp.arange(T)[None, :]  # (1, T)
        valid = (t_idx < cap_lens[:, None]).astype(jnp.float32)  # (B, T)

        out_f, h_f = _DirectionalRNN(self.ninput, H, self.rnn_type, "",
                                     dtype=self.dtype, name="rnn_fwd")(emb, valid)

        if self.bidirectional:
            # Per-sample reversed-valid gather: rev[t] = x[len-1-t] for t<len.
            rev_idx = jnp.clip(cap_lens[:, None] - 1 - t_idx, 0, T - 1)  # (B,T)
            emb_rev = jnp.take_along_axis(emb, rev_idx[:, :, None], axis=1)
            out_b_rev, h_b = _DirectionalRNN(self.ninput, H, self.rnn_type,
                                             "_reverse", dtype=self.dtype,
                                             name="rnn_bwd")(emb_rev, valid)
            # Scatter back: out_b[t] = out_b_rev[len-1-t] (same involution).
            out_b = jnp.take_along_axis(out_b_rev, rev_idx[:, :, None], axis=1)
            words = jnp.concatenate([out_f, out_b], axis=-1)
            sent = jnp.concatenate([h_f, h_b], axis=-1)
        else:
            words = out_f
            sent = h_f

        words = words * valid[:, :, None]  # pad steps are exact zeros
        return words.astype(jnp.float32), sent.astype(jnp.float32)
