"""Full-model fp32 parity on identical checkpoints: a torch model with the
reference's exact module structure and math (independent re-expression of
baseline_attention.py / adaptive_attention.py) -> state_dict -> converted ->
our model must produce identical teacher-forcing scores and greedy samples.

This is the SURVEY.md "output fidelity on identical checkpoints" requirement,
end to end: ResNet encoder (BasicBlock for test speed), affine heads, LSTM,
sentinel, 50-slot adaptive attention, vocab head.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from adaptive_tpu.models.factory import build_model  # noqa: E402
from adaptive_tpu.models.torch_import import convert_reference_checkpoint  # noqa: E402
from tests.test_torch_import import BasicBlock, TorchResNet  # noqa: E402

E, H, VOCAB, K = 8, 16, 40, 4  # embed, hidden, vocab, slots (64px -> 2x2)


class TorchAttentiveCNN(nn.Module):
    # reference AttentiveCNN (baseline_attention.py:11-62) minus torchvision
    def __init__(self):
        super().__init__()
        self.resnet_conv = nn.Sequential(*self._children())
        self.affine_a = nn.Linear(512, H)
        self.affine_b = nn.Linear(512, E)
        self.affine_h0 = nn.Linear(512, H)
        self.affine_c0 = nn.Linear(512, H)

    def _children(self):
        r = TorchResNet(BasicBlock, (2, 2, 2, 2))
        return [r.conv1, r.bn1, nn.ReLU(inplace=False), r.maxpool,
                r.layer1, r.layer2, r.layer3, r.layer4]

    def forward(self, images):
        A = self.resnet_conv(images)  # [B, 512, k, k]
        a_g = A.mean(dim=(2, 3))
        V = torch.relu(self.affine_a(A.flatten(2).transpose(1, 2)))
        v_g = torch.relu(self.affine_b(a_g))
        h0 = torch.tanh(self.affine_h0(a_g))
        c0 = torch.tanh(self.affine_c0(a_g))
        return V, v_g, (h0.unsqueeze(0), c0.unsqueeze(0))


class TorchAdaptiveDecoder(nn.Module):
    # reference Decoder + AdaptiveBlock + Sentinel + Atten
    # (adaptive_attention.py:12-155), module names match for state_dict parity
    def __init__(self):
        super().__init__()
        self.embed = nn.Embedding(VOCAB, E)
        self.LSTM = nn.LSTM(E * 2, H, 1, batch_first=True)
        self.adaptive = nn.Module()
        self.adaptive.sentinel = nn.Module()
        self.adaptive.sentinel.affine_x = nn.Linear(2 * E, H, bias=False)
        self.adaptive.sentinel.affine_h = nn.Linear(H, H, bias=False)
        self.adaptive.atten = nn.Module()
        self.adaptive.atten.affine_v = nn.Linear(H, K, bias=False)
        self.adaptive.atten.affine_g = nn.Linear(H, K, bias=False)
        self.adaptive.atten.affine_s = nn.Linear(H, K, bias=False)
        self.adaptive.atten.affine_h = nn.Linear(K, 1, bias=False)
        self.adaptive.mlp = nn.Linear(H, VOCAB)

    def forward(self, V, v_g, captions, states):
        emb = self.embed(captions)
        x = torch.cat([emb, v_g.unsqueeze(1).expand_as(emb)], dim=2)
        T = x.size(1)
        hiddens, cells = [], []
        st = states
        for t in range(T):  # per-token loop, like the reference
            h_t, st = self.LSTM(x[:, t:t + 1], st)
            hiddens.append(h_t[:, 0])
            cells.append(st[1][0])
        hiddens = torch.stack(hiddens, 1)
        cells = torch.stack(cells, 1)

        # h_{t-1} with ZERO prefix (adaptive_attention.py:116-122)
        h_prev = torch.cat([torch.zeros_like(hiddens[:, :1]), hiddens[:, :-1]], 1) \
            if T > 1 else torch.zeros_like(hiddens[:, :1])
        a = self.adaptive
        s = torch.sigmoid(a.sentinel.affine_x(x) + a.sentinel.affine_h(h_prev)) * torch.tanh(cells)
        pv = a.atten.affine_v(V)
        ph = a.atten.affine_g(hiddens)
        z = a.atten.affine_h(torch.tanh(pv.unsqueeze(1) + ph.unsqueeze(2))).squeeze(3)
        alpha = torch.softmax(z, -1)
        c = alpha @ V
        z_s = a.atten.affine_h(torch.tanh(a.atten.affine_s(s) + ph))
        ahat = torch.softmax(torch.cat([z, z_s], -1), -1)
        beta = ahat[..., -1:]
        c_hat = beta * s + (1 - beta) * c
        return a.mlp(c_hat + hiddens), st


class TorchEncoder2Decoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TorchAttentiveCNN()
        self.decoder = TorchAdaptiveDecoder()

    def forward(self, images, captions):
        V, v_g, (h0, c0) = self.encoder(images)
        scores, _ = self.decoder(V, v_g, captions, (h0, c0))
        return scores


@pytest.fixture(scope="module")
def models(tiny_cf):
    tm = TorchEncoder2Decoder().eval()
    # randomize BN stats so eval-mode BN is nontrivial
    rng = np.random.default_rng(0)
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.tensor(rng.normal(0, 0.3, m.running_mean.shape), dtype=torch.float32))
                m.running_var.copy_(torch.tensor(rng.uniform(0.5, 1.5, m.running_var.shape), dtype=torch.float32))

    cf = tiny_cf.replace(
        atten_model_name="adaptive_attention", vocab_length=VOCAB,
        adaptive_word_embed_size=E, adaptive_lstm_hidden_size=H,
    )
    model = build_model(cf)
    params, state = convert_reference_checkpoint(
        {k: v for k, v in tm.state_dict().items()}, "adaptive_attention", "resnet18"
    )
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)
    return cf, tm, model, params, state


def test_teacher_forcing_scores_match(models):
    cf, tm, model, params, state = models
    rng = np.random.default_rng(1)
    B, T = 2, 5
    images = rng.normal(size=(B, 64, 64, 3)).astype(np.float32)
    captions = rng.integers(1, VOCAB, (B, T)).astype(np.int64)

    with torch.no_grad():
        want = tm(torch.tensor(images.transpose(0, 3, 1, 2)), torch.tensor(captions)).numpy()
    got, _, _ = model.forward(params, state, jnp.asarray(images), jnp.asarray(captions.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)


def test_greedy_samples_match(models):
    """Token-for-token greedy parity: reference-style per-token torch sampling
    (sentinel h_prev = 0 each step) vs our scan decoder on the same weights."""
    cf, tm, model, params, state = models
    rng = np.random.default_rng(2)
    B, L = 2, 8
    images = rng.normal(size=(B, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        V, v_g, st = tm.encoder(torch.tensor(images.transpose(0, 3, 1, 2)))
        tok = torch.ones(B, 1, dtype=torch.long)
        want = []
        for _ in range(L):
            scores, st = tm.decoder(V, v_g, tok, st)
            tok = scores.argmax(-1)
            want.append(tok[:, 0].numpy())
    want = np.stack(want, 1)

    from adaptive_tpu.decoding import make_greedy_decoder

    cf2 = cf.replace(decode_max_len=L, train_crop_size=64, resized_image_size=64)
    model2 = build_model(cf2)
    # feed preprocessed floats through the decoder's own encode path by
    # mimicking eval_preprocess inverse: supply uint8 that normalizes back?
    # Simpler: drive decode_step directly with the encoder outputs.
    Vj, vgj, h0j, c0j, _ = model2.encode(params, state, jnp.asarray(images))
    dstate = model2.init_decode_state(h0j, c0j)
    tokj = jnp.ones((B,), jnp.int32)
    got = []
    for _ in range(L):
        logits, _, _, dstate = model2.decode_step(params, tokj, vgj, dstate, Vj, False)
        tokj = jnp.argmax(logits, -1).astype(jnp.int32)
        got.append(np.asarray(tokj))
    got = np.stack(got, 1)
    np.testing.assert_array_equal(got, want)
