"""Weight-ingestion parity: a torch ResNet oracle (independent re-expression,
torchvision is unavailable here) -> state_dict with torchvision names ->
convert -> our NHWC resnet must produce identical fp32 features."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from adaptive_tpu.models import resnet as R  # noqa: E402
from adaptive_tpu.models.torch_import import (convert_reference_checkpoint,
                                              convert_torchvision_resnet)


# --------------------------- torch oracle (torchvision-compatible naming) ---
class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, width, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.downsample = None
        if stride != 1 or cin != width:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width, 1, stride, bias=False), nn.BatchNorm2d(width)
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idn)


class TorchResNet(nn.Module):
    def __init__(self, block, stages):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for li, n in enumerate(stages):
            width = 64 * 2**li
            blocks = []
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                blocks.append(block(cin, width, stride))
                cin = width * block.expansion
            setattr(self, f"layer{li+1}", nn.Sequential(*blocks))

    def forward(self, x):
        y = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for li in range(4):
            y = getattr(self, f"layer{li+1}")(y)
        return y


def _randomize_bn_stats(model, seed):
    rng = np.random.default_rng(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.tensor(rng.normal(size=m.running_mean.shape), dtype=torch.float32))
                m.running_var.copy_(torch.tensor(rng.uniform(0.5, 2.0, m.running_var.shape), dtype=torch.float32))
                m.weight.copy_(torch.tensor(rng.normal(1, 0.1, m.weight.shape), dtype=torch.float32))
                m.bias.copy_(torch.tensor(rng.normal(0, 0.1, m.bias.shape), dtype=torch.float32))


@pytest.mark.parametrize("arch,block,stages", [
    ("resnet18", BasicBlock, (2, 2, 2, 2)),
    ("resnet50", Bottleneck, (3, 4, 6, 3)),
])
def test_resnet_forward_matches_torch(arch, block, stages):
    tm = TorchResNet(block, stages).eval()
    _randomize_bn_stats(tm, 0)
    sd = tm.state_dict()

    params, state = convert_torchvision_resnet(sd, arch)
    x = np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got, _ = R.resnet_apply(params, state, jnp.asarray(x), arch, train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_reference_checkpoint_conversion_structure(tiny_cf):
    """Synthesize a reference-named state_dict (numpy), convert, and load it
    into a live model: shapes must line up leaf-for-leaf and decode must run."""
    from adaptive_tpu.models.factory import build_model
    from adaptive_tpu.training.checkpoint import _flatten

    cf = tiny_cf
    model = build_model(cf)
    params, state = model.init(jax.random.PRNGKey(0))

    # build a fake reference state_dict from our own tree (inverse transforms)
    rng = np.random.default_rng(2)
    sd = {}
    # encoder resnet as Sequential names
    tm = TorchResNet(BasicBlock, (2, 2, 2, 2))
    for k, v in tm.state_dict().items():
        sd["encoder.resnet_conv." + _to_seq_name(k)] = v
    for nm, ours in [("affine_a", "affine_a"), ("affine_b", "affine_b"),
                     ("affine_h0", "affine_h0"), ("affine_c0", "affine_c0")]:
        kern = params["encoder"][ours]["kernel"]
        sd[f"encoder.{nm}.weight"] = np.asarray(kern).T
        sd[f"encoder.{nm}.bias"] = np.asarray(params["encoder"][ours]["bias"])
    sd["decoder.embed.weight"] = np.asarray(params["decoder"]["embed"])
    for tname, ours in [("weight_ih_l0", "w_ih"), ("weight_hh_l0", "w_hh")]:
        sd[f"decoder.LSTM.{tname}"] = np.asarray(params["decoder"]["lstm"][ours]).T
    for tname, ours in [("bias_ih_l0", "b_ih"), ("bias_hh_l0", "b_hh")]:
        sd[f"decoder.LSTM.{tname}"] = np.asarray(params["decoder"]["lstm"][ours])
    blk = params["decoder"]["adaptive"]
    for nm in ("affine_v", "affine_g", "affine_s", "affine_h"):
        sd[f"decoder.adaptive.atten.{nm}.weight"] = np.asarray(blk["atten"][nm]["kernel"]).T
    for nm in ("affine_x", "affine_h"):
        sd[f"decoder.adaptive.sentinel.{nm}.weight"] = np.asarray(blk["sentinel"][nm]["kernel"]).T
    sd["decoder.adaptive.mlp.weight"] = np.asarray(blk["mlp"]["kernel"]).T
    sd["decoder.adaptive.mlp.bias"] = np.asarray(blk["mlp"]["bias"])

    p2, s2 = convert_reference_checkpoint(sd, "adaptive_attention", "resnet18")

    # every non-resnet leaf must round-trip exactly
    np.testing.assert_allclose(
        np.asarray(p2["decoder"]["lstm"]["w_ih"]), np.asarray(params["decoder"]["lstm"]["w_ih"])
    )
    np.testing.assert_allclose(
        np.asarray(p2["decoder"]["adaptive"]["atten"]["affine_s"]["kernel"]),
        np.asarray(blk["atten"]["affine_s"]["kernel"]),
    )
    # tree structures identical (so checkpoints interchange)
    want_keys = set(_flatten(params["decoder"]).keys())
    got_keys = set(_flatten(p2["decoder"]).keys())
    assert want_keys == got_keys


def _to_seq_name(k: str) -> str:
    head, _, tail = k.partition(".")
    inv = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5", "layer3": "6", "layer4": "7"}
    return f"{inv[head]}.{tail}" if head in inv else k
