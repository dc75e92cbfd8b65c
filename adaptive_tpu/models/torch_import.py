"""Offline ingestion of PyTorch weights: torchvision ResNets + reference checkpoints.

Two converters (host-side, torch optional — reads .pth/.pkl via torch, or a
pre-converted .npz without torch):

1. torchvision ResNet state_dict -> our NHWC resnet pytree + BN state.
   Enables the reference's pretrained-ResNet-152 encoder
   (baseline_attention.py:16: models.resnet152(pretrained=True)) on TPU hosts
   with no network access: convert once offline, ship the .npz.

2. Reference Encoder2Decoder state_dict -> our full param tree. The name map
   follows the reference module structure (encoder.resnet_conv.{0,1,4..7} =
   Sequential[conv1,bn1,relu,maxpool,layer1..4]; encoder.affine_*;
   decoder.embed/LSTM/adaptive.*) so fp32 outputs match on identical
   checkpoints (SURVEY.md hard-part #3).

Layout transforms: torch Linear weight [out,in] -> kernel [in,out];
torch conv weight [out,in,kh,kw] -> HWIO [kh,kw,in,out]; LSTM weights
[4H,in] -> [in,4H] (gate order i,f,g,o is shared).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _conv(sd, name):
    return {"kernel": _np(sd[name + ".weight"]).transpose(2, 3, 1, 0)}


def _bn(sd, name) -> Tuple[Dict, Dict]:
    p = {"scale": _np(sd[name + ".weight"]), "bias": _np(sd[name + ".bias"])}
    s = {"mean": _np(sd[name + ".running_mean"]), "var": _np(sd[name + ".running_var"])}
    return p, s


def _linear(sd, name, bias=True):
    p = {"kernel": _np(sd[name + ".weight"]).T}
    if bias and name + ".bias" in sd:
        p["bias"] = _np(sd[name + ".bias"])
    return p


def convert_torchvision_resnet(sd: Dict[str, Any], arch: str) -> Tuple[Dict, Dict]:
    """torchvision resnet state_dict -> (params, state) pytrees matching
    models/resnet.py's init_resnet structure."""
    from adaptive_tpu.models.resnet import RESNET_SPECS

    block_type, stages = RESNET_SPECS[arch]
    n_convs = 3 if block_type == "bottleneck" else 2

    params: Dict[str, Any] = {"conv1": _conv(sd, "conv1")}
    state: Dict[str, Any] = {}
    params["bn1"], state["bn1"] = _bn(sd, "bn1")

    for li, n_blocks in enumerate(stages):
        bp, bs = [], []
        for bi in range(n_blocks):
            prefix = f"layer{li+1}.{bi}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                p[f"conv{ci}"] = _conv(sd, f"{prefix}.conv{ci}")
                p[f"bn{ci}"], s[f"bn{ci}"] = _bn(sd, f"{prefix}.bn{ci}")
            if f"{prefix}.downsample.0.weight" in sd:
                p["downsample"] = {"conv": _conv(sd, f"{prefix}.downsample.0")}
                p["downsample"]["bn"], s["downsample_bn"] = _bn(sd, f"{prefix}.downsample.1")
            bp.append(p)
            bs.append(s)
        params[f"layer{li+1}"] = bp
        state[f"layer{li+1}"] = bs
    return params, state


# Sequential child index -> torchvision name (baseline_attention.py:17-18's
# list(resnet.children())[:-2] wrapped in nn.Sequential)
_SEQ2NAME = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2", "6": "layer3", "7": "layer4"}


def _unseq(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Rename 'encoder.resnet_conv.<idx>.<rest>' keys to torchvision names."""
    out = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        rest = k[len(prefix):]
        idx, _, tail = rest.partition(".")
        name = _SEQ2NAME.get(idx)
        if name is None:
            continue
        out[f"{name}.{tail}" if tail else name] = v
    return out


def convert_reference_checkpoint(sd: Dict[str, Any], variant: str, arch: str = "resnet152") -> Tuple[Dict, Dict]:
    """Reference Encoder2Decoder.state_dict() -> (params, model_state).

    Handles all three variants' decoder blocks (adaptive_attention.py:89-108,
    baseline_attention.py:100-128, rnn_attention.py:13-29).
    """
    rn_params, rn_state = convert_torchvision_resnet(_unseq(sd, "encoder.resnet_conv."), arch)
    params: Dict[str, Any] = {
        "encoder": {
            "resnet": rn_params,
            "affine_a": _linear(sd, "encoder.affine_a"),
            "affine_b": _linear(sd, "encoder.affine_b"),
            "affine_h0": _linear(sd, "encoder.affine_h0"),
            "affine_c0": _linear(sd, "encoder.affine_c0"),
        }
    }
    dec: Dict[str, Any] = {
        "embed": _np(sd["decoder.embed.weight"]),
        "lstm": {
            "w_ih": _np(sd["decoder.LSTM.weight_ih_l0"]).T,
            "w_hh": _np(sd["decoder.LSTM.weight_hh_l0"]).T,
            "b_ih": _np(sd["decoder.LSTM.bias_ih_l0"]),
            "b_hh": _np(sd["decoder.LSTM.bias_hh_l0"]),
        },
    }
    block: Dict[str, Any] = {"mlp": _linear(sd, "decoder.adaptive.mlp")}
    atten = {"affine_v": _linear(sd, "decoder.adaptive.atten.affine_v"),
             "affine_g": _linear(sd, "decoder.adaptive.atten.affine_g"),
             "affine_h": _linear(sd, "decoder.adaptive.atten.affine_h")}
    if variant == "adaptive_attention":
        atten["affine_s"] = _linear(sd, "decoder.adaptive.atten.affine_s")
        block["sentinel"] = {
            "affine_x": _linear(sd, "decoder.adaptive.sentinel.affine_x"),
            "affine_h": _linear(sd, "decoder.adaptive.sentinel.affine_h"),
        }
    if variant == "rnn_attention":
        atten["lstm_fwd"] = {
            "w_ih": _np(sd["decoder.adaptive.atten.lstm.weight_ih_l0"]).T,
            "w_hh": _np(sd["decoder.adaptive.atten.lstm.weight_hh_l0"]).T,
            "b_ih": _np(sd["decoder.adaptive.atten.lstm.bias_ih_l0"]),
            "b_hh": _np(sd["decoder.adaptive.atten.lstm.bias_hh_l0"]),
        }
        if "decoder.adaptive.atten.lstm.weight_ih_l0_reverse" in sd:
            atten["lstm_bwd"] = {
                "w_ih": _np(sd["decoder.adaptive.atten.lstm.weight_ih_l0_reverse"]).T,
                "w_hh": _np(sd["decoder.adaptive.atten.lstm.weight_hh_l0_reverse"]).T,
                "b_ih": _np(sd["decoder.adaptive.atten.lstm.bias_ih_l0_reverse"]),
                "b_hh": _np(sd["decoder.adaptive.atten.lstm.bias_hh_l0_reverse"]),
            }
    block["atten"] = atten
    dec["adaptive"] = block
    params["decoder"] = dec
    return params, {"resnet": rn_state}


def pad_vocab_params(decoder: Dict, padded_vocab: int) -> Dict:
    """Zero-pad the embedding rows and head columns to `padded_vocab` (for
    converting unpadded checkpoints into a vocab-padded model; padded logits
    are masked to -inf at apply time so outputs are identical)."""
    out = dict(decoder)
    V, E = decoder["embed"].shape
    if V < padded_vocab:
        out["embed"] = np.concatenate(
            [np.asarray(decoder["embed"]), np.zeros((padded_vocab - V, E), np.float32)]
        )
        blk = dict(decoder["adaptive"])
        mlp = dict(blk["mlp"])
        k = np.asarray(mlp["kernel"])
        mlp["kernel"] = np.concatenate(
            [k, np.zeros((k.shape[0], padded_vocab - V), np.float32)], axis=1
        )
        if "bias" in mlp:
            b = np.asarray(mlp["bias"])
            mlp["bias"] = np.concatenate([b, np.zeros((padded_vocab - V,), np.float32)])
        blk["mlp"] = mlp
        out["adaptive"] = blk
    return out


def load_pretrained_resnet(npz_path: str, params: Dict, state: Dict) -> Tuple[Dict, Dict]:
    """Install a pre-converted torchvision resnet .npz (see save_resnet_npz)
    into an initialized param/state tree."""
    import jax
    from adaptive_tpu.training.checkpoint import _unflatten_into

    with np.load(npz_path) as data:
        flat = dict(data)
    tree = _unflatten_into(
        {"resnet": params["encoder"]["resnet"], "state": state["resnet"]}, flat
    )
    new_params = dict(params)
    new_params["encoder"] = dict(params["encoder"])
    new_params["encoder"]["resnet"] = tree["resnet"]
    return new_params, {"resnet": tree["state"]}


def save_resnet_npz(state_dict_or_path, arch: str, out_path: str):
    """Offline converter CLI helper: torch .pth -> .npz for encoder_pretrained_npz."""
    from adaptive_tpu.training.checkpoint import _flatten

    sd = state_dict_or_path
    if isinstance(sd, str):
        import torch

        sd = torch.load(sd, map_location="cpu")
    rn_params, rn_state = convert_torchvision_resnet(sd, arch)
    np.savez(out_path, **_flatten({"resnet": rn_params, "state": rn_state}))


def save_reference_checkpoint_npz(state_dict_or_path, variant: str, arch: str, out_dir: str):
    """Offline converter: reference model .pkl -> our checkpoint dir."""
    from adaptive_tpu.training.checkpoint import save_checkpoint

    sd = state_dict_or_path
    if isinstance(sd, str):
        import torch

        sd = torch.load(sd, map_location="cpu")
    params, state = convert_reference_checkpoint(sd, variant, arch)
    save_checkpoint(out_dir, params, state, metadata={"source": "reference", "variant": variant})
