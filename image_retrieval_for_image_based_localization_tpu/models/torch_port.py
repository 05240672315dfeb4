"""Port PyTorch (torchvision-style) checkpoints into this framework.

The reference loads torchvision ImageNet trunks and saves cirtorch-style
checkpoints (`{state_dict, meta}` — SURVEY.md §3.2). There is no torchvision
in this environment (SURVEY.md §4), so porting happens from raw state_dicts:

  * conv kernels: OIHW → HWIO transpose;
  * BatchNorm: weight/bias → scale/bias params; running_mean/var → batch_stats;
  * Dense (whitening FC): [out, in] → [in, out] transpose;
  * GeM p, NetVLAD centroids/conv map to head params.

Accepts either plain tensors, numpy arrays, or a torch ``state_dict`` (any
object with ``.numpy()`` leaves). Returns flax ``{'params': ..., 'batch_stats': ...}``
variables for ``RetrievalNet``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from image_retrieval_for_image_based_localization_tpu.models.resnet import RESNET_SPECS
from image_retrieval_for_image_based_localization_tpu.models.vgg import VGG16_CFG


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach()
    if hasattr(t, "numpy"):
        t = t.numpy()
    return np.asarray(t)


def _conv(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _convbn(sd: Mapping[str, Any], conv_key: str, bn_key: str) -> Tuple[Dict, Dict]:
    params = {
        "conv": {"kernel": _conv(sd[f"{conv_key}.weight"])},
        "bn": {"scale": _np(sd[f"{bn_key}.weight"]), "bias": _np(sd[f"{bn_key}.bias"])},
    }
    stats = {
        "bn": {
            "mean": _np(sd[f"{bn_key}.running_mean"]),
            "var": _np(sd[f"{bn_key}.running_var"]),
        }
    }
    return params, stats


def port_resnet_trunk(sd: Mapping[str, Any], arch: str, prefix: str = "") -> Dict:
    """torchvision ResNet state_dict (optionally under ``prefix``) → trunk vars."""
    g = lambda k: f"{prefix}{k}"  # noqa: E731
    block_kind, stages, _ = RESNET_SPECS[arch]
    n_convs = 2 if block_kind == "basic" else 3

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["stem"], stats["stem"] = _convbn(sd, g("conv1"), g("bn1"))

    for stage_i, depth in enumerate(stages):
        for block_i in range(depth):
            name = f"layer{stage_i + 1}_{block_i}"
            tname = g(f"layer{stage_i + 1}.{block_i}")
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                bp[f"cb{ci}"], bs[f"cb{ci}"] = _convbn(
                    sd, f"{tname}.conv{ci}", f"{tname}.bn{ci}"
                )
            if f"{tname}.downsample.0.weight" in sd:
                bp["down"], bs["down"] = _convbn(
                    sd, f"{tname}.downsample.0", f"{tname}.downsample.1"
                )
            params[name] = bp
            stats[name] = bs
    return {"params": params, "batch_stats": stats}


def port_vgg_trunk(sd: Mapping[str, Any], prefix: str = "features.") -> Dict:
    """torchvision VGG-16 ``features.*`` state_dict → trunk vars (no BN)."""
    params: Dict[str, Any] = {}
    torch_idx = 0
    conv_i = 0
    for v in VGG16_CFG:
        if v == "M":
            torch_idx += 1  # MaxPool2d layer
        else:
            params[f"conv{conv_i}"] = {
                "kernel": _conv(sd[f"{prefix}{torch_idx}.weight"]),
                "bias": _np(sd[f"{prefix}{torch_idx}.bias"]),
            }
            conv_i += 1
            torch_idx += 2  # Conv2d + ReLU
    return {"params": params, "batch_stats": {}}


def port_alexnet_trunk(sd: Mapping[str, Any], prefix: str = "features.") -> Dict:
    """torchvision AlexNet ``features.*`` state_dict → trunk vars."""
    # conv layers sit at Sequential indices 0, 3, 6, 8, 10
    params: Dict[str, Any] = {}
    for conv_i, t_idx in enumerate((0, 3, 6, 8, 10)):
        params[f"conv{conv_i}"] = {
            "kernel": _conv(sd[f"{prefix}{t_idx}.weight"]),
            "bias": _np(sd[f"{prefix}{t_idx}.bias"]),
        }
    return {"params": params, "batch_stats": {}}


def port_squeezenet_trunk(sd: Mapping[str, Any], prefix: str = "features.") -> Dict:
    """torchvision SqueezeNet 1.1 ``features.*`` state_dict → trunk vars."""
    def conv(key):
        return {"kernel": _conv(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}

    params: Dict[str, Any] = {
        "conv0": conv(f"{prefix}0")
    }
    # fire modules at Sequential indices 3,4,6,7,9,10,11,12
    for fire_i, t_idx in enumerate((3, 4, 6, 7, 9, 10, 11, 12)):
        params[f"fire{fire_i}"] = {
            "squeeze": conv(f"{prefix}{t_idx}.squeeze"),
            "expand1": conv(f"{prefix}{t_idx}.expand1x1"),
            "expand3": conv(f"{prefix}{t_idx}.expand3x3"),
        }
    return {"params": params, "batch_stats": {}}


def port_densenet_trunk(sd: Mapping[str, Any], arch: str, prefix: str = "features.") -> Dict:
    """torchvision DenseNet ``features.*`` state_dict → trunk vars."""
    from image_retrieval_for_image_based_localization_tpu.models.densenet import (
        DENSENET_SPECS,
    )

    def bn(key):
        return (
            {"bn": {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}},
            {"bn": {"mean": _np(sd[f"{key}.running_mean"]),
                    "var": _np(sd[f"{key}.running_var"])}},
        )

    params: Dict[str, Any] = {"conv0": {"kernel": _conv(sd[f"{prefix}conv0.weight"])}}
    stats: Dict[str, Any] = {}
    params["norm0"], stats["norm0"] = bn(f"{prefix}norm0")

    _, blocks, _ = DENSENET_SPECS[arch]
    for bi, n_layers in enumerate(blocks):
        for li in range(n_layers):
            t = f"{prefix}denseblock{bi + 1}.denselayer{li + 1}"
            name = f"block{bi + 1}_layer{li + 1}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            p["norm1"], s["norm1"] = bn(f"{t}.norm1")
            p["conv1"] = {"kernel": _conv(sd[f"{t}.conv1.weight"])}
            p["norm2"], s["norm2"] = bn(f"{t}.norm2")
            p["conv2"] = {"kernel": _conv(sd[f"{t}.conv2.weight"])}
            params[name] = p
            stats[name] = s
        if bi < len(blocks) - 1:
            t = f"{prefix}transition{bi + 1}"
            p, s = {}, {}
            p["norm"], s["norm"] = bn(f"{t}.norm")
            p["conv"] = {"kernel": _conv(sd[f"{t}.conv.weight"])}
            params[f"transition{bi + 1}"] = p
            stats[f"transition{bi + 1}"] = s
    params["norm5"], stats["norm5"] = bn(f"{prefix}norm5")
    return {"params": params, "batch_stats": stats}


# cirtorch builds the trunk as ``nn.Sequential(*children)``, which renames
# the children of archs with NAMED top-level modules to numeric indices
# (resnet: features.0 = conv1, features.4.0.conv1 = layer1.0.conv1; densenet
# likewise). vgg/alexnet/squeezenet use numeric Sequential indices in
# torchvision already, so their cirtorch keys pass through unchanged.
_CIRTORCH_SEQ_NAMES = {
    "resnet": ["conv1", "bn1", "relu", "maxpool",
               "layer1", "layer2", "layer3", "layer4"],
    "densenet": ["conv0", "norm0", "relu0", "pool0",
                 "denseblock1", "transition1", "denseblock2", "transition2",
                 "denseblock3", "transition3", "denseblock4", "norm5"],
}


def cirtorch_to_torchvision_keys(
    sd: Mapping[str, Any], arch: str, prefix: str = "features."
) -> Mapping[str, Any]:
    """Translate cirtorch's numeric ``features.N.*`` trunk keys back to
    torchvision attribute names (``features.conv1.*`` etc.) for archs whose
    top-level modules are named. No-op when keys already look torchvision
    (or the arch's torchvision layout is numeric anyway)."""
    family = "resnet" if arch.startswith("resnet") else (
        "densenet" if arch.startswith("densenet") else None
    )
    if family is None:
        return sd
    names = _CIRTORCH_SEQ_NAMES[family]
    if not any(k.startswith(f"{prefix}0.") or k == f"{prefix}0.weight" for k in sd):
        return sd  # already torchvision-named
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            rest = k[len(prefix):]
            head, _, tail = rest.partition(".")
            if head.isdigit() and int(head) < len(names):
                k = f"{prefix}{names[int(head)]}" + ("." + tail if tail else "")
        out[k] = v
    return out


def port_retrieval_net(
    sd: Mapping[str, Any],
    arch: str,
    trunk_prefix: str = "features.",
    pool_key: str = "pool.p",
    whiten_key: str = "whiten",
    netvlad_prefix: str = "pool.",
) -> Dict:
    """cirtorch-style full-model state_dict → RetrievalNet variables.

    cirtorch saves the trunk under ``features.*``; numeric Sequential
    renaming (resnet/densenet) is translated back to torchvision attribute
    names automatically (``cirtorch_to_torchvision_keys``); GeM's p lives
    under ``pool.p``; the whitening FC under ``whiten.*``.
    """
    sd = cirtorch_to_torchvision_keys(sd, arch, prefix=trunk_prefix)
    if arch.startswith("resnet"):
        trunk = port_resnet_trunk(sd, arch, prefix=trunk_prefix)
    elif arch.startswith("vgg"):
        trunk = port_vgg_trunk(sd, prefix=trunk_prefix)
    elif arch.startswith("alexnet"):
        trunk = port_alexnet_trunk(sd, prefix=trunk_prefix)
    elif arch.startswith("squeezenet"):
        trunk = port_squeezenet_trunk(sd, prefix=trunk_prefix)
    elif arch.startswith("densenet"):
        trunk = port_densenet_trunk(sd, arch, prefix=trunk_prefix)
    else:
        raise ValueError(arch)

    params: Dict[str, Any] = {"trunk": trunk["params"]}
    variables: Dict[str, Any] = {"params": params}
    if trunk["batch_stats"]:
        variables["batch_stats"] = {"trunk": trunk["batch_stats"]}

    if pool_key in sd:
        p = _np(sd[pool_key])
        # scalar GeM stores p as [1]; GeMmp stores one exponent per
        # channel [C] — keep the vector shape for the gemmp head
        params["gem_p"] = p.reshape(()) if p.size == 1 else p.reshape(-1)
    if f"{whiten_key}.weight" in sd:
        params["whiten"] = {
            "kernel": _np(sd[f"{whiten_key}.weight"]).T,
            "bias": _np(sd[f"{whiten_key}.bias"]),
        }
    if f"{netvlad_prefix}centroids" in sd:
        params["centroids"] = _np(sd[f"{netvlad_prefix}centroids"])
        # NetVLAD's 1x1 conv [K, C, 1, 1] -> assign_w [C, K]
        w = _np(sd[f"{netvlad_prefix}conv.weight"])
        params["assign_w"] = w.reshape(w.shape[0], w.shape[1]).T
        bkey = f"{netvlad_prefix}conv.bias"
        if bkey in sd:
            params["assign_b"] = _np(sd[bkey])
    return variables
