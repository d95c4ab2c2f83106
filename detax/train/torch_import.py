"""PyTorch → JAX weight importer for the ResNet backbone.

Implements the reference's torchvision-zoo import recipe
(``backbones/res_net.py:116-148``: load hub resnet, remap stem keys
``conv1→stem.conv`` / ``bn1→stem.bn``, non-strict load) as a pure
state-dict→pytree converter:

- ``conv1/bn1``            → ``stem/stem_conv``
- ``layer{i}.{j}.conv{k}`` → ``res{i}/block{j}/conv{k}/conv``
- ``layer{i}.{j}.bn{k}``   → ``res{i}/block{j}/conv{k}/<norm>``
- ``layer{i}.{j}.downsample.{0,1}`` → ``res{i}/block{j}/downsample``
- ``fc``                   → ``fc``

Layout conversion is the parity-critical part (SURVEY.md §7.3 "weight import
fidelity"): conv kernels OIHW→HWIO, linear weights (out,in)→(in,out). BN maps
either into ``frozen_bn`` params (detection fine-tune) or into
scale/bias + ``batch_stats`` (trainable BN).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)  # OIHW → HWIO


def _set(tree: Dict, path, value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def import_resnet(
    state_dict: Mapping[str, Any],
    norm: str = "frozen_bn",
) -> Dict[str, Any]:
    """Convert a torchvision-style ResNet state dict to detax ``ResNet``
    variables: ``{"params": ..., ["batch_stats": ...]}``.

    ``norm`` must match the ``ResNetConf.norm`` the model was built with.
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def put_bn(module_path, prefix):
        w = _np(state_dict[prefix + ".weight"])
        b = _np(state_dict[prefix + ".bias"])
        mean = _np(state_dict[prefix + ".running_mean"])
        var = _np(state_dict[prefix + ".running_var"])
        if norm == "frozen_bn":
            _set(params, module_path + ("frozen_bn",), {
                "weight": w, "bias": b, "running_mean": mean, "running_var": var,
            })
        elif norm == "bn":
            _set(params, module_path + ("BatchNorm_0",), {"scale": w, "bias": b})
            _set(batch_stats, module_path + ("BatchNorm_0",), {"mean": mean, "var": var})
        else:
            raise ValueError(f"cannot import BN stats into norm='{norm}'")

    # stem (reference remap conv1→stem.conv, bn1→stem.bn, res_net.py:129-140);
    # detax stores the stem kernel directly (space-to-depth reparam happens
    # at apply time from the same canonical (7,7,C,O) parameter)
    _set(params, ("stem",), {"stem_conv_kernel": _conv_kernel(state_dict["conv1.weight"])})
    put_bn(("stem",), "bn1")

    layer_re = re.compile(r"^layer(\d+)\.(\d+)\.(conv|bn)(\d+)\.")
    down_re = re.compile(r"^layer(\d+)\.(\d+)\.downsample\.(0|1)\.")
    seen = set()
    for key in state_dict:
        m = layer_re.match(key)
        if m:
            stage, block, kind, idx = int(m.group(1)), int(m.group(2)), m.group(3), int(m.group(4))
            base = (f"res{stage}", f"block{block}", f"conv{idx}")
            tag = base + (kind,)
            if tag in seen:
                continue
            seen.add(tag)
            prefix = f"layer{stage}.{block}.{kind}{idx}"
            if kind == "conv":
                _set(params, base + ("conv",), {"kernel": _conv_kernel(state_dict[prefix + ".weight"])})
            else:
                put_bn(base, prefix)
            continue
        m = down_re.match(key)
        if m:
            stage, block, which = int(m.group(1)), int(m.group(2)), m.group(3)
            base = (f"res{stage}", f"block{block}", "downsample")
            tag = base + (which,)
            if tag in seen:
                continue
            seen.add(tag)
            prefix = f"layer{stage}.{block}.downsample.{which}"
            if which == "0":
                _set(params, base + ("conv",), {"kernel": _conv_kernel(state_dict[prefix + ".weight"])})
            else:
                put_bn(base, prefix)

    if "fc.weight" in state_dict:
        _set(params, ("fc",), {
            "kernel": _np(state_dict["fc.weight"]).T,
            "bias": _np(state_dict["fc.bias"]),
        })

    out: Dict[str, Any] = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def import_resnet_into_fpn(state_dict: Mapping[str, Any], norm: str = "frozen_bn") -> Dict[str, Any]:
    """Same, nested under the FPN's ``bottom_up`` scope."""
    inner = import_resnet(state_dict, norm)
    out = {"params": {"bottom_up": inner["params"]}}
    if "batch_stats" in inner:
        out["batch_stats"] = {"bottom_up": inner["batch_stats"]}
    return out


def merge_pretrained(variables: Dict[str, Any], pretrained: Dict[str, Any]) -> Dict[str, Any]:
    """Non-strict merge (the reference's 'pre-trained' load mode,
    ``models/base.py:66-76``): overwrite matching subtrees of freshly-init
    variables with imported values, keep everything else."""

    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if k in out and isinstance(out[k], dict) and isinstance(v, dict):
                out[k] = merge(out[k], v)
            else:
                assert k in out, f"imported key {k} not found in model variables"
                if not isinstance(v, dict):
                    assert np.shape(out[k]) == np.shape(v), (
                        f"shape mismatch for {k}: {np.shape(out[k])} vs {np.shape(v)}"
                    )
                out[k] = v
        return out

    return merge(variables, pretrained)
