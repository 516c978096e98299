"""Torch `.net` checkpoint interop: reference state dict <-> flax params.

The reference persists weights with `torch.save(network.state_dict())`
(`train_single_task.py:313,320`); checkpoint-format compatibility is part of
the north star (BASELINE.md). This module maps the reference's key grammar
(`networks/networks.py`) onto the flax parameter tree, converting layouts:

    conv  weight [out, in, kh, kw]  <->  kernel [kh, kw, in, out]
    GroupNorm weight/bias           <->  scale/bias
    Sequential res blocks .0/.1/.3/.4/.6/.7 <-> layer{1,2,3}/{conv,norm}

Numerical equivalence of the module semantics (GroupNorm grouping, conv
padding, pixel shuffle, bilinear resize) is covered by tests against torch
ops as oracles.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Tuple

import numpy as np


def _conv_entries(tkey: str, fpath: str) -> List[Tuple[str, str, str]]:
    return [(f"{tkey}.weight", f"{fpath}/kernel", "conv"), (f"{tkey}.bias", f"{fpath}/bias", "copy")]


def _norm_entries(tkey: str, fpath: str) -> List[Tuple[str, str, str]]:
    return [(f"{tkey}.weight", f"{fpath}/scale", "copy"), (f"{tkey}.bias", f"{fpath}/bias", "copy")]


def _convgn(tconv: str, tnorm: str, fprefix: str):
    return _conv_entries(tconv, f"{fprefix}/conv") + _norm_entries(tnorm, f"{fprefix}/norm")


def _seq_res_block(tprefix: str, fprefix: str):
    """torch Sequential(conv, GN, ReLU, conv, GN, ReLU, conv, GN, ReLU)
    indices 0/1, 3/4, 6/7 (`networks/networks.py:133-146`); ResBlock inner
    modules are layer{i}/conv{i},norm{i}."""
    out = []
    for layer, (ci, ni) in enumerate([(0, 1), (3, 4), (6, 7)], start=1):
        out += _conv_entries(f"{tprefix}.{ci}", f"{fprefix}/layer{layer}/conv{layer}")
        out += _norm_entries(f"{tprefix}.{ni}", f"{fprefix}/layer{layer}/norm{layer}")
    return out


def _encoder_entries(tprefix: str, fprefix: str, tiny: bool, add_res: int):
    """TransPoseNetEncoder keys (`networks/networks.py:175-219`)."""
    e = []
    for i in range(1, 5):
        e += _convgn(f"{tprefix}conv{i}", f"{tprefix}norm{i}", f"{fprefix}/stem{i}")
    for blk in (1, 2):
        for i in range(1, 4):
            e += _convgn(
                f"{tprefix}res{blk}_conv{i}", f"{tprefix}res{blk}_norm{i}",
                f"{fprefix}/res{blk}_{i}",
            )
    if not tiny:
        e += _convgn(f"{tprefix}res2_skip", f"{tprefix}res2_skip_norm", f"{fprefix}/res2_skip")
    for k in range(1, add_res + 1):
        e += _seq_res_block(f"{tprefix}enc_add_res_block{k}", f"{fprefix}/add_res{k}")
    return e


def _decoder_entries(tprefix: str, fprefix: str, add_res: int, full_size: bool):
    """TransPoseNetDecoder keys (`networks/networks.py:276-317`)."""
    e = [(f"{tprefix}mean", f"{fprefix}/mean", "copy")]
    for k in range(1, add_res + 1):
        e += _seq_res_block(f"{tprefix}dec_add_res_block{k}", f"{fprefix}/add_res{k}")
    for i in range(1, 4):
        e += _convgn(f"{tprefix}res3_conv{i}", f"{tprefix}res3_norm{i}", f"{fprefix}/res3_{i}")
    e += _convgn(f"{tprefix}fc1", f"{tprefix}fc1_norm", f"{fprefix}/fc1")
    e += _convgn(f"{tprefix}fc2", f"{tprefix}fc2_norm", f"{fprefix}/fc2")
    if full_size:
        e += _convgn(f"{tprefix}duc_upsample.conv", f"{tprefix}duc_upsample.norm", f"{fprefix}/duc/ConvGN_0")
    e += _conv_entries(f"{tprefix}fc3", f"{fprefix}/fc3")
    return e


def transpose_net_key_map(model) -> List[Tuple[str, str, str]]:
    """(torch_key, flax_path, transform) triplets for a TransPoseNet config.

    The reference state dict also contains a top-level `mean` buffer
    duplicating `decoder.mean` (`networks/networks.py:399`); it is consumed
    on import and re-emitted on export.
    """
    entries = [("mean", "decoder/mean", "copy")]
    if model.num_mlr == 0:
        entries += _encoder_entries("encoder.", "encoder", model.tiny, model.enc_add_res_block)
    else:
        for i in range(1, model.num_mlr + 1):
            entries += _encoder_entries(
                f"mlr_encoder_{i}.", f"mlr_encoder_{i}", model.tiny, model.enc_add_res_block
            )
        entries += _norm_entries("mlr_norm", "mlr_norm")
        entries += _seq_res_block("mlr_forward", "mlr_forward")
        entries += _convgn("mlr_skip.0", "mlr_skip.1", "mlr_skip/ConvGN_0")
    entries += _decoder_entries(
        "decoder.", "decoder", model.dec_add_res_block, model.full_size_output
    )
    return entries


def vanilla_net_key_map(model) -> List[Tuple[str, str, str]]:
    """DSAC*-style `Network` keys (`networks/networks.py:43-86`)."""
    names = (
        ["conv1", "conv2", "conv3", "conv4"]
        + [f"res{b}_conv{i}" for b in (1, 2, 3) for i in (1, 2, 3)]
        + (["res2_skip"] if not model.tiny else [])
        + ["fc1", "fc2", "fc3"]
    )
    entries = [("mean", "mean", "copy")]
    for n in names:
        entries += _conv_entries(n, f"{n}")
    return entries


def _key_map_for(model):
    from ..models import TransPoseNet, VanillaNetwork

    if isinstance(model, TransPoseNet):
        return transpose_net_key_map(model)
    if isinstance(model, VanillaNetwork):
        return vanilla_net_key_map(model)
    raise NotImplementedError(type(model))


def _get_path(tree: dict, path: str):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def _set_path(tree: dict, path: str, value):
    parts = path.split("/")
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def torch_state_to_params(state: Dict[str, "np.ndarray"], model) -> dict:
    """Reference state dict (torch tensors or numpy) -> flax params tree."""
    import jax.numpy as jnp

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params: dict = {}
    consumed = set()
    for tkey, fpath, tf in _key_map_for(model):
        if tkey not in state:
            raise KeyError(f"reference checkpoint missing key {tkey}")
        arr = to_np(state[tkey])
        if tf == "conv":
            arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        _set_path(params, fpath, jnp.asarray(arr))
        consumed.add(tkey)
    extra = set(state.keys()) - consumed
    if extra:
        raise KeyError(f"unconsumed reference keys: {sorted(extra)[:8]} ...")
    return params


def params_to_torch_state(params: dict, model) -> "OrderedDict":
    """Flax params tree -> reference-format state dict (torch tensors)."""
    import torch

    out: "OrderedDict" = OrderedDict()
    for tkey, fpath, tf in _key_map_for(model):
        if tkey == "mean" and "mean" not in params:
            # top-level duplicate of decoder.mean for TransPoseNet
            arr = np.asarray(_get_path(params, "decoder/mean"))
        else:
            arr = np.asarray(_get_path(params, fpath))
        if tf == "conv":
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        out[tkey] = torch.from_numpy(np.array(arr, copy=True)).float()
    return out


def load_net(path: str, model) -> dict:
    """Load a reference `.net` file into a flax params tree."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    return torch_state_to_params(state, model)


def save_net(path: str, params: dict, model) -> None:
    """Persist flax params as a reference-compatible `.net` file."""
    import torch

    torch.save(params_to_torch_state(params, model), path)


def extract_submodule(state: Dict, prefix: str) -> Dict:
    """Filter a reference state dict down to one module's keys, keeping the
    prefix (used by the MLR wiring, `utils/learning.py:325-341`)."""
    return {k: v for k, v in state.items() if k.startswith(prefix)}
