"""fairseq hubert_base.pt -> (HubertConfig, param pytree).

Replaces fairseq's checkpoint_utils.load_model_ensemble_and_task
(reference infer.py:67-74) with a direct state-dict conversion — no fairseq
at runtime. The .pt pickle embeds fairseq/omegaconf config objects; a
tolerant unpickler substitutes stubs for any class we don't have, since only
the tensor state dict matters.
"""

from __future__ import annotations

import io
import pickle

import numpy as np

from ..models.hubert import HubertConfig
from .common import fold_weight_norm, linear_params, norm_params, to_numpy


class _Stub:
    """Placeholder for unpicklable config classes inside the checkpoint."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return _Stub


def _tolerant_torch_load(path: str):
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=False,
                          pickle_module=_TolerantPickleModule)
    except Exception:
        return torch.load(path, map_location="cpu", weights_only=True)


class _TolerantPickleModule:
    Unpickler = _TolerantUnpickler
    load = staticmethod(pickle.load)


_STANDARD_STRIDES = (5, 2, 2, 2, 2, 2, 2)


def infer_hubert_config(sd: dict) -> HubertConfig:
    """Derive the architecture from state-dict shapes.

    Strides are not serialized; the standard wav2vec2/HuBERT stride schedule
    (5,2,2,2,2,2,2 -> total 320) is assumed, which holds for every public
    HuBERT/contentvec embedder the reference installs
    (tabs/install/install_huberts.py:12-19)."""
    n_conv = 0
    while f"feature_extractor.conv_layers.{n_conv}.0.weight" in sd:
        n_conv += 1
    convs = []
    for i in range(n_conv):
        w = sd[f"feature_extractor.conv_layers.{i}.0.weight"]
        dim, _, k = w.shape
        stride = _STANDARD_STRIDES[i] if i < len(_STANDARD_STRIDES) else 2
        convs.append((int(dim), int(k), int(stride)))
    n_layers = 0
    while f"encoder.layers.{n_layers}.self_attn.q_proj.weight" in sd:
        n_layers += 1
    embed_dim = int(sd["post_extract_proj.weight"].shape[0])
    n_heads = next(h for h in (12, 8, 6, 4, 2, 1) if embed_dim % h == 0)
    if "encoder.pos_conv.0.weight_v" in sd:
        pv = sd["encoder.pos_conv.0.weight_v"]
    else:
        pv = sd["encoder.pos_conv.0.parametrizations.weight.original1"]
    pos_kernel = int(pv.shape[-1])
    pos_groups = embed_dim // int(pv.shape[1])
    final_dim = (
        int(sd["final_proj.weight"].shape[0]) if "final_proj.weight" in sd else 256
    )
    ffn_dim = int(sd["encoder.layers.0.fc1.weight"].shape[0])
    return HubertConfig(
        conv_layers=tuple(convs), embed_dim=embed_dim, ffn_dim=ffn_dim,
        n_heads=n_heads, n_layers=n_layers,
        pos_conv_kernel=pos_kernel, pos_conv_groups=pos_groups,
        final_dim=final_dim,
    )


def convert_hubert_state(sd: dict, cfg: HubertConfig | None = None):
    """fairseq HubertModel state_dict -> param pytree for models.hubert."""
    cfg = cfg or infer_hubert_config(sd)
    convs = []
    for i in range(len(cfg.conv_layers)):
        entry = {"w": to_numpy(sd[f"feature_extractor.conv_layers.{i}.0.weight"]).astype(np.float32)}
        if i == 0:
            entry["gn"] = {
                "gamma": to_numpy(sd["feature_extractor.conv_layers.0.2.weight"]).astype(np.float32),
                "beta": to_numpy(sd["feature_extractor.conv_layers.0.2.bias"]).astype(np.float32),
            }
        convs.append(entry)

    layers = []
    for i in range(cfg.n_layers):
        p = f"encoder.layers.{i}"
        layers.append(
            {
                "attn": {
                    "q": linear_params(sd, f"{p}.self_attn.q_proj"),
                    "k": linear_params(sd, f"{p}.self_attn.k_proj"),
                    "v": linear_params(sd, f"{p}.self_attn.v_proj"),
                    "o": linear_params(sd, f"{p}.self_attn.out_proj"),
                },
                "norm1": norm_params(sd, f"{p}.self_attn_layer_norm"),
                "fc1": linear_params(sd, f"{p}.fc1"),
                "fc2": linear_params(sd, f"{p}.fc2"),
                "norm2": norm_params(sd, f"{p}.final_layer_norm"),
            }
        )

    params = {
        "feature_extractor": {"convs": convs},
        "layer_norm": norm_params(sd, "layer_norm"),
        "post_extract_proj": linear_params(sd, "post_extract_proj"),
        "encoder": {
            "pos_conv": {
                # fairseq weight-norms the positional conv along dim=2
                "w": fold_weight_norm(sd, "encoder.pos_conv.0", dim=2),
                "b": to_numpy(sd["encoder.pos_conv.0.bias"]).astype(np.float32),
            },
            "layer_norm": norm_params(sd, "encoder.layer_norm"),
            "layers": layers,
        },
    }
    if "final_proj.weight" in sd:
        params["final_proj"] = linear_params(sd, "final_proj")
    return params


def load_hubert_checkpoint(path: str):
    """hubert_base.pt -> (HubertConfig, params). Architecture inferred from
    the state dict so alternate embedders (contentvec etc.) load too."""
    ckpt = _tolerant_torch_load(path)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    cfg = infer_hubert_config(sd)
    return cfg, convert_hubert_state(sd, cfg)
