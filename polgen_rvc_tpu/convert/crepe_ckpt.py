"""torchcrepe full-model .pth -> param pytree with BatchNorm folded.

torchcrepe's Crepe module names: conv{1..6}.weight/bias,
conv{1..6}_BN.{weight,bias,running_mean,running_var}, classifier.{weight,bias}.
"""

from __future__ import annotations

import numpy as np

from ..models.crepe import CrepeConfig
from .common import fold_batch_norm_into_conv, to_numpy


def convert_crepe_state(sd: dict, cfg: CrepeConfig = CrepeConfig()) -> dict:
    convs = []
    for i in range(len(cfg.layers)):
        w = to_numpy(sd[f"conv{i + 1}.weight"]).astype(np.float32)
        b = to_numpy(sd[f"conv{i + 1}.bias"]).astype(np.float32)
        # fold BN over the conv (conv here HAS bias: absorb it through BN)
        gamma = to_numpy(sd[f"conv{i + 1}_BN.weight"]).astype(np.float64)
        beta = to_numpy(sd[f"conv{i + 1}_BN.bias"]).astype(np.float64)
        mean = to_numpy(sd[f"conv{i + 1}_BN.running_mean"]).astype(np.float64)
        var = to_numpy(sd[f"conv{i + 1}_BN.running_var"]).astype(np.float64)
        s = gamma / np.sqrt(var + 1e-5)
        w = (w.astype(np.float64) * s.reshape(-1, 1, 1, 1)).astype(np.float32)
        b = ((b.astype(np.float64) - mean) * s + beta).astype(np.float32)
        convs.append({"w": w, "b": b})
    return {
        "convs": convs,
        "classifier": {
            "w": to_numpy(sd["classifier.weight"]).astype(np.float32).T.copy(),
            "b": to_numpy(sd["classifier.bias"]).astype(np.float32),
        },
    }


def load_crepe_checkpoint(path: str, cfg: CrepeConfig = CrepeConfig()) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_crepe_state(sd, cfg)


def make_crepe_state(*, seed: int = 0, cfg: CrepeConfig = CrepeConfig()) -> dict:
    """Synthetic torchcrepe-layout state dict (tests/benchmarks)."""
    rng = np.random.default_rng(seed)
    sd = {}
    in_ch = 1
    for i, (out_ch, k, _, _, _) in enumerate(cfg.layers):
        fan = in_ch * k
        sd[f"conv{i + 1}.weight"] = (
            rng.standard_normal((out_ch, in_ch, k, 1)) / np.sqrt(fan)
        ).astype(np.float32)
        sd[f"conv{i + 1}.bias"] = (rng.standard_normal(out_ch) * 0.02).astype(np.float32)
        sd[f"conv{i + 1}_BN.weight"] = np.ones(out_ch, np.float32)
        sd[f"conv{i + 1}_BN.bias"] = np.zeros(out_ch, np.float32)
        sd[f"conv{i + 1}_BN.running_mean"] = np.zeros(out_ch, np.float32)
        sd[f"conv{i + 1}_BN.running_var"] = np.ones(out_ch, np.float32)
        in_ch = out_ch
    sd["classifier.weight"] = (
        rng.standard_normal((360, cfg.in_features)) / np.sqrt(cfg.in_features)
    ).astype(np.float32)
    sd["classifier.bias"] = np.zeros(360, np.float32)
    return sd
