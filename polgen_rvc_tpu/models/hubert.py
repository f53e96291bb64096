"""HuBERT-base content encoder as pure JAX functions.

Replaces the fairseq runtime dependency (reference loads the torch ensemble
at /root/reference/rvc/infer/infer.py:67-74 and calls
model.extract_features(..., output_layer=9|12) at pipeline.py:228-236).

Architecture (public wav2vec2/HuBERT-base layout, matching the
hubert_base.pt checkpoint):
  - 7-layer strided conv feature extractor (512 ch, strides 5*2*2*2*2*2*2=320,
    receptive field 400), first layer group-normed, GELU activations, no bias
  - LayerNorm + Linear(512 -> 768) post-projection
  - grouped conv positional embedding (k=128, groups=16) + residual, then
    encoder LayerNorm (post-LN variant), 12 transformer layers (12 heads,
    FFN 3072, post-LN)
  - extract(output_layer=N) returns the output of layer N (1-indexed)
  - v1 models apply final_proj (768 -> 256) afterwards (pipeline.py:236)

TP note: attention heads and FFN columns shard naturally over a "model" mesh
axis; see polgen_rvc_tpu.parallel.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.conv import conv1d


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    conv_layers: tuple = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
                          (512, 3, 2), (512, 2, 2), (512, 2, 2))
    embed_dim: int = 768
    ffn_dim: int = 3072
    n_heads: int = 12
    n_layers: int = 12
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    final_dim: int = 256  # final_proj output (used by v1 models)

    def num_frames(self, samples: int) -> int:
        t = samples
        for _, k, s in self.conv_layers:
            t = (t - k) // s + 1
        return t


def _layer_norm(x, gamma, beta, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma.astype(x.dtype) + beta.astype(x.dtype)


def _group_norm(x, gamma, beta, groups: int, eps=1e-5, time_valid=None):
    """GroupNorm over (B, C, T) with C split into groups.

    time_valid (B,) restricts the statistics to the first time_valid[b]
    positions: the reference runs HuBERT on EXACT-length audio, so its
    GroupNorm never sees bucket padding — without the restriction the
    stats (and thus every valid frame) would depend on how much zero
    tail the chunk's bucket carries."""
    b, c, t = x.shape
    xg = x.reshape(b, groups, c // groups, t)
    if time_valid is None:
        mean = jnp.mean(xg, axis=(2, 3), keepdims=True)
        var = jnp.var(xg, axis=(2, 3), keepdims=True)
    else:
        tmask = (
            jnp.arange(t)[None, :] < time_valid[:, None]
        ).astype(x.dtype)[:, None, None, :]  # (B, 1, 1, T)
        n = jnp.maximum(
            time_valid.astype(x.dtype), 1.0
        )[:, None, None, None] * (c // groups)
        xm = xg * tmask
        mean = jnp.sum(xm, axis=(2, 3), keepdims=True) / n
        var = jnp.sum(
            jnp.square(xg - mean) * tmask, axis=(2, 3), keepdims=True
        ) / n
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(b, c, t)
    return x * gamma.astype(x.dtype)[None, :, None] + beta.astype(x.dtype)[None, :, None]


def feature_extractor(params, cfg: HubertConfig, wav, valid_samples=None):
    """(B, T_samples) -> (B, T_frames, 512).

    valid_samples (B,): real sample count per row; restricts the layer-0
    GroupNorm statistics to the non-padded region (see _group_norm)."""
    x = wav[:, None, :]  # (B, 1, T)
    for i, (dim, k, s) in enumerate(cfg.conv_layers):
        x = conv1d(x, params["convs"][i]["w"], None, stride=s)
        if i == 0:
            gn = params["convs"][i]["gn"]
            tv = None
            if valid_samples is not None:
                tv = jnp.maximum((valid_samples - k) // s + 1, 1)
            x = _group_norm(
                x, gn["gamma"], gn["beta"], groups=dim, time_valid=tv
            )
        x = jax.nn.gelu(x, approximate=False)
    return x.swapaxes(1, 2)  # (B, T', 512)


def _self_attention(x, p, n_heads: int, mask=None):
    """Standard MHA on (B, T, C); fairseq MultiheadAttention semantics.

    (A stock-pallas flash variant was measured SLOWER than this XLA path
    at chunk lengths (~2200 frames, 12 heads) on v5e and numerically
    off through the 12-layer stack — the materialized-score path stays.)"""
    b, t, c = x.shape
    dk = c // n_heads
    q = x @ p["q"]["w"].astype(x.dtype) + p["q"]["b"].astype(x.dtype)
    k = x @ p["k"]["w"].astype(x.dtype) + p["k"]["b"].astype(x.dtype)
    v = x @ p["v"]["w"].astype(x.dtype) + p["v"]["b"].astype(x.dtype)

    def heads(y):
        return y.reshape(b, t, n_heads, dk).swapaxes(1, 2)  # (B, H, T, dk)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhtd,bhsd->bhts", q / math.sqrt(dk), k)
    if mask is not None:
        scores = jnp.where(
            mask[:, None, None, :], jnp.asarray(-1e4, scores.dtype), scores
        )
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", w, v)
    out = out.swapaxes(1, 2).reshape(b, t, c)
    return out @ p["o"]["w"].astype(x.dtype) + p["o"]["b"].astype(x.dtype)


def hubert_extract(
    params,
    cfg: HubertConfig,
    wav,
    *,
    output_layer: Optional[int] = None,
    final_proj: bool = False,
    padding_mask=None,
    compute_dtype=jnp.float32,
    valid_samples=None,
):
    """Content features: (B, T_samples) -> (B, T_frames, 768 or 256).

    output_layer/final_proj mirror the v1/v2 dispatch at reference
    pipeline.py:228-236 (v1: layer 9 + final_proj; v2: layer 12).
    padding_mask: (B, T_frames) bool, True = padded frame.
    valid_samples: (B,) real sample counts (bucket-invariant GroupNorm).
    """
    if output_layer is None:
        output_layer = cfg.n_layers
    wav = wav.astype(compute_dtype)
    feats = feature_extractor(
        params["feature_extractor"], cfg, wav, valid_samples=valid_samples
    )
    feats = _layer_norm(feats, params["layer_norm"]["gamma"], params["layer_norm"]["beta"])
    x = feats @ params["post_extract_proj"]["w"].astype(compute_dtype)
    x = x + params["post_extract_proj"]["b"].astype(compute_dtype)

    if padding_mask is not None:
        x = jnp.where(padding_mask[:, :, None], 0.0, x)

    # positional conv (grouped, weight-norm folded) + SamePad trim for even k
    pc = params["encoder"]["pos_conv"]
    xt = x.swapaxes(1, 2)
    pos = conv1d(
        xt, pc["w"], pc["b"],
        padding=cfg.pos_conv_kernel // 2, groups=cfg.pos_conv_groups,
    )
    if cfg.pos_conv_kernel % 2 == 0:
        pos = pos[:, :, :-1]
    pos = jax.nn.gelu(pos, approximate=False).swapaxes(1, 2)
    x = x + pos

    # post-LN encoder: LN before the layer stack
    enc = params["encoder"]
    x = _layer_norm(x, enc["layer_norm"]["gamma"], enc["layer_norm"]["beta"])

    for li in range(output_layer):
        lp = enc["layers"][li]
        res = x
        y = _self_attention(x, lp["attn"], cfg.n_heads, mask=padding_mask)
        x = _layer_norm(res + y, lp["norm1"]["gamma"], lp["norm1"]["beta"])
        res = x
        y = jax.nn.gelu(x @ lp["fc1"]["w"].astype(x.dtype) + lp["fc1"]["b"].astype(x.dtype),
                        approximate=False)
        y = y @ lp["fc2"]["w"].astype(x.dtype) + lp["fc2"]["b"].astype(x.dtype)
        x = _layer_norm(res + y, lp["norm2"]["gamma"], lp["norm2"]["beta"])

    if final_proj:
        fp = params["final_proj"]
        x = x @ fp["w"].astype(x.dtype) + fp["b"].astype(x.dtype)
    return x
