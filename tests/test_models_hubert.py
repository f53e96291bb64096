"""HuBERT parity against the installed transformers HubertModel.

The fairseq-layout synthetic state dict is mapped onto an equivalent HF
HubertModel (same architecture family); outputs must match, validating the
conv extractor, positional conv, post-LN encoder stack, and layer indexing.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from polgen_rvc_tpu.convert.hubert_ckpt import convert_hubert_state
from polgen_rvc_tpu.convert.synthetic import make_hubert_state
from polgen_rvc_tpu.models.hubert import hubert_extract


def _fairseq_to_hf(sd, cfg):
    out = {}
    for i in range(len(cfg.conv_layers)):
        out[f"feature_extractor.conv_layers.{i}.conv.weight"] = sd[
            f"feature_extractor.conv_layers.{i}.0.weight"
        ]
        if i == 0:
            out["feature_extractor.conv_layers.0.layer_norm.weight"] = sd[
                "feature_extractor.conv_layers.0.2.weight"
            ]
            out["feature_extractor.conv_layers.0.layer_norm.bias"] = sd[
                "feature_extractor.conv_layers.0.2.bias"
            ]
    out["feature_projection.layer_norm.weight"] = sd["layer_norm.weight"]
    out["feature_projection.layer_norm.bias"] = sd["layer_norm.bias"]
    out["feature_projection.projection.weight"] = sd["post_extract_proj.weight"]
    out["feature_projection.projection.bias"] = sd["post_extract_proj.bias"]
    out["encoder.pos_conv_embed.conv.weight_g"] = sd["encoder.pos_conv.0.weight_g"]
    out["encoder.pos_conv_embed.conv.weight_v"] = sd["encoder.pos_conv.0.weight_v"]
    out["encoder.pos_conv_embed.conv.bias"] = sd["encoder.pos_conv.0.bias"]
    out["encoder.layer_norm.weight"] = sd["encoder.layer_norm.weight"]
    out["encoder.layer_norm.bias"] = sd["encoder.layer_norm.bias"]
    for i in range(cfg.n_layers):
        f, h = f"encoder.layers.{i}", f"encoder.layers.{i}"
        for a, b in [
            ("self_attn.q_proj", "attention.q_proj"),
            ("self_attn.k_proj", "attention.k_proj"),
            ("self_attn.v_proj", "attention.v_proj"),
            ("self_attn.out_proj", "attention.out_proj"),
            ("self_attn_layer_norm", "layer_norm"),
            ("fc1", "feed_forward.intermediate_dense"),
            ("fc2", "feed_forward.output_dense"),
            ("final_layer_norm", "final_layer_norm"),
        ]:
            out[f"{h}.{b}.weight"] = sd[f"{f}.{a}.weight"]
            out[f"{h}.{b}.bias"] = sd[f"{f}.{a}.bias"]
    return {k: torch.from_numpy(np.asarray(v)) for k, v in out.items()}


@pytest.fixture(scope="module")
def models():
    from transformers import HubertConfig as HFConfig, HubertModel

    cfg, sd = make_hubert_state(tiny=True, seed=0)
    hf_cfg = HFConfig(
        vocab_size=10,
        hidden_size=cfg.embed_dim,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        intermediate_size=cfg.ffn_dim,
        conv_dim=tuple(c[0] for c in cfg.conv_layers),
        conv_kernel=tuple(c[1] for c in cfg.conv_layers),
        conv_stride=tuple(c[2] for c in cfg.conv_layers),
        num_feat_extract_layers=len(cfg.conv_layers),
        num_conv_pos_embeddings=cfg.pos_conv_kernel,
        num_conv_pos_embedding_groups=cfg.pos_conv_groups,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        feat_extract_activation="gelu",
        conv_bias=False,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        activation_dropout=0.0,
        layerdrop=0.0,
    )
    hf = HubertModel(hf_cfg)
    missing, unexpected = hf.load_state_dict(_fairseq_to_hf(sd, cfg), strict=False)
    # only non-learned/unused buffers may be missing
    assert all("masked_spec_embed" in k or "position_ids" in k for k in missing), missing
    assert not unexpected, unexpected
    hf.eval()
    params = convert_hubert_state(sd, cfg)
    return cfg, sd, hf, params


def test_hubert_matches_transformers(models, rng):
    cfg, sd, hf, params = models
    wav = rng.standard_normal((2, 2000)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
    got = np.asarray(
        hubert_extract(params, cfg, jnp.asarray(wav), output_layer=cfg.n_layers)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_hubert_intermediate_layer(models, rng):
    """output_layer < n_layers must match HF hidden_states indexing."""
    cfg, sd, hf, params = models
    wav = rng.standard_normal((1, 1600)).astype(np.float32)
    with torch.no_grad():
        hs = hf(torch.from_numpy(wav), output_hidden_states=True).hidden_states
    layer = cfg.n_layers - 1
    got = np.asarray(
        hubert_extract(params, cfg, jnp.asarray(wav), output_layer=layer)
    )
    np.testing.assert_allclose(got, hs[layer].numpy(), rtol=1e-3, atol=2e-4)


def test_hubert_frame_count(models):
    cfg, *_ = models
    # conv stack arithmetic
    for samples in (400, 1600, 16000):
        t = samples
        for _, k, s in cfg.conv_layers:
            t = (t - k) // s + 1
        assert cfg.num_frames(samples) == t


def test_hubert_final_proj(models, rng):
    cfg, sd, hf, params = models
    wav = rng.standard_normal((1, 1600)).astype(np.float32)
    base = np.asarray(hubert_extract(params, cfg, jnp.asarray(wav)))
    proj = np.asarray(
        hubert_extract(params, cfg, jnp.asarray(wav), final_proj=True)
    )
    w = sd["final_proj.weight"]
    b = sd["final_proj.bias"]
    np.testing.assert_allclose(proj, base @ w.T + b, rtol=1e-4, atol=1e-5)
