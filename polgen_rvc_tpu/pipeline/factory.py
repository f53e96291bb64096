"""Builders assembling a VoiceConverter from checkpoints or synthetic weights."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..convert.hubert_ckpt import convert_hubert_state, load_hubert_checkpoint
from ..convert.rmvpe_ckpt import convert_rmvpe_state, load_rmvpe_checkpoint
from ..convert.rvc_ckpt import build_config, convert_synthesizer_state, load_rvc_checkpoint
from ..convert.synthetic import make_hubert_state, make_rmvpe_state, make_rvc_checkpoint
from ..retrieval.topk import load_index_bank
from .config import EngineConfig
from .engine import VoiceConverter


def build_converter(
    rvc_path: str,
    hubert_path: str,
    rmvpe_path: Optional[str] = None,
    index_path: Optional[str] = None,
    *,
    crepe_path: Optional[str] = None,
    fcpe_path: Optional[str] = None,
    engine: EngineConfig = EngineConfig(),
    mesh=None,
) -> VoiceConverter:
    """Load real checkpoints (one-time host conversion) into an engine.

    If the model directory holds an orbax export (convert.export), weights
    load from it directly — no torch required at serving time."""
    from ..convert.export import has_export, load_exported

    model_dir = os.path.dirname(os.path.abspath(rvc_path))
    if has_export(model_dir):
        synth_cfg, synth_params, hub_cfg, hub_params, rmvpe_exp = (
            load_exported(model_dir)
        )
        rmvpe_params = rmvpe_exp or (
            load_rmvpe_checkpoint(rmvpe_path) if rmvpe_path else None
        )
    else:
        synth_cfg, synth_params, _ = load_rvc_checkpoint(rvc_path)
        hub_cfg, hub_params = load_hubert_checkpoint(hubert_path)
        rmvpe_params = load_rmvpe_checkpoint(rmvpe_path) if rmvpe_path else None
    bank = load_index_bank(index_path) if index_path else None
    crepe_params = None
    if crepe_path:
        from ..convert.crepe_ckpt import load_crepe_checkpoint

        crepe_params = load_crepe_checkpoint(crepe_path)
    fcpe_cfg = fcpe_params = None
    if fcpe_path:
        from ..convert.fcpe_ckpt import load_fcpe_checkpoint

        fcpe_cfg, fcpe_params = load_fcpe_checkpoint(fcpe_path)
    return VoiceConverter(
        synth_cfg=synth_cfg, synth_params=synth_params,
        hubert_cfg=hub_cfg, hubert_params=hub_params,
        rmvpe_params=rmvpe_params, index_bank=bank,
        crepe_params=crepe_params,
        fcpe_params=fcpe_params, fcpe_cfg=fcpe_cfg,
        engine=engine, mesh=mesh,
    )


def build_synthetic_converter(
    *,
    tiny: bool = True,
    sr: int = 48000,
    index_vectors: int = 0,
    engine: EngineConfig = EngineConfig(),
    mesh=None,
    seed: int = 0,
    use_f0: bool = True,
    with_crepe: bool = False,
    with_fcpe: bool = False,
) -> VoiceConverter:
    """Assemble a converter from fabricated weights (tests, benchmarks,
    compile checks — no real checkpoints exist in this environment)."""
    cpt = make_rvc_checkpoint(sr=sr, tiny=tiny, seed=seed, use_f0=use_f0)
    synth_cfg = build_config(cpt["config"], use_f0=use_f0, version="v2")
    synth_params = convert_synthesizer_state(cpt["weight"], synth_cfg)
    hub_cfg, hub_sd = make_hubert_state(tiny=tiny, seed=seed + 1)
    if hub_cfg.embed_dim != synth_cfg.input_dim:
        rng = np.random.default_rng(seed + 2)
        synth_params["enc_p"]["emb_phone"]["w"] = (
            rng.standard_normal((hub_cfg.embed_dim, synth_cfg.hidden_channels))
            / np.sqrt(hub_cfg.embed_dim)
        ).astype(np.float32)
    bank = None
    if index_vectors:
        rng = np.random.default_rng(seed + 3)
        bank = (rng.standard_normal((index_vectors, hub_cfg.embed_dim)) * 0.5).astype(
            np.float32
        )
    crepe_params = None
    if with_crepe:
        from ..convert.crepe_ckpt import convert_crepe_state, make_crepe_state

        crepe_params = convert_crepe_state(make_crepe_state(seed=seed + 5))
    fcpe_cfg = fcpe_params = None
    if with_fcpe:
        from ..convert.fcpe_ckpt import convert_fcpe_state, make_fcpe_state

        fcpe_cfg, fcpe_sd = make_fcpe_state(tiny=tiny, seed=seed + 6)
        fcpe_params = convert_fcpe_state(fcpe_sd, fcpe_cfg)
    return VoiceConverter(
        synth_cfg=synth_cfg, synth_params=synth_params,
        hubert_cfg=hub_cfg, hubert_params=convert_hubert_state(hub_sd, hub_cfg),
        rmvpe_params=(convert_rmvpe_state(make_rmvpe_state(seed=seed + 4))
                      if use_f0 else None),
        index_bank=bank, engine=engine, mesh=mesh,
        crepe_params=crepe_params,
        fcpe_params=fcpe_params, fcpe_cfg=fcpe_cfg,
    )
