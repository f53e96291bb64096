"""One-time conversion export: torch checkpoints -> orbax param trees.

SURVEY §7 calls for a "one-time .pt -> orbax weight converter; no fairseq
at runtime". The engine already converts on load (torch CPU needed once);
this module persists the converted pytrees so production serving starts
without torch installed:

    python -m polgen_rvc_tpu.convert.export models/MyVoice \
        --hubert assets/embedders/hubert_base.pt \
        --rmvpe assets/predictors/rmvpe.pt

writes models/MyVoice/polgen_converted/{synth,hubert,rmvpe}/ plus a
config.json; pipeline.factory.build_converter picks it up automatically.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

EXPORT_DIRNAME = "polgen_converted"


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def export_converted(model_dir: str, hubert_path: str,
                     rmvpe_path: str | None = None,
                     index_path: str | None = None) -> str:
    """Convert + save all params for a voice-model directory."""
    from ..models.hubert import HubertConfig
    from .hubert_ckpt import load_hubert_checkpoint
    from .rmvpe_ckpt import load_rmvpe_checkpoint
    from .rvc_ckpt import load_rvc_checkpoint

    files = os.listdir(model_dir)
    pth = next(os.path.join(model_dir, f) for f in files if f.endswith(".pth"))

    out_dir = os.path.join(model_dir, EXPORT_DIRNAME)
    ckptr = _checkpointer()

    synth_cfg, synth_params, _ = load_rvc_checkpoint(pth)
    ckptr.save(os.path.abspath(os.path.join(out_dir, "synth")), synth_params,
               force=True)
    hub_cfg, hub_params = load_hubert_checkpoint(hubert_path)
    ckptr.save(os.path.abspath(os.path.join(out_dir, "hubert")), hub_params,
               force=True)
    meta = {
        "synth_cfg": dataclasses.asdict(synth_cfg),
        "hubert_cfg": dataclasses.asdict(hub_cfg),
    }
    if rmvpe_path and os.path.exists(rmvpe_path):
        ckptr.save(os.path.abspath(os.path.join(out_dir, "rmvpe")),
                   load_rmvpe_checkpoint(rmvpe_path), force=True)
        meta["has_rmvpe"] = True
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def load_exported(model_dir: str):
    """Load a previously exported directory -> (synth_cfg, synth_params,
    hubert_cfg, hubert_params, rmvpe_params|None). No torch needed."""
    from ..models.hubert import HubertConfig
    from ..models.synthesizer import SynthesizerConfig

    out_dir = os.path.join(model_dir, EXPORT_DIRNAME)
    with open(os.path.join(out_dir, "config.json")) as f:
        meta = json.load(f)

    def _tupleize(d, keys):
        for k in keys:
            if k in d and isinstance(d[k], list):
                d[k] = tuple(
                    tuple(x) if isinstance(x, list) else x for x in d[k]
                )
        return d

    scfg = SynthesizerConfig(**_tupleize(meta["synth_cfg"], [
        "resblock_kernel_sizes", "resblock_dilation_sizes",
        "upsample_rates", "upsample_kernel_sizes"]))
    hcfg = HubertConfig(**_tupleize(meta["hubert_cfg"], ["conv_layers"]))

    ckptr = _checkpointer()
    synth = ckptr.restore(os.path.abspath(os.path.join(out_dir, "synth")))
    hub = ckptr.restore(os.path.abspath(os.path.join(out_dir, "hubert")))
    rmvpe = None
    if meta.get("has_rmvpe"):
        rmvpe = ckptr.restore(os.path.abspath(os.path.join(out_dir, "rmvpe")))
    return scfg, synth, hcfg, hub, rmvpe


def has_export(model_dir: str) -> bool:
    return os.path.exists(
        os.path.join(model_dir, EXPORT_DIRNAME, "config.json")
    )


def main():
    ap = argparse.ArgumentParser(
        description="Export converted (torch-free) weights for a voice model"
    )
    ap.add_argument("model_dir")
    ap.add_argument("--hubert", default=os.path.join(
        os.getcwd(), "assets", "embedders", "hubert_base.pt"))
    ap.add_argument("--rmvpe", default=os.path.join(
        os.getcwd(), "assets", "predictors", "rmvpe.pt"))
    args = ap.parse_args()
    out = export_converted(args.model_dir, args.hubert, args.rmvpe)
    print(f"[+] exported converted weights to {out}")


if __name__ == "__main__":
    main()
