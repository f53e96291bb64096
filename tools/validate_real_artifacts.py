"""Push-button validation against REAL artifacts + live network.

Everything in this repo is parity-tested on synthetic weights (zero egress
here); this script is the one command to run the moment an environment has
network access. It mirrors the reference CI (reference
.github/workflows/test_cli.yml:33-43,71):

  1. download the CI model set: hubert_base.pt / rmvpe.pt / fcpe.pt
     (Politrees/RVC_resources) + the Victor_Tsoi voice zip + the CI test mp3
  2. install the voice zip through our model manager (zip discovery path)
  3. load every real checkpoint through our converters (real key layouts,
     real fairseq pickle variant)
  4. read the real faiss .index through our first-party reader
  5. run the reference CI's exact rvc_cli conversion on the real mp3
  6. parity vs the torch reference stack with REAL weights where torch can
     load them without fairseq (synthesizer mel gate, RMVPE f0); HuBERT
     torch-side needs fairseq -> attempted, skipped if not installed
  7. one live Edge-TTS synthesis through our stdlib websocket client

Usage:
  python tools/validate_real_artifacts.py [--workdir DIR] [--skip-tts]
                                          [--skip-parity]

Exit code 0 = every attempted step passed; 2 = egress blocked; 1 = failure.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HF = "https://huggingface.co"
PREDICTORS = f"{HF}/Politrees/RVC_resources/resolve/main/predictors"
EMBEDDERS = f"{HF}/Politrees/RVC_resources/resolve/main/embedders"
TSOI_ZIP = f"{HF}/Politrees/Victor_Tsoi/resolve/main/Victor_Tsoi.zip?download=true"
TEST_MP3 = f"{HF}/Politrees/audio_for_test/resolve/main/BritishEnglishUKTest5.mp3"

RESULTS: list[tuple[str, str, str]] = []  # (step, status, detail)


def record(step: str, status: str, detail: str = ""):
    RESULTS.append((step, status, detail))
    print(f"[{status}] {step}" + (f" — {detail}" if detail else ""), flush=True)


def fetch(url: str, dest: str, what: str):
    if os.path.exists(dest) and os.path.getsize(dest) > 0:
        record(f"download {what}", "SKIP", "already present")
        return
    t0 = time.time()
    req = urllib.request.Request(url, headers={"User-Agent": "polgen-rvc-tpu"})
    with urllib.request.urlopen(req, timeout=60) as r, open(dest, "wb") as f:
        shutil.copyfileobj(r, f, length=1 << 20)
    mb = os.path.getsize(dest) / 1e6
    record(f"download {what}", "PASS", f"{mb:.1f} MB in {time.time()-t0:.0f}s")


def probe_egress() -> bool:
    try:
        req = urllib.request.Request(HF, method="HEAD",
                                     headers={"User-Agent": "polgen-rvc-tpu"})
        urllib.request.urlopen(req, timeout=10)
        return True
    except Exception as e:
        print(f"EGRESS BLOCKED: {type(e).__name__}: {e}", flush=True)
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/polgen_real_validation")
    ap.add_argument("--skip-tts", action="store_true")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    if not probe_egress():
        print("This environment has no network access; nothing validated.")
        return 2

    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)  # model_manager/CLI paths are cwd-relative
    os.makedirs("assets/embedders", exist_ok=True)
    os.makedirs("assets/predictors", exist_ok=True)
    os.makedirs("audio", exist_ok=True)

    # ---- 1. downloads -----------------------------------------------------
    try:
        fetch(f"{EMBEDDERS}/hubert_base.pt", "assets/embedders/hubert_base.pt",
              "hubert_base.pt")
        fetch(f"{PREDICTORS}/rmvpe.pt", "assets/predictors/rmvpe.pt", "rmvpe.pt")
        fetch(f"{PREDICTORS}/fcpe.pt", "assets/predictors/fcpe.pt", "fcpe.pt")
        fetch(TEST_MP3, "audio/test.mp3", "CI test mp3")
    except Exception as e:
        record("downloads", "FAIL", f"{type(e).__name__}: {e}")
        return finish()

    # ---- 2. voice zip through the model manager ---------------------------
    try:
        from polgen_rvc_tpu.app.model_manager import download_from_url

        if not os.path.isdir("models/Tsoi"):
            download_from_url(TSOI_ZIP, "Tsoi")
        pth = index = None
        for name in os.listdir("models/Tsoi"):
            if name.endswith(".pth"):
                pth = os.path.join("models/Tsoi", name)
            if name.endswith(".index"):
                index = os.path.join("models/Tsoi", name)
        assert pth, "no .pth in installed model dir"
        record("model zip install", "PASS", f"pth={pth} index={index}")
    except Exception as e:
        record("model zip install", "FAIL", f"{type(e).__name__}: {e}")
        return finish()

    # ---- 3. real checkpoints through our converters ------------------------
    try:
        from polgen_rvc_tpu.convert.rvc_ckpt import load_rvc_checkpoint

        synth_cfg, _, tgt_sr = load_rvc_checkpoint(pth)
        record("rvc .pth convert", "PASS",
               f"sr={synth_cfg.sr} tgt_sr={tgt_sr} spk={synth_cfg.spk_embed_dim}")
    except Exception as e:
        record("rvc .pth convert", "FAIL", f"{type(e).__name__}: {e}")
    try:
        from polgen_rvc_tpu.convert.hubert_ckpt import load_hubert_checkpoint

        hub_cfg, _ = load_hubert_checkpoint("assets/embedders/hubert_base.pt")
        record("hubert_base.pt convert", "PASS",
               f"dim={hub_cfg.embed_dim} layers={hub_cfg.n_layers} "
               f"heads={hub_cfg.n_heads}")
    except Exception as e:
        record("hubert_base.pt convert", "FAIL", f"{type(e).__name__}: {e}")
    try:
        from polgen_rvc_tpu.convert.rmvpe_ckpt import load_rmvpe_checkpoint

        load_rmvpe_checkpoint("assets/predictors/rmvpe.pt")
        record("rmvpe.pt convert", "PASS")
    except Exception as e:
        record("rmvpe.pt convert", "FAIL", f"{type(e).__name__}: {e}")
    try:
        from polgen_rvc_tpu.convert.fcpe_ckpt import load_fcpe_checkpoint

        load_fcpe_checkpoint("assets/predictors/fcpe.pt")
        record("fcpe.pt convert", "PASS")
    except Exception as e:
        record("fcpe.pt convert", "FAIL", f"{type(e).__name__}: {e}")

    # ---- 4. real faiss index ------------------------------------------------
    if index:
        try:
            from polgen_rvc_tpu.convert.faiss_index import read_faiss_index

            fi = read_faiss_index(index)
            vecs = fi.vectors
            record("faiss index read", "PASS",
                   f"ntotal={vecs.shape[0]} dim={vecs.shape[1]}")
        except Exception as e:
            record("faiss index read", "FAIL", f"{type(e).__name__}: {e}")
    else:
        record("faiss index read", "SKIP", "zip carried no .index")

    # ---- 5. the reference CI conversion -------------------------------------
    try:
        from polgen_rvc_tpu.app import rvc_cli

        rvc_cli.main([
            "-i", "audio/test.mp3", "-m", "Tsoi", "-p", "-0.5", "-ir", "0",
            "-fr", "3", "-rms", "0.25", "-f0", "rmvpe+", "-hop", "32",
            "-pro", "0.33", "-f0min", "1", "-f0max", "1100", "-f", "mp3",
        ])
        out = "output/Voice_Converted.mp3"
        assert os.path.exists(out), "no output file"
        from polgen_rvc_tpu.utils.mp3_codec import decode_mp3

        y, osr = decode_mp3(out)
        assert np.isfinite(y).all() and np.abs(y).max() > 0.01
        record("CI rvc_cli conversion", "PASS",
               f"{y.shape[0]/osr:.1f}s @ {osr} Hz, peak {np.abs(y).max():.3f}")
    except Exception as e:
        record("CI rvc_cli conversion", "FAIL", f"{type(e).__name__}: {e}")

    # ---- 6. torch-stack parity with real weights ----------------------------
    if not args.skip_parity:
        validate_parity(pth)

    # ---- 7. live Edge-TTS -----------------------------------------------------
    if not args.skip_tts:
        try:
            from polgen_rvc_tpu.app.edge_tts_client import synthesize

            synthesize("Hello from the validation run.", "en-US-GuyNeural",
                       "tts_probe.mp3")
            from polgen_rvc_tpu.utils.mp3_codec import decode_mp3

            y, osr = decode_mp3("tts_probe.mp3")
            assert y.shape[0] > osr // 2, "TTS audio too short"
            record("live Edge-TTS", "PASS", f"{y.shape[0]/osr:.1f}s audio")
        except Exception as e:
            record("live Edge-TTS", "FAIL", f"{type(e).__name__}: {e}")

    return finish()


def validate_parity(pth: str):
    """Real-weight parity vs the torch reference stack (fairseq-free parts)."""
    ref_dir = "/root/reference"
    if not os.path.isdir(ref_dir):
        record("torch parity", "SKIP", "reference checkout not available")
        return
    # reuse the test suite's reference-import machinery
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "ref_parity", os.path.join(repo, "tests", "test_reference_parity.py")
    )
    rp = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(rp)
    except Exception as e:
        record("torch parity setup", "FAIL", f"{type(e).__name__}: {e}")
        return

    # 6a. synthesizer: real .pth into both stacks, identical inputs
    try:
        import torch

        import jax.numpy as jnp

        from polgen_rvc_tpu.convert.rvc_ckpt import load_rvc_checkpoint
        from polgen_rvc_tpu.models.synthesizer import synthesizer_infer
        from polgen_rvc_tpu.utils.metrics import mel_distortion_db

        rp._install_reference_stubs()
        sys.path.insert(0, ref_dir)
        from rvc.lib.algorithm import synthesizers  # type: ignore

        cpt = torch.load(pth, map_location="cpu", weights_only=True)
        net = rp._build_ref_synth(synthesizers, cpt)
        cfg, params, _ = load_rvc_checkpoint(pth)
        T = 96
        phone, pitch, nsff0 = rp._synth_inputs(cpt["config"], T=T, seed=0,
                                               sr_hint=cfg.sr)
        if cpt.get("version", "v1") == "v1":  # v1 models take 256-dim phones
            phone = phone[:, :, :256].copy()
        with torch.no_grad(), rp._NoNoise():
            o_ref, *_ = net.infer(
                torch.from_numpy(phone), torch.tensor([T]),
                torch.from_numpy(pitch), torch.from_numpy(nsff0),
                torch.tensor([0]),
            )
        wav_ref = o_ref.numpy().reshape(-1)
        wav_j = np.asarray(
            synthesizer_infer(
                params, cfg, jnp.asarray(phone),
                jnp.ones((1, 1, T), jnp.float32),
                jnp.asarray(pitch), jnp.asarray(nsff0),
                jnp.zeros((1,), jnp.int32),
                rng=None, compute_dtype=jnp.float32,
            ), np.float32,
        ).reshape(-1)
        md = mel_distortion_db(wav_j, wav_ref, cfg.sr)
        status = "PASS" if md < 0.5 else "FAIL"
        record("synthesizer real-weight mel gate", status, f"{md:.4f} dB")
    except Exception as e:
        record("synthesizer real-weight mel gate", "FAIL",
               f"{type(e).__name__}: {e}")

    # 6b. RMVPE: real rmvpe.pt, full audio->f0 vs RMVPE0Predictor
    try:
        import torch  # noqa: F401

        import jax.numpy as jnp

        from polgen_rvc_tpu.convert.rmvpe_ckpt import load_rmvpe_checkpoint
        from polgen_rvc_tpu.models.rmvpe import rmvpe_f0

        sys.path.insert(0, ref_dir)
        from rvc.lib.predictors import RMVPE  # type: ignore

        predictor = RMVPE.RMVPE0Predictor(
            "assets/predictors/rmvpe.pt", is_half=False, device="cpu"
        )
        rng = np.random.default_rng(0)
        t = np.arange(16000 * 4) / 16000
        audio = (0.5 * np.sin(2 * np.pi * 220 * (1 + 0.01 * np.sin(2 * np.pi * 5 * t)) * t)
                 + 0.01 * rng.standard_normal(t.size)).astype(np.float32)
        f0_ref = predictor.infer_from_audio_with_pitch(
            audio, thred=0.03, f0_min=50, f0_max=1100
        )
        params = load_rmvpe_checkpoint("assets/predictors/rmvpe.pt")
        f0_j = np.asarray(
            rmvpe_f0(params, jnp.asarray(audio[None]), threshold=0.03,
                     f0_min=50, f0_max=1100)
        )[0]
        m = min(len(f0_ref), len(f0_j))
        voiced = (f0_ref[:m] > 0) & (f0_j[:m] > 0)
        cents = np.abs(1200 * np.log2(
            (f0_j[:m][voiced] + 1e-9) / (f0_ref[:m][voiced] + 1e-9)
        ))
        agree = float(((f0_ref[:m] > 0) == (f0_j[:m] > 0)).mean())
        p50 = float(np.median(cents)) if cents.size else 0.0
        status = "PASS" if (agree > 0.95 and p50 < 5.0) else "FAIL"
        record("rmvpe real-weight f0 parity", status,
               f"voicing agree {agree:.3f}, |cents| p50 {p50:.2f}")
    except Exception as e:
        record("rmvpe real-weight f0 parity", "FAIL", f"{type(e).__name__}: {e}")

    # 6c. HuBERT torch-side needs fairseq
    try:
        import fairseq  # type: ignore # noqa: F401
    except ImportError:
        record("hubert real-weight parity", "SKIP",
               "fairseq not installed (torch side); our converter already "
               "validated the real checkpoint in step 3")
        return
    record("hubert real-weight parity", "SKIP",
           "fairseq present but comparison not implemented — extend here")


def finish() -> int:
    print("\n===== validation summary =====")
    width = max(len(s) for s, _, _ in RESULTS) + 2
    fails = 0
    for step, status, detail in RESULTS:
        print(f"  {step:<{width}} {status}   {detail}")
        fails += status == "FAIL"
    print(f"===== {fails} failure(s) / {len(RESULTS)} steps =====")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
