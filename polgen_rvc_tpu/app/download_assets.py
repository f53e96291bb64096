"""Predictor/embedder bootstrap (reference download_models.py:4-33).

Fetches rmvpe.pt, fcpe.pt and hubert_base.pt from the Politrees/RVC_resources
hub into the asset layout the pipelines expect. Network required.
"""

from __future__ import annotations

import os
import urllib.request

from .voice_conversion import EMBEDDERS_DIR, PREDICTORS_DIR

RVC_DOWNLOAD_LINK = "https://huggingface.co/Politrees/RVC_resources/resolve/main/"

ASSETS = {
    os.path.join(PREDICTORS_DIR, "rmvpe.pt"): "predictors/rmvpe.pt",
    os.path.join(PREDICTORS_DIR, "fcpe.pt"): "predictors/fcpe.pt",
    os.path.join(EMBEDDERS_DIR, "hubert_base.pt"): "embedders/hubert_base.pt",
}


def dl_model(link: str, remote_name: str, dest_path: str):
    os.makedirs(os.path.dirname(dest_path), exist_ok=True)
    with urllib.request.urlopen(f"{link}{remote_name}") as resp:
        with open(dest_path, "wb") as f:
            while chunk := resp.read(1 << 20):
                f.write(chunk)


def main():
    for dest, remote in ASSETS.items():
        if os.path.exists(dest):
            print(f"[=] {os.path.basename(dest)} already present")
            continue
        print(f"[~] downloading {remote}...")
        dl_model(RVC_DOWNLOAD_LINK, remote, dest)
    print("[+] all assets ready")


if __name__ == "__main__":
    main()
