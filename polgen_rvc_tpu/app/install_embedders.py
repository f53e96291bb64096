"""Alternate HuBERT embedder installer.

Capability parity with tabs/install/install_huberts.py:12-81: six preset
embedders from the Politrees/RVC_resources hub plus custom .pt URLs,
atomically replacing the active hubert_base.pt.
"""

from __future__ import annotations

import os
import re
import shutil
import urllib.request

from ..utils.progress import NULL_PROGRESS
from .voice_conversion import EMBEDDERS_DIR, HUBERT_MODEL_PATH, _CONVERTER_CACHE

BASE_URL = "https://huggingface.co/Politrees/RVC_resources/resolve/main/embedders/"

EMBEDDER_PRESETS = [
    "hubert_base.pt",
    "contentvec_base.pt",
    "korean_hubert_base.pt",
    "chinese_hubert_base.pt",
    "portuguese_hubert_base.pt",
    "japanese_hubert_base.pt",
]


def download_and_replace_model(model_name: str, custom_url: str | None = None,
                               progress=NULL_PROGRESS,
                               embedders_dir: str | None = None) -> str:
    dest_dir = embedders_dir or EMBEDDERS_DIR
    os.makedirs(dest_dir, exist_ok=True)
    if custom_url:
        if not re.search(r"\.pt(\?.*)?$", custom_url):
            return "Error: the URL must point to a .pt file"
        model_url = custom_url
    else:
        if model_name not in EMBEDDER_PRESETS:
            return f"Error: unknown embedder preset {model_name}"
        model_url = BASE_URL + model_name

    tmp_path = os.path.join(dest_dir, "tmp_model.pt")
    progress(0.4, f'installing embedder "{model_name}"')
    with urllib.request.urlopen(model_url) as resp, open(tmp_path, "wb") as out:
        shutil.copyfileobj(resp, out)

    target = os.path.join(dest_dir, "hubert_base.pt")
    os.replace(tmp_path, target)
    _CONVERTER_CACHE.clear()  # embedder changed; converted weights are stale
    progress(1.0, "done")
    return f'[+] Embedder "{model_name}" installed successfully!'
