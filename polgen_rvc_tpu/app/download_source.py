"""Per-host model downloaders (reference rvc/modules/download_source.py).

Hosts: Google Drive, HuggingFace, Pixeldrain, Yandex Disk, Mega.
gdown/mega.py are not available here; Drive is handled with a direct
requests flow (confirm-token dance), Mega is gated (its download protocol
requires AES-CTR decryption of the stream — no crypto primitive available),
the rest are plain HTTP. All require network at call time.
"""

from __future__ import annotations

import os
import re
import urllib.request

import requests

from ..utils.progress import NULL_PROGRESS


class DownloadError(RuntimeError):
    pass


def _stream_to_file(resp, path, progress=NULL_PROGRESS, label="downloading"):
    total = int(resp.headers.get("content-length", 0) or 0)
    done = 0
    with open(path, "wb") as f:
        for chunk in resp.iter_content(chunk_size=1 << 20):
            f.write(chunk)
            done += len(chunk)
            if total:
                progress(min(0.79, 0.1 + 0.6 * done / total), label)


def download_gdrive(url: str, zip_path: str, progress=NULL_PROGRESS):
    """Google Drive public file (gdown-equivalent confirm-token flow)."""
    m = re.search(r"(?:/d/|id=)([\w-]+)", url)
    if not m:
        raise DownloadError(f"cannot parse Google Drive id from {url}")
    file_id = m.group(1)
    session = requests.Session()
    resp = session.get(
        "https://drive.usercontent.google.com/download",
        params={"id": file_id, "export": "download", "confirm": "t"},
        stream=True, timeout=60,
    )
    if "text/html" in resp.headers.get("content-type", ""):
        html = resp.text
        token = re.search(r'name="confirm" value="([^"]+)"', html)
        uuid_f = re.search(r'name="uuid" value="([^"]+)"', html)
        params = {"id": file_id, "export": "download"}
        if token:
            params["confirm"] = token.group(1)
        if uuid_f:
            params["uuid"] = uuid_f.group(1)
        resp = session.get(
            "https://drive.usercontent.google.com/download",
            params=params, stream=True, timeout=60,
        )
    resp.raise_for_status()
    _stream_to_file(resp, zip_path, progress)


def download_huggingface(url: str, zip_path: str, progress=NULL_PROGRESS):
    urllib.request.urlretrieve(url.replace("/blob/", "/resolve/"), zip_path)


def download_pixeldrain(url: str, zip_path: str, progress=NULL_PROGRESS):
    file_id = url.rstrip("/").split("/")[-1]
    resp = requests.get(
        f"https://pixeldrain.com/api/file/{file_id}", stream=True, timeout=60
    )
    resp.raise_for_status()
    _stream_to_file(resp, zip_path, progress)


def download_yandex(url: str, zip_path: str, progress=NULL_PROGRESS):
    api = (
        "https://cloud-api.yandex.net/v1/disk/public/resources/download"
        f"?public_key={requests.utils.quote(url)}"
    )
    meta = requests.get(api, timeout=60)
    meta.raise_for_status()
    href = meta.json()["href"]
    resp = requests.get(href, stream=True, timeout=60)
    resp.raise_for_status()
    _stream_to_file(resp, zip_path, progress)


def download_mega(url: str, zip_path: str, progress=NULL_PROGRESS):
    raise DownloadError(
        "Mega downloads need the mega.py client (AES-CTR stream decryption), "
        "which is unavailable in this environment; download the file manually "
        "and use the zip-upload installer instead"
    )


def download_file(url: str, zip_path: str, progress=NULL_PROGRESS):
    """Dispatch by host (reference download_source.py:9-78)."""
    try:
        if "drive.google.com" in url:
            download_gdrive(url, zip_path, progress)
        elif "huggingface.co" in url:
            download_huggingface(url, zip_path, progress)
        elif "pixeldrain.com" in url:
            download_pixeldrain(url, zip_path, progress)
        elif "mega.nz" in url:
            download_mega(url, zip_path, progress)
        elif "disk.yandex" in url:
            download_yandex(url, zip_path, progress)
        else:  # direct link
            resp = requests.get(url, stream=True, timeout=60)
            resp.raise_for_status()
            _stream_to_file(resp, zip_path, progress)
    except DownloadError:
        raise
    except Exception as e:
        raise DownloadError(f"download failed for {url}: {e}") from e
