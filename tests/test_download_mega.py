"""Offline tests for the first-party Mega client (network mocked).

The protocol pieces — URL/key parsing, key folding, attribute CBC
decryption, CTR stream decryption, API error handling — are exercised
against a locally fabricated "Mega file" so the only thing left untested
is the live HTTP call (zero egress here; reference behavior:
rvc/modules/download_source.py:44-57 via mega.py).
"""

import base64
import json
import os

import numpy as np
import pytest

pytest.importorskip("cryptography")
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

from polgen_rvc_tpu.app.download_source import (
    DownloadError,
    download_mega,
    mega_decrypt_attributes,
    mega_file_key,
    parse_mega_url,
)


def _b64url(data: bytes) -> str:
    return base64.b64encode(data).decode().replace("+", "-").replace("/", "_").rstrip("=")


def _make_mega_fixture(payload: bytes, name="voice.zip", seed=7):
    """Fabricate (url, api_response, encrypted_stream) like Mega would."""
    rng = np.random.default_rng(seed)
    key = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
    nonce = bytes(rng.integers(0, 256, 8, dtype=np.uint8))
    meta_mac = bytes(8)
    # node key: halves XOR to `key`, bytes 16:24 are the nonce
    second = nonce + meta_mac
    first = bytes(a ^ b for a, b in zip(key, second))
    node_key = first + second
    url = f"https://mega.nz/file/AbCd1234#{_b64url(node_key)}"

    enc = Cipher(algorithms.AES(key), modes.CTR(nonce + b"\0" * 8)).encryptor()
    stream = enc.update(payload) + enc.finalize()

    attrs = b"MEGA" + json.dumps({"n": name}).encode()
    attrs += b"\0" * (-len(attrs) % 16)
    cbc = Cipher(algorithms.AES(key), modes.CBC(b"\0" * 16)).encryptor()
    at = _b64url(cbc.update(attrs) + cbc.finalize())

    api = [{"g": "https://fake.mega.download/abc", "s": len(payload), "at": at}]
    return url, api, stream, key, nonce


class _FakeResp:
    def __init__(self, body, json_body=None):
        self._body = body
        self._json = json_body
        self.headers = {"content-length": str(len(body or b""))}

    def raise_for_status(self):
        pass

    def json(self):
        return self._json

    def iter_content(self, chunk_size=1 << 20):
        for i in range(0, len(self._body), chunk_size):
            yield self._body[i : i + chunk_size]


class _FakeSession:
    def __init__(self, api_json, stream):
        self.api_json = api_json
        self.stream = stream
        self.posts = []

    def post(self, url, params=None, json=None, timeout=None):
        self.posts.append((url, json))
        return _FakeResp(b"", json_body=self.api_json)

    def get(self, url, stream=True, timeout=None):
        return _FakeResp(self.stream)


def test_parse_mega_url_formats():
    key = bytes(range(32))
    b64 = _b64url(key)
    h, k = parse_mega_url(f"https://mega.nz/file/h4ndLe-1#{b64}")
    assert h == "h4ndLe-1" and k == key
    h2, k2 = parse_mega_url(f"https://mega.co.nz/#!oldH4nd!{b64}")
    assert h2 == "oldH4nd" and k2 == key


def test_parse_mega_url_rejects_bad():
    with pytest.raises(DownloadError):
        parse_mega_url("https://mega.nz/folder/abc#def")
    with pytest.raises(DownloadError):
        parse_mega_url(f"https://mega.nz/file/h#{_b64url(bytes(16))}")  # 16B = folder key


def test_file_key_folding():
    node = bytes(range(32))
    k, nonce = mega_file_key(node)
    assert k == bytes(a ^ b for a, b in zip(range(16), range(16, 32)))
    assert nonce == bytes(range(16, 24))


def test_attribute_decrypt_roundtrip():
    _, api, _, key, _ = _make_mega_fixture(b"x" * 64, name="My Voice.zip")
    attrs = mega_decrypt_attributes(api[0]["at"], key)
    assert attrs["n"] == "My Voice.zip"


def test_attribute_decrypt_bad_key():
    _, api, _, key, _ = _make_mega_fixture(b"x" * 64)
    wrong = bytes(b ^ 0xFF for b in key)
    with pytest.raises(DownloadError, match="bad key"):
        mega_decrypt_attributes(api[0]["at"], wrong)


def test_download_mega_end_to_end_mocked(tmp_path, rng):
    payload = bytes(rng.integers(0, 256, 3 * (1 << 20) + 123, dtype=np.uint8))
    url, api, stream, *_ = _make_mega_fixture(payload)
    sess = _FakeSession(api, stream)
    out = str(tmp_path / "model.zip")
    seen = []
    download_mega(url, out, progress=lambda f, m: seen.append(f), session=sess)
    assert open(out, "rb").read() == payload
    # API was asked for the right handle with a g-command
    assert sess.posts[0][1] == [{"a": "g", "g": 1, "p": "AbCd1234"}]
    assert seen and max(seen) <= 0.79


def test_download_mega_api_error(tmp_path):
    url, _, _, *_ = _make_mega_fixture(b"x")
    sess = _FakeSession(api_json=[-9], stream=b"")  # ENOENT
    with pytest.raises(DownloadError, match="-9"):
        download_mega(url, str(tmp_path / "x.zip"), session=sess)


def test_dispatch_routes_mega(tmp_path, monkeypatch):
    from polgen_rvc_tpu.app import download_source

    called = {}
    monkeypatch.setattr(
        download_source, "download_mega",
        lambda url, path, progress=None: called.setdefault("url", url),
    )
    download_source.download_file(
        "https://mega.nz/file/h#k", str(tmp_path / "z.zip")
    )
    assert called["url"].startswith("https://mega.nz/")
