"""UI server internals: job store, multipart parser, HTTP routes."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from polgen_rvc_tpu.app.ui.server import JobStore, parse_multipart


def test_jobstore_lifecycle():
    jobs = JobStore()

    def work(progress=None):
        progress(0.5, "halfway")
        time.sleep(0.05)
        return "result-path"

    jid = jobs.start(work)
    for _ in range(100):
        st = jobs.get(jid)
        if st["status"] == "done":
            break
        time.sleep(0.02)
    assert st["status"] == "done"
    assert st["result"] == "result-path"
    assert jobs.get("nope")["status"] == "unknown"


def test_jobstore_error_capture():
    jobs = JobStore()

    def boom(progress=None):
        raise ValueError("kaput")

    jid = jobs.start(boom)
    for _ in range(100):
        st = jobs.get(jid)
        if st["status"] == "error":
            break
        time.sleep(0.02)
    assert st["status"] == "error" and "kaput" in st["error"]


def test_multipart_parser():
    boundary = "XBOUNDARY"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; filename="a.wav"\r\n'
        "Content-Type: audio/wav\r\n\r\n"
        "BINARY\x00DATA\r\n"
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="label"\r\n\r\n'
        "hello\r\n"
        f"--{boundary}--\r\n"
    ).encode("latin1")
    fields = parse_multipart(body, f"multipart/form-data; boundary={boundary}")
    assert fields["label"] == "hello"
    fname, data = fields["file"]
    assert fname == "a.wav" and data == b"BINARY\x00DATA"
    with pytest.raises(ValueError):
        parse_multipart(b"", "multipart/form-data")


def test_http_routes(tmp_path, monkeypatch):
    """Static page + JSON endpoints over a real socket."""
    import polgen_rvc_tpu.app.ui.server as srv
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.Handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        html = urllib.request.urlopen(f"http://127.0.0.1:{port}/").read()
        assert b"PolGen-RVC-TPU" in html
        voices = json.load(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/api/voices")
        )
        assert "Russian" in voices["voices"]
        emb = json.load(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/api/embedders")
        )
        assert "hubert_base.pt" in emb["presets"]
        # unknown route -> 404
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()


def test_tolerant_unpickler(tmp_path):
    """fairseq-style checkpoints with unimportable config classes load."""
    import sys
    import types
    import torch

    from polgen_rvc_tpu.convert.hubert_ckpt import _tolerant_torch_load

    # fabricate an importable module, pickle through it, then remove it so
    # unpickling must stub the class (the fairseq/omegaconf situation)
    mod = types.ModuleType("ephemeral_cfg_pkg")

    class Weird:
        pass

    Weird.__module__ = "ephemeral_cfg_pkg"
    Weird.__qualname__ = "Weird"
    mod.Weird = Weird
    sys.modules["ephemeral_cfg_pkg"] = mod
    obj = {"cfg": Weird(), "model": {"x": torch.ones(3)}}
    p = str(tmp_path / "ck.pt")
    torch.save(obj, p)
    del sys.modules["ephemeral_cfg_pkg"]

    loaded = _tolerant_torch_load(p)
    assert "model" in loaded
    assert float(loaded["model"]["x"].sum()) == 3.0
