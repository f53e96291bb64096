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


# reference slider value= settings, tabs/processing/processing.py:151-349
# (identical to its all_default_values reset list at :384-403)
_REFERENCE_EFFECT_DEFAULTS = {
    "reverb_rm_size": 0.1,
    "reverb_width": 1.0,
    "reverb_wet": 0.1,
    "reverb_dry": 0.8,
    "reverb_damping": 0.9,
    "chorus_rate_hz": 0.0,
    "chorus_depth": 0.0,
    "chorus_centre_delay_ms": 0.0,
    "chorus_feedback": 0.0,
    "chorus_mix": 0.0,
    "compressor_ratio": 4.0,
    "compressor_threshold": -12.0,
    "low_shelf_gain": 0.0,
    "high_shelf_gain": 0.0,
    "noise_gate_threshold": -40.0,
    "noise_gate_ratio": 8.0,
    "noise_gate_attack": 10.0,
    "noise_gate_release": 100.0,
}


def test_effect_defaults_match_reference():
    from polgen_rvc_tpu.app.audio_processing import EFFECT_DEFAULTS

    assert EFFECT_DEFAULTS == _REFERENCE_EFFECT_DEFAULTS


def test_ui_exposes_all_effect_knobs():
    """Every reference processing slider has a UI control with the same
    default, and the JS submit list posts all 18 of them."""
    import os
    import re

    import polgen_rvc_tpu.app.ui as ui_pkg

    html = open(os.path.join(os.path.dirname(ui_pkg.__file__),
                             "index.html")).read()
    for knob, default in _REFERENCE_EFFECT_DEFAULTS.items():
        m = re.search(rf'id="{knob}"[^>]*value="([^"]+)"', html)
        assert m, f"missing UI control: {knob}"
        assert float(m.group(1)) == default, (
            f"{knob}: UI default {m.group(1)} != reference {default}"
        )
        # the submit handler must post it
        assert f'"{knob}"' in html, f"{knob} not in the JS submit list"
    # conversion surface: filter_radius present (reference-dead knob kept
    # for parity, tabs/conversion/conversion.py:130-139)
    m = re.search(r'id="filter_radius"[^>]*value="([^"]+)"', html)
    assert m and int(m.group(1)) == 3
    assert '"filter_radius"' in html  # posted by readOpts


def test_process_route_forwards_all_knobs(monkeypatch):
    """POST /api/process with all 18 knobs -> process_audio receives them."""
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import polgen_rvc_tpu.app.ui.server as srv

    got = {}

    def fake_process_audio(voc, ins, progress=None, **kw):
        got.update(kw)
        return "/tmp/fake_out.wav"

    monkeypatch.setattr(srv, "process_audio", fake_process_audio)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.Handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        sent = {
            k: round(v + 0.25, 3) for k, v in _REFERENCE_EFFECT_DEFAULTS.items()
        }
        body = dict(sent)
        body.update(vocal_path="/tmp/v.wav", instrumental_path="/tmp/i.wav",
                    output_format="wav", use_effects=True)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/process",
            data=json.dumps(body).encode(), method="POST",
        )
        job = json.load(urllib.request.urlopen(req))["job"]
        for _ in range(200):
            st = json.load(urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/job/{job}"
            ))
            if st["status"] in ("done", "error"):
                break
            time.sleep(0.02)
        assert st["status"] == "done", st
        for k, v in sent.items():
            assert got.get(k) == pytest.approx(v), (k, got.get(k), v)
    finally:
        httpd.shutdown()
