"""Hardening: untrusted inputs must fail cleanly, not corrupt or execute.

Covers the round-1 advisor findings: FLAC frame/metadata bounds, model-name
path traversal, zip-slip, and the checkpoint unpickler global allowlist.
"""

import io
import pickle
import struct
import zipfile

import numpy as np
import pytest

from polgen_rvc_tpu.app.model_manager import (
    ModelInstallError,
    _safe_model_dir,
    extract_zip,
    upload_separate_files,
)


# -- path traversal ----------------------------------------------------------

@pytest.mark.parametrize("bad", ["../x", "a/b", "..", ".", "", "a\\b", "../../etc"])
def test_model_dir_traversal_rejected(tmp_path, bad):
    with pytest.raises(ModelInstallError):
        _safe_model_dir(str(tmp_path), bad)


def test_model_dir_plain_name_ok(tmp_path):
    p = _safe_model_dir(str(tmp_path), "MyVoice")
    assert p.endswith("MyVoice")


def test_upload_rejects_traversal_name(tmp_path):
    with pytest.raises(ModelInstallError):
        upload_separate_files(None, None, "../evil", models_dir=str(tmp_path))


def test_zip_slip_rejected(tmp_path):
    zpath = str(tmp_path / "evil.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("../escape.pth", b"p" * 2048)
    with pytest.raises(ModelInstallError):
        extract_zip(str(tmp_path / "dest"), zpath,
                    min_pth_bytes=1024, min_index_bytes=256)
    assert not (tmp_path.parent / "escape.pth").exists()


# -- unpickler allowlist -----------------------------------------------------

class _Exploit:
    """Pickles to a REDUCE that would call os.system on load."""

    def __reduce__(self):
        import os
        return (os.system, ("echo pwned",))


def test_tolerant_unpickler_stubs_arbitrary_callables():
    from polgen_rvc_tpu.convert.hubert_ckpt import _Stub, _TolerantUnpickler

    payload = pickle.dumps(_Exploit())
    # sanity: the payload really references os.system
    assert b"os" in payload and b"system" in payload
    result = _TolerantUnpickler(io.BytesIO(payload)).load()
    # os.system must have been replaced by the stub (whose call returns a
    # stub instance), never executed
    assert isinstance(result, _Stub)


def test_tolerant_unpickler_allows_state_dict_plumbing():
    from polgen_rvc_tpu.convert.hubert_ckpt import _TolerantUnpickler

    import collections
    od = collections.OrderedDict(a=1)
    data = pickle.dumps(od)
    out = _TolerantUnpickler(io.BytesIO(data)).load()
    assert isinstance(out, collections.OrderedDict) and out["a"] == 1


class FakeCfg:
    """Stands in for a fairseq config object; not on the allowlist, so the
    loader must stub it while still decoding the tensors around it."""

    def __init__(self):
        self.encoder_attention_heads = 4


def test_tolerant_load_still_reads_checkpoints(tmp_path):
    import torch
    from polgen_rvc_tpu.convert.hubert_ckpt import _Stub, _tolerant_torch_load

    path = str(tmp_path / "ck.pt")
    torch.save({"model": {"w": torch.ones(3)}, "cfg": FakeCfg()}, path)
    ck = _tolerant_torch_load(path)
    assert "model" in ck
    np.testing.assert_allclose(np.asarray(ck["model"]["w"]), 1.0)
    # the non-allowlisted config class came back as a stub keeping its state
    assert isinstance(ck["cfg"], _Stub)
    assert ck["cfg"].encoder_attention_heads == 4


def test_hubert_heads_metadata_recovery():
    from polgen_rvc_tpu.convert.hubert_ckpt import _find_encoder_heads, _Stub

    stub = _Stub()
    stub.__dict__.update({"model": {"encoder_attention_heads": 16}})
    assert _find_encoder_heads({"cfg": stub}) == 16
    assert _find_encoder_heads({"args": {"nope": 1}}) is None


def test_hubert_unknown_dim_raises():
    from polgen_rvc_tpu.convert.hubert_ckpt import infer_hubert_config
    from polgen_rvc_tpu.convert.synthetic import make_hubert_state

    _, sd = make_hubert_state(tiny=True)  # embed_dim 64: not a known family
    with pytest.raises(ValueError, match="head count"):
        infer_hubert_config(sd)
    cfg = infer_hubert_config(sd, n_heads=4)
    assert cfg.n_heads == 4 and cfg.embed_dim == 64


# -- FLAC bounds -------------------------------------------------------------

def _flac_lib():
    try:
        from polgen_rvc_tpu.native import flac
        return flac
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build unavailable: {e}")


def test_flac_truncated_metadata_rejected(tmp_path):
    flac = _flac_lib()
    # header claims a 34-byte STREAMINFO but the file ends early
    blob = b"fLaC" + bytes([0x80, 0, 0, 34]) + b"\x00" * 10
    p = tmp_path / "trunc.flac"
    p.write_bytes(blob)
    with pytest.raises(Exception):
        flac.decode(str(p))


def test_flac_channel_mismatch_rejected(tmp_path, rng):
    flac = _flac_lib()
    sr = 16000
    x = (rng.standard_normal((sr // 4, 1)) * 0.1).astype(np.float32)
    p = str(tmp_path / "mono.flac")
    flac.encode(p, x, sr)
    data = bytearray(open(p, "rb").read())
    # find the first frame (sync 0xFFF8) and flip its channel-assignment
    # nibble from mono (0) to 8 channels (7): must error, not corrupt memory
    idx = data.find(b"\xff\xf8", 4)
    assert idx > 0
    # channel code lives in byte idx+3, high nibble
    data[idx + 3] = (data[idx + 3] & 0x0F) | (7 << 4)
    p2 = str(tmp_path / "evil.flac")
    open(p2, "wb").write(bytes(data))
    with pytest.raises(Exception):
        flac.decode(p2)
