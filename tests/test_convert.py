"""Converter correctness: weight-norm folding, faiss index round-trip."""

import numpy as np
import torch

import jax.numpy as jnp

from polgen_rvc_tpu.convert.common import fold_weight_norm
from polgen_rvc_tpu.convert.faiss_index import read_faiss_index, write_ivf_flat


def test_fold_weight_norm_conv_matches_torch(rng):
    conv = torch.nn.Conv1d(4, 8, 5)
    wn = torch.nn.utils.weight_norm(conv)
    sd = {f"c.{k}": v.detach().numpy() for k, v in wn.state_dict().items()}
    w = fold_weight_norm(sd, "c")
    np.testing.assert_allclose(w, conv.weight.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_fold_weight_norm_dim2_matches_torch(rng):
    # fairseq pos_conv uses dim=2
    conv = torch.nn.Conv1d(8, 8, 4, groups=2)
    wn = torch.nn.utils.weight_norm(conv, dim=2)
    sd = {f"c.{k}": v.detach().numpy() for k, v in wn.state_dict().items()}
    w = fold_weight_norm(sd, "c", dim=2)
    np.testing.assert_allclose(w, conv.weight.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_fold_weight_norm_parametrize_style(rng):
    conv = torch.nn.ConvTranspose1d(6, 3, 8, stride=4)
    wn = torch.nn.utils.parametrizations.weight_norm(conv)
    sd = {f"c.{k}": v.detach().numpy() for k, v in wn.state_dict().items()}
    w = fold_weight_norm(sd, "c")
    np.testing.assert_allclose(w, conv.weight.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_faiss_ivf_roundtrip(rng, tmp_path):
    vecs = rng.standard_normal((257, 24)).astype(np.float32)
    cents = rng.standard_normal((7, 24)).astype(np.float32)
    # nearest-centroid assignment, as faiss training would produce
    d2 = ((vecs[:, None] - cents[None]) ** 2).sum(-1)
    assign = d2.argmin(1)
    path = str(tmp_path / "x.index")
    write_ivf_flat(path, vecs, cents, assign)
    idx = read_faiss_index(path)
    assert (idx.d, idx.ntotal, idx.nlist) == (24, 257, 7)
    np.testing.assert_array_equal(idx.vectors, vecs)
    np.testing.assert_array_equal(idx.centroids, cents)


def test_faiss_sparse_lists(rng, tmp_path):
    # most lists empty -> exercises the 'sprs' reader path via many centroids
    vecs = rng.standard_normal((10, 8)).astype(np.float32)
    cents = rng.standard_normal((64, 8)).astype(np.float32)
    assign = np.zeros(10, np.int64)  # everything in list 0
    path = str(tmp_path / "x.index")
    write_ivf_flat(path, vecs, cents, assign)
    idx = read_faiss_index(path)
    np.testing.assert_array_equal(idx.vectors, vecs)


def test_orbax_export_roundtrip(tmp_path):
    """Converted weights export to orbax and reload torch-free."""
    import torch

    from polgen_rvc_tpu.convert.export import (
        export_converted, has_export, load_exported,
    )
    from polgen_rvc_tpu.convert.synthetic import (
        make_hubert_state, make_rmvpe_state, make_rvc_checkpoint,
    )

    model_dir = tmp_path / "Voice"
    model_dir.mkdir()
    t = lambda sd: {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    cpt = make_rvc_checkpoint(sr=48000, tiny=True)
    torch.save({"config": cpt["config"], "weight": t(cpt["weight"]),
                "f0": cpt["f0"], "version": cpt["version"]},
               str(model_dir / "v.pth"))
    _, hsd = make_hubert_state(tiny=True)
    hub_path = str(tmp_path / "hubert_base.pt")
    # real fairseq checkpoints carry the head count in their cfg/args
    # metadata; the loader must recover it for non-standard dims
    import argparse
    torch.save({"model": t(hsd),
                "args": argparse.Namespace(encoder_attention_heads=4)},
               hub_path)
    rmvpe_path = str(tmp_path / "rmvpe.pt")
    torch.save(t(make_rmvpe_state()), rmvpe_path)

    assert not has_export(str(model_dir))
    out = export_converted(str(model_dir), hub_path, rmvpe_path)
    assert has_export(str(model_dir))

    scfg, synth, hcfg, hub, rmvpe = load_exported(str(model_dir))
    assert scfg.sr == 48000 and scfg.input_dim == 768
    assert hcfg.n_layers == 3
    assert rmvpe is not None
    # spot-check a leaf matches the direct conversion
    from polgen_rvc_tpu.convert.rvc_ckpt import load_rvc_checkpoint

    _, direct, _ = load_rvc_checkpoint(str(model_dir / "v.pth"))
    np.testing.assert_allclose(
        np.asarray(synth["emb_g"]), np.asarray(direct["emb_g"]), atol=1e-6
    )
