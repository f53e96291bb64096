"""Device mesh + sharding policies.

The reference has zero multi-device support (SURVEY §2.2); this layer is the
TPU-native scaling design:
  - "data" axis: chunk batches of a song (or batch cover generation) shard
    across chips over ICI — the dominant axis, models are small (~50-95M)
  - "model" axis (optional): tensor parallelism for the HuBERT encoder
    (attention heads + FFN columns), useful at high chip counts where a
    single song's chunks can't fill the mesh

Everything is GSPMD: we annotate shardings with NamedSharding and let XLA
insert the collectives (all-gather/reduce-scatter over ICI).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def shard_batch(x, mesh: Mesh):
    """Place a (B, ...) array with B sharded over the "data" axis."""
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Fully replicate a parameter pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def _put(a, mesh, spec):
    return jax.device_put(jax.numpy.asarray(a), NamedSharding(mesh, spec))


def shard_hubert_params(params: dict, mesh: Mesh) -> dict:
    """Tensor-parallel placement for the HuBERT encoder.

    Per transformer layer: q/k/v projections column-sharded (heads split over
    "model"), output projection row-sharded, fc1 column-/fc2 row-sharded.
    XLA GSPMD then runs attention/FFN per shard and all-reduces the residual
    adds over ICI. Everything else (conv extractor, norms) is replicated.
    """
    rep = P()
    out = jax.tree.map(lambda a: _put(a, mesh, rep), params)
    for lp in out["encoder"]["layers"]:
        for name in ("q", "k", "v"):
            lp["attn"][name]["w"] = _put(lp["attn"][name]["w"], mesh, P(None, "model"))
            lp["attn"][name]["b"] = _put(lp["attn"][name]["b"], mesh, P("model"))
        lp["attn"]["o"]["w"] = _put(lp["attn"]["o"]["w"], mesh, P("model", None))
        lp["fc1"]["w"] = _put(lp["fc1"]["w"], mesh, P(None, "model"))
        lp["fc1"]["b"] = _put(lp["fc1"]["b"], mesh, P("model"))
        lp["fc2"]["w"] = _put(lp["fc2"]["w"], mesh, P("model", None))
    return out
