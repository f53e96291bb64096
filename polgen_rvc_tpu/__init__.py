"""PolGen-RVC-TPU: a TPU-native (JAX/XLA/Pallas) voice-conversion framework.

Re-implements the full capability surface of the PolGen-RVC reference
application (RVC v2 inference: HuBERT content encoding, neural F0 prediction,
feature retrieval, VITS/NSF-HiFi-GAN synthesis, Edge-TTS voice-over, audio
effects + mixdown, CLIs/UI/model management) as an idiomatic JAX framework:

- all device compute is jitted XLA with static shapes (fixed-shape chunking +
  overlap trim, zero recompiles for long-form audio),
- parameters live in plain pytrees converted once from PyTorch checkpoints
  (weight-norm and batch-norm folded at conversion time),
- long songs batch their chunks and shard them over a ``jax.sharding.Mesh``
  (data parallel over ICI), with optional tensor parallelism for the content
  encoder,
- host-side subsystems (codecs, effects streaming, downloads, UI) are native
  C++ or thin Python, isolated from the compiled graphs.

Layer map (mirrors reference capabilities; see SURVEY.md):
    ops/        pure jittable DSP + torch-semantics ops (conv, GRU, interp)
    models/     synthesizer / hubert / rmvpe / crepe / fcpe as pure functions
    convert/    checkpoint + faiss-index converters (torch -> pytree)
    retrieval/  HBM-resident exact top-k feature retrieval
    pipeline/   the conversion engine (chunk planner + jitted graphs + cache)
    parallel/   mesh setup and sharding policies
    app/        CLIs, pipelines, effects, mixdown, TTS, model manager, UI
    native/     C++ host-side DSP (effects, wav IO) with ctypes bindings
"""

__version__ = "0.1.0"

import os as _os


def enable_compilation_cache(path: str | None = None):
    """Persist compiled XLA programs across processes.

    The conversion graphs are large; remote/TPU compiles run minutes while
    warm execution is milliseconds, so a persistent cache is essential for
    serving-style restarts. Called automatically on first engine use.
    """
    import jax

    cache_dir = path or _os.environ.get(
        "POLGEN_XLA_CACHE", _os.path.expanduser("~/.cache/polgen_xla")
    )
    _os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    # Pallas kernels embed source locations in their serialized Mosaic
    # payload, which re-keys every Pallas-bearing graph on unrelated source
    # edits (and even on a different entry script). Strip them so the
    # persistent cache actually persists. See utils/cache_determinism.py.
    from .utils.cache_determinism import (
        ensure_deterministic_pallas_cache_keys,
    )

    ensure_deterministic_pallas_cache_keys()

