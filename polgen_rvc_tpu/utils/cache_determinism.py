"""Make Pallas/Mosaic cache keys deterministic across processes and edits.

JAX's persistent compilation cache strips debug info from the StableHLO
module before hashing (``jax._src.cache_key._canonicalize_ir``), so the
cache key of a pure-XLA graph survives unrelated source edits. But a
``pallas_call`` lowers to a ``tpu_custom_call`` whose ``backend_config``
embeds the serialized *Mosaic* module as an opaque string — locations and
all. That nested payload is hashed as ordinary bytes, so it re-keys the
whole graph whenever

- any file on the kernel's Python call stack gains or loses a line
  (absolute paths + line numbers of every frame are serialized), or
- the same graph is traced from a different entry script
  (``bench.py`` vs ``tools/probe_warmup.py`` produce different keys!).

Measured here: every Pallas-bearing conversion graph (the 4 chunk graphs +
the fused RMVPE F0 graph) re-compiled remotely on *every* process start —
~600 s for the F0 graph alone — because the entry-script frame differed
or a pipeline file had shifted by a few lines. The pure-XLA gain/trim
graphs hit the cache across the same runs.

Fix: run MLIR's ``strip-debuginfo`` pass on the Mosaic module right before
``mosaic-serde`` serializes it. Locations only feed compiler diagnostics;
the emitted TPU code is identical. Applied by
``polgen_rvc_tpu.enable_compilation_cache()`` (which every
``VoiceConverter`` calls on construction — the package import itself stays
jax-free). If you enable JAX's persistent cache yourself (e.g.
``JAX_COMPILATION_CACHE_DIR``) and build Pallas graphs without a
converter, call ``ensure_deterministic_pallas_cache_keys()`` first. Safe
no-op on CPU-only environments and on jax versions with a different
internal layout.
"""

from __future__ import annotations

_APPLIED = False


def ensure_deterministic_pallas_cache_keys() -> bool:
    """Patch jax's Mosaic serialization to strip debug locations.

    Idempotent. Returns True when the patch is (already) active, False when
    this jax version's internals don't match (nothing is broken then — the
    cache just stays edit-sensitive, as stock jax is).
    """
    global _APPLIED
    if _APPLIED:
        return True
    try:
        from jax._src import tpu_custom_call as _tcc
        from jaxlib.mlir.passmanager import PassManager as _PassManager

        _orig = _tcc._lower_mosaic_module_to_asm
    except (ImportError, AttributeError):
        return False

    def _stripped(module, **kwargs):
        try:
            with module.context:
                _PassManager.parse(
                    "builtin.module(strip-debuginfo)"
                ).run(module.operation)
        except Exception:
            pass  # diagnostics-only data; serialization proceeds either way
        return _orig(module, **kwargs)

    _tcc._lower_mosaic_module_to_asm = _stripped
    _APPLIED = True
    return True
