"""Persistent-cache determinism for Pallas-bearing graphs.

Round-3 find: the serialized Mosaic payload inside ``tpu_custom_call``
embeds absolute file paths + line numbers of the whole Python call stack
(including the entry script), so every Pallas-bearing graph re-keyed — and
remotely re-compiled, ~600 s for the F0 graph — on ANY source-line shift
or when traced from a different script. utils/cache_determinism.py strips
the locations before serialization; measured on TPU: identical payload
bytes from two different entry-script paths, kernel output unchanged
(rel err 2.2e-3 vs interpret, the kernel's normal bf16 rounding).
"""

from jaxlib.mlir import ir
from jaxlib.mlir.passmanager import PassManager

from polgen_rvc_tpu.utils.cache_determinism import (
    ensure_deterministic_pallas_cache_keys,
)


def test_patch_applies_and_is_idempotent():
    assert ensure_deterministic_pallas_cache_keys()
    from jax._src import tpu_custom_call as tcc

    patched = tcc._lower_mosaic_module_to_asm
    assert patched.__name__ == "_stripped"
    # second call must not re-wrap (double-stripping is harmless but the
    # guard proves the module-level idempotence used at package import)
    assert ensure_deterministic_pallas_cache_keys()
    assert tcc._lower_mosaic_module_to_asm is patched


def test_strip_debuginfo_removes_locations_from_serialized_module():
    """The exact pass pipeline the shim runs drops loc() info from the
    bytes that end up hashed into the compilation-cache key."""
    from jax._src.interpreters.mlir import make_ir_context

    with make_ir_context(), ir.Location.file("/tmp/somewhere.py", 123, 1):
        module = ir.Module.parse(
            "module { func.func @f() { return loc(\"/tmp/somewhere.py\":7:1) }"
            " loc(\"/tmp/somewhere.py\":5:1) }"
        )
        before = module.operation.get_asm(enable_debug_info=True)
        assert "somewhere.py" in before
        PassManager.parse("builtin.module(strip-debuginfo)").run(
            module.operation
        )
        after = module.operation.get_asm(enable_debug_info=True)
        assert "somewhere.py" not in after
