"""Full-signal F0 dispatch: the fused RMVPE graph + fcpe/crepe glue.

Mixin half of VoiceConverter (pipeline/engine.py) — F0 runs once over the
whole padded signal (reference get_f0 semantics, /root/reference/rvc/infer/
pipeline.py:119-201) through bucketed, jitted graphs; the rmvpe path stays
device-resident so chunk graphs slice it without a host round trip.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.rmvpe import rmvpe_mel, rmvpe_salience
from ..ops.f0_utils import coarse_f0, salience_to_f0
from .config import ConversionOptions

_F0_FRAME_BUCKET = 1024  # RMVPE salience compiles per multiple of this


def coarse_f0_np(f0, f0_min=50.0, f0_max=1100.0):
    """Host mirror of ops.f0_utils.coarse_f0 (pipeline.py:193-201)."""
    mel_min = 1127 * np.log(1 + f0_min / 700)
    mel_max = 1127 * np.log(1 + f0_max / 700)
    mel = 1127 * np.log(1 + f0 / 700)
    mel[mel > 0] = (mel[mel > 0] - mel_min) * 254 / (mel_max - mel_min) + 1
    mel = np.clip(mel, 1, 255)
    return np.rint(mel).astype(np.int32)

class F0DispatchMixin:
    """F0 half of VoiceConverter (engine.py hosts the converter class)."""

    def _crepe_fn(self, samples_bucket: int):
        """Fused framing + salience over the shared int16 upload, keyed on
        the audio bucket only (start/hop travel as dynamic scalars)."""
        if samples_bucket not in self._crepe_fns:
            from ..models.crepe import crepe_salience_window
            from .crepe_method import _FRAME_BUCKET

            # bf16 conv multiplicands on TPU (f32 accumulate + f32
            # everything-else — see crepe_salience), mirroring the
            # reference's fp16 torchcrepe GPU mode; CPU stays f32 so the
            # parity tests pin exact semantics
            cdt = (jnp.bfloat16 if jax.default_backend() not in ("cpu",)
                   else jnp.float32)

            # float16 on the wire: the (2048, 360) salience slabs are the
            # crepe path's only bulk download (34 MB f32 per 3-min song on
            # a ~37 MB/s relay, measured 0.7 s); halving them costs ~5e-4
            # relative on sigmoid outputs — the same envelope as the
            # reference's fp16 torchcrepe GPU path, bounded at pipeline
            # semantics by tests/test_f0_methods.py::
            # test_crepe_f16_wire_coarse_bins_bounded. Salience itself
            # computes in f32 (models/crepe.py), and every decode consumer
            # upcasts before any arithmetic. The fused DEVICE decode path
            # (_crepe_decode_fn) gains no bandwidth from f16 but reads the
            # same slabs DELIBERATELY: one salience executable serves both
            # consumers (a second f32-keyed jit would double the ~3-5 min
            # remote compile and the ~90 s/graph relay load).
            self._crepe_fns[samples_bucket] = jax.jit(
                lambda params, audio_i16, inv_scale, start, hop:
                crepe_salience_window(
                    params, audio_i16, inv_scale, start, hop, _FRAME_BUCKET,
                    compute_dtype=cdt,
                ).astype(jnp.float16)
            )
        return self._crepe_fns[samples_bucket]

    def _crepe_decode_fn(self, frames_bucket: int, out_bucket: int,
                         f0_min: float, f0_max: float):
        """Device-resident crepe decode tail: scan Viterbi + cents + the
        reference resize/nan post + pitch shift + coarse quantization in
        ONE graph over the concatenated salience slabs — nothing crosses
        the host link, and the (1, out_bucket) output shares the
        rmvpe/fcpe chunk-graph family."""
        key = (frames_bucket, out_bucket, float(f0_min), float(f0_max))
        if key not in self._crepe_dec_fns:
            from ..models.crepe import (
                crepe_f0_decode_device, crepe_resize_device,
            )
            from ..ops.f0_utils import coarse_f0

            # Pallas Viterbi on TPU only (parity-pinned in interpret mode
            # on CPU): the scan lowering cost 1.86 s/3-min song of per-op
            # dispatch (tools/profile_crepe_device.py)
            use_pallas = jax.default_backend() not in ("cpu",)

            @jax.jit
            def fn(salience, n, p_len, shift_factor):
                f0 = crepe_f0_decode_device(
                    salience, n, f0_min=f0_min, f0_max=f0_max,
                    use_pallas=use_pallas,
                )
                f0r = crepe_resize_device(f0, n, p_len, out_bucket)
                pitchf = f0r * shift_factor
                pitch = coarse_f0(pitchf, f0_min, f0_max)
                return pitch[None], pitchf[None]

            self._crepe_dec_fns[key] = fn
        return self._crepe_dec_fns[key]

    def _crepe_sal_fused_fn(self, samples_bucket: int, n_slabs: int):
        """Fused device-resident crepe salience: framing + the six-conv
        stack for ALL of a song's slabs in ONE graph (lax.map over fixed
        2048-frame slabs — bounds peak HBM exactly like the per-slab
        dispatches did). Round 4 dispatched ~11 salience graphs plus an
        eager concatenate per 3-min song; the per-dispatch relay latency
        cost ~0.4 s/song over the device time itself.

        Emits (n_slabs * 2048, 360) float16 — the same dtype the per-slab
        graphs put on the wire, so the downstream decode executable
        (_crepe_decode_fn, Pallas Viterbi) is SHARED with the per-slab
        path and the f16 envelope stays bounded by the coarse-bin test.

        STATUS: disabled by default (POLGEN_CREPE_SALFUSED). On the
        remote-relay v5e this executable compiles and loads but HANGS at
        execution (measured twice, round 5, on a freshly healed chip) —
        as does the fully fused variant with the Viterbi composed in —
        wedging the chip until the client disconnects. CPU (tests) runs
        it fine; the lowering of the scanned conv stack is the suspect.
        Keyed on (samples_bucket, n_slabs): n_slabs tracks
        ceil(n_frames/2048), the decode graph's key surface
        (padded = n_slabs * 2048)."""
        from .crepe_method import _FRAME_BUCKET

        key = ("salfused", samples_bucket, n_slabs)
        if key not in self._crepe_fns:
            from ..models.crepe import crepe_salience_window

            cdt = (jnp.bfloat16 if jax.default_backend() not in ("cpu",)
                   else jnp.float32)

            @jax.jit
            def fn(params, audio_i16, inv_scale, hop):
                def slab(start):
                    return crepe_salience_window(
                        params, audio_i16, inv_scale, start, hop,
                        _FRAME_BUCKET, compute_dtype=cdt,
                    )

                sal = jax.lax.map(
                    slab,
                    jnp.arange(n_slabs, dtype=jnp.int32) * _FRAME_BUCKET,
                )
                return sal.reshape(
                    n_slabs * _FRAME_BUCKET, -1
                ).astype(jnp.float16)

            self._crepe_fns[key] = fn
        return self._crepe_fns[key]

    def _crepe_dispatch_device(self, audio: np.ndarray, p_len: int,
                               opts: ConversionOptions, uploaded=None):
        """Dispatch the fused salience graph + the decode graph; returns
        (pitch, pitchf) as UNfetched (1, P) device arrays — the crepe
        analog of _rmvpe_dispatch/_fcpe_dispatch_device, so chunk graphs
        slice F0 on device with no host synchronization (the fetch + host
        Viterbi were 1.2 s of exposed critical path per 3-min song)."""
        from .crepe_method import _FRAME_BUCKET

        import os

        audio_dev, inv_scale, t = uploaded or self._upload_audio(audio)
        hop = int(opts.hop_length)
        n = t // hop + 1
        n_slabs = int(np.ceil(n / _FRAME_BUCKET))
        padded = n_slabs * _FRAME_BUCKET
        if os.environ.get("POLGEN_CREPE_SALFUSED", "0") == "1":
            # MEASURED HANG on the v5e (round 5, twice, on a freshly
            # healed chip): the lax.map salience executable compiles and
            # loads but never completes execution through the relay,
            # wedging the chip until the client disconnects. Off by
            # default until the scan-of-convs lowering is understood;
            # the design (one dispatch for all slabs) is preserved here
            # for a local-attached TPU where it can be debugged.
            sal = self._crepe_sal_fused_fn(int(audio_dev.shape[1]), n_slabs)(
                self.crepe_params, audio_dev, inv_scale, jnp.int32(hop)
            )
        else:
            # per-slab dispatches + eager concatenate (the round-4
            # structure): ~0.3-0.4 s/3-min song of relay dispatch
            # latency, but proven to run
            fn = self._crepe_fn(int(audio_dev.shape[1]))
            outs = [
                fn(self.crepe_params, audio_dev, inv_scale,
                   jnp.int32(start), jnp.int32(hop))
                for start in range(0, padded, _FRAME_BUCKET)
            ]
            sal = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        out_bucket = int(audio_dev.shape[1]) // 160 + 1
        shift = np.float32(2.0 ** (opts.pitch / 12.0))
        return self._crepe_decode_fn(
            padded, out_bucket, opts.f0_min, opts.f0_max
        )(sal, jnp.int32(n), jnp.int32(p_len), shift)

    def _fcpe_dev_fn(self, samples_bucket: int, f0_min: float, f0_max: float):
        """Fused device-resident FCPE F0: mel + conformer salience + cents
        decode + resize/gap-fill + pitch shift + coarse quantization in ONE
        graph over the shared int16 upload — the fcpe analog of _f0_fn, so
        chunk graphs slice (pitch, pitchf) on device with no host round
        trip (and share the rmvpe+ chunk-graph cache: both emit
        (1, bucket//160 + 1))."""
        key = ("dev", samples_bucket, float(f0_min), float(f0_max))
        if key not in self._fcpe_fns:
            from ..models.fcpe import (
                fcpe_decode, fcpe_mel, fcpe_resize_fill, fcpe_salience,
            )

            cfg = self.fcpe_cfg

            @jax.jit
            def fn(params, audio_i16, inv_scale, t_valid, p_len, threshold,
                   shift_factor):
                audio = audio_i16.astype(jnp.float32) * inv_scale
                mel = fcpe_mel(audio, cfg)  # (1, bucket//hop + 1, mels)
                n = t_valid // cfg.hop_size + 1
                # n_valid: frame-global ops (GroupNorm stats, FAVOR+ sums)
                # see exactly the reference's unpadded tensor; frames past
                # n are garbage the resize never reads
                sal = fcpe_salience(params, cfg, mel, n_valid=n)
                f0 = fcpe_decode(sal, cfg, threshold)[0]
                f0 = fcpe_resize_fill(f0, n, p_len)
                pitchf = f0 * shift_factor
                pitch = coarse_f0(pitchf, f0_min, f0_max)
                return pitch[None], pitchf[None]

            self._fcpe_fns[key] = fn
        return self._fcpe_fns[key]

    def _fcpe_dispatch_device(self, audio: np.ndarray, p_len: int,
                              opts: ConversionOptions, uploaded=None):
        """Dispatch the fused FCPE graph; returns (pitch, pitchf) as
        UNfetched (1, P) device arrays — nothing synchronizes."""
        audio_dev, inv_scale, t = uploaded or self._upload_audio(audio)
        shift = np.float32(2.0 ** (opts.pitch / 12.0))
        return self._fcpe_dev_fn(
            int(audio_dev.shape[1]), opts.f0_min, opts.f0_max
        )(
            self.fcpe_params, audio_dev, inv_scale, jnp.int32(t),
            jnp.int32(p_len), 0.03, shift,
        )

    # ------------------------------------------------------------------
    # F0 (full-signal, reference get_f0 semantics)
    # ------------------------------------------------------------------

    def _f0_fn(self, samples_bucket: int, f0_min: float = 50.0,
               f0_max: float = 1100.0):
        key = (samples_bucket, float(f0_min), float(f0_max))
        if key not in self._f0_fns:
            # params travel as jit arguments, NOT closures: closed-over
            # weights get baked into the HLO as constants, which bloats
            # serialized programs and forces XLA to constant-fold them.
            # mel + U-Net + decode + pitch math fuse into ONE graph: eager
            # dispatch is tunnel-latency-bound in this environment.
            # bf16 gives little speedup but risks argmax flips in the cents
            # decode — the F0 pass stays fp32. On TPU the U-Net levels run
            # the W-folded fused kernel (ops/pallas_unet2d.py) at fp32;
            # round 1's UNfolded kernel lost to XLA, the M=128 fold wins.
            cdt = jnp.float32
            use_pallas = jax.default_backend() not in ("cpu",)

            @jax.jit
            def fn(params, audio_i16, inv_scale, threshold, shift_factor):
                # audio arrives int16-quantized against its own max: halves
                # the upload through the ~37 MB/s host<->device relay (the
                # exposed head of every conversion). -96 dB quantization
                # noise on a signal that was int16 in the source WAV anyway.
                audio = audio_i16.astype(jnp.float32) * inv_scale
                mel = rmvpe_mel(audio)
                n = mel.shape[-1]
                pad = (-n) % 32
                if pad:
                    mel = jnp.pad(mel, ((0, 0), (0, 0), (0, pad)), mode="reflect")
                sal = rmvpe_salience(
                    params, mel, compute_dtype=cdt, use_pallas=use_pallas
                )[:, :n]
                f0_raw = salience_to_f0(sal.astype(jnp.float32), threshold)
                # "rmvpe+" range gate, then the pitch shift + coarse
                # quantization (pipeline.py:183-201) — all device-side so the
                # chunk graphs can consume f0 without a host round trip
                f0 = jnp.where((f0_raw < f0_min) | (f0_raw > f0_max), 0.0, f0_raw)
                pitchf = f0 * shift_factor
                pitch = coarse_f0(pitchf, f0_min, f0_max)
                return f0_raw, pitch, pitchf

            self._f0_fns[key] = fn
        return self._f0_fns[key]

    def compute_f0(self, audio_pad: np.ndarray, p_len: int,
                   opts: ConversionOptions,
                   uploaded=None) -> tuple[np.ndarray, np.ndarray]:
        """(coarse pitch int32 (p_len,), pitchf float32 (p_len,))."""
        if opts.f0_method in ("rmvpe+", "rmvpe"):
            f0 = self._rmvpe_f0(audio_pad, opts, uploaded)
        elif opts.f0_method == "mangio-crepe":
            from .crepe_method import crepe_f0

            f0 = crepe_f0(self, audio_pad, p_len, opts, uploaded)
        elif opts.f0_method == "fcpe":
            from .fcpe_method import fcpe_f0

            f0 = fcpe_f0(self, audio_pad, p_len, opts)
        else:
            raise ValueError(f"unknown f0 method: {opts.f0_method}")
        f0 = np.asarray(f0, np.float32)[:p_len]
        if f0.shape[0] < p_len:
            f0 = np.pad(f0, (0, p_len - f0.shape[0]))

        f0 = f0 * (2.0 ** (opts.pitch / 12.0))
        if opts.f0_file:
            f0 = self._apply_f0_file(f0, opts.f0_file)
        pitchf = f0.astype(np.float32)
        pitch = coarse_f0_np(f0.copy(), opts.f0_min, opts.f0_max)
        return pitch, pitchf

    def _quantize_audio(self, audio: np.ndarray):
        """int16-quantize a padded signal against its own max, bucketed to
        the F0 frame step. Returns (int16 (bucket,), inv_scale f32, t)."""
        t = audio.shape[0]
        step = _F0_FRAME_BUCKET * 160
        bucket = max(int(np.ceil(t / step)), 1) * step
        amax = float(np.max(np.abs(audio))) if t else 0.0
        scale = 32767.0 / amax if amax > 0 else 1.0
        audio_b = np.zeros(bucket, np.int16)
        audio_b[:t] = np.round(audio * scale)
        return audio_b, np.float32(1.0 / scale), t

    def _upload_audio(self, audio: np.ndarray):
        """Quantize a padded signal to int16 against its own max and upload
        ONCE: the F0 graph, the RMS1-envelope graph, and the chunk graphs
        all read this buffer — the song's only bulk host->device transfer
        on the ~37 MB/s relay. -96 dB quantization noise on a signal that
        was int16 in the source WAV anyway.
        Returns (device (1, bucket) int16, inv_scale, t)."""
        audio_b, inv_scale, t = self._quantize_audio(audio)
        return jnp.asarray(audio_b)[None], inv_scale, t

    def _rmvpe_dispatch(self, audio: np.ndarray, opts: ConversionOptions,
                        uploaded=None):
        """Dispatch the fused F0 graph; returns (f0_raw, pitch, pitchf)
        device arrays of shape (1, n) plus n — nothing synchronizes."""
        if self.rmvpe_params is None:
            raise RuntimeError("rmvpe weights not loaded")
        audio_dev, inv_scale, t = uploaded or self._upload_audio(audio)
        n = t // 160 + 1  # mel frames for this signal
        bucket = audio_dev.shape[1]
        shift = np.float32(2.0 ** (opts.pitch / 12.0))
        f0_raw, pitch, pitchf = self._f0_fn(bucket, opts.f0_min, opts.f0_max)(
            self.rmvpe_params, audio_dev, inv_scale, 0.03, shift,
        )
        return f0_raw, pitch, pitchf, n

    def _rmvpe_f0(self, audio: np.ndarray, opts: ConversionOptions,
                  uploaded=None) -> np.ndarray:
        f0_raw, _, _, n = self._rmvpe_dispatch(audio, opts, uploaded)
        f0 = np.array(f0_raw[0, :n])  # copy: jax buffers are read-only
        # "rmvpe+": zero outside [f0_min, f0_max] (RMVPE.py:487-496)
        f0[(f0 < opts.f0_min) | (f0 > opts.f0_max)] = 0.0
        return f0

    def compute_f0_device(self, audio_pad: np.ndarray, p_len: int,
                          opts: ConversionOptions, uploaded=None):
        """Device-resident F0: dispatch the fused rmvpe, fcpe, or crepe
        graph and return (pitch, pitchf) as UNfetched (1, P) device arrays
        so chunk graphs consume them without a host synchronization.
        Returns None when the method or an f0-file override requires the
        host path.

        The fcpe device path reads the shared int16 upload (the host path
        reads the float signal directly) and its bucket tail is zero-padded
        rather than reflect-padded, so its last ~win/hop mel frames can
        differ from the host path — those frames lie inside the x_pad
        region the output trim discards."""
        if opts.f0_file:
            return None
        if opts.f0_method in ("rmvpe+", "rmvpe"):
            _, pitch, pitchf, n = self._rmvpe_dispatch(
                audio_pad, opts, uploaded
            )
            if n < p_len:  # cannot happen (n = t//160+1 >= t//window), but
                return None  # fall back rather than mis-slice
            return pitch, pitchf  # (1, P) device arrays, unfetched
        if (
            opts.f0_method == "fcpe"
            and self.fcpe_params is not None
            and self.fcpe_cfg is not None
            and self.fcpe_cfg.hop_size == self.engine.window
        ):
            return self._fcpe_dispatch_device(audio_pad, p_len, opts,
                                              uploaded)
        if (
            opts.f0_method == "mangio-crepe"
            and self.crepe_params is not None
        ):
            return self._crepe_dispatch_device(audio_pad, p_len, opts,
                                               uploaded)
        return None

    def _apply_f0_file(self, f0: np.ndarray, path: str) -> np.ndarray:
        """Reference f0-file override (pipeline.py:185-191, 351-360)."""
        try:
            with open(path) as f:
                lines = f.read().strip("\n").split("\n")
            inp = np.array(
                [[float(v) for v in line.split(",")] for line in lines],
                dtype=np.float32,
            )
        except Exception as e:
            print(f"failed to read f0 file: {e}")
            return f0
        tf0 = self.engine.sample_rate // self.engine.window
        delta_t = np.round((inp[:, 0].max() - inp[:, 0].min()) * tf0 + 1).astype("int16")
        replace = np.interp(list(range(delta_t)), inp[:, 0] * 100, inp[:, 1])
        start = self.engine.x_pad * tf0
        shape = f0[start : start + len(replace)].shape[0]
        f0[start : start + len(replace)] = replace[:shape]
        return f0

