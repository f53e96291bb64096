"""Output path: device-side RMS-envelope gain, trim/int16 pack, host tail.

Mixin half of VoiceConverter (pipeline/engine.py) — reproduces the
reference post-processing (change_rms + trim + resample + int16 normalize,
/root/reference/rvc/infer/pipeline.py:29-61,397,454-461) as fused device
graphs whose knot math is bit-identical between the streaming per-batch
neighborhoods (convert) and whole-song row sets (convert_batch).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _np_interp_linear(x: np.ndarray, size: int) -> np.ndarray:
    """numpy mirror of F.interpolate(mode='linear', align_corners=False)."""
    n = x.shape[-1]
    if n == 1:
        return np.repeat(x, size, axis=-1)
    pos = (np.arange(size) + 0.5) * (n / size) - 0.5
    pos = np.clip(pos, 0.0, n - 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n - 1)
    hi = np.clip(lo + 1, 0, n - 1)
    frac = pos - lo
    return x[..., lo] * (1 - frac) + x[..., hi] * frac


def _librosa_rms(y: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    ypad = np.pad(y, frame_length // 2)
    n = 1 + len(y) // hop_length
    idx = np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :]
    return np.sqrt(np.mean(ypad[idx] ** 2, axis=-1))


def change_rms_np(source, src_sr, target, tgt_sr, rate):
    """Reference AudioProcessor.change_rms (pipeline.py:29-61) on host."""
    rms1 = _librosa_rms(source, src_sr // 2 * 2, src_sr // 2)
    rms2 = _librosa_rms(target, tgt_sr // 2 * 2, tgt_sr // 2)
    rms1 = _np_interp_linear(rms1, len(target))
    rms2 = np.maximum(_np_interp_linear(rms2, len(target)), 1e-6)
    return target * (rms1 ** (1 - rate)) * (rms2 ** (rate - 1))

class OutputPathMixin:
    """Output half of VoiceConverter (engine.py hosts the converter class)."""

    def _rms1_fn(self, bucket: int):
        """RMS knots of the 16 kHz source from the already-uploaded padded
        int16 signal: librosa rms(frame=16000, hop=8000, center) semantics
        via one cumulative sum (change_rms's rms1, pipeline.py:29-61)."""
        key = ("rms1", bucket)
        if key in self._trim_fns:
            return self._trim_fns[key]
        nf1 = 1 + bucket // 8000

        @jax.jit
        def fn(audio_i16, inv_scale, start, n16):
            src = audio_i16[0].astype(jnp.float32) * inv_scale
            # window of the true signal: [start, start + n16) — zero the
            # reflect padding around it before summing
            idx = jnp.arange(bucket)
            src = jnp.where((idx >= start) & (idx < start + n16), src, 0.0)
            src = jnp.roll(src, -start)  # signal now begins at index 0
            c = jnp.concatenate([jnp.zeros(1), jnp.cumsum(src * src)])
            k = jnp.arange(nf1)
            lo = jnp.clip(k * 8000 - 8000, 0, bucket)
            hi = jnp.clip(k * 8000 + 8000, 0, bucket)
            return jnp.sqrt((c[hi] - c[lo]) / 16000.0)  # (nf1,)

        self._trim_fns[key] = fn
        return fn

    def _gain_rows_fn(self, n_rows: int, out_len: int, nf1: int,
                      emit_lo: int, emit_hi: int, emit_len: int = None):
        """RMS-envelope gain applied on device to trimmed rows.

        rows: (n_rows, out_len) f32 valid-masked rows whose global output
        positions are `offsets`; rms2 knots (librosa rms frame=tgt_sr,
        hop=tgt_sr/2 over the FULL concatenated output) are reconstructed
        exactly from per-row cumulative sums — windows crossing row or
        batch boundaries sum contributions from every supplied row, so a
        1-batch neighborhood suffices in the streaming pipeline and a
        whole-song row set in batch mode gives bit-identical values.
        Emits rows [emit_lo, emit_hi) as int16 + per-row absmax (same
        contract as _trim_fn), truncated to emit_len columns (the emitted
        batch's own bucket width — rows are zero past their valid length,
        so truncation never drops signal and the fetch stays exact-sized).
        Mirrors change_rms (pipeline.py:29-61) + the old device finalize's
        interpolation."""
        if emit_len is None:
            emit_len = out_len
        key = ("gain", n_rows, out_len, nf1, emit_lo, emit_hi, emit_len)
        if key in self._trim_fns:
            return self._trim_fns[key]
        hop2 = self.tgt_sr // 2
        frame2 = hop2 * 2
        n_emit = emit_hi - emit_lo
        # every rms2 knot whose window any supplied row can touch
        n_knots = n_rows * out_len // hop2 + 4

        @jax.jit
        def fn(rows, offsets, rms1, n1, n2, n_out, k0, rate):
            c = jnp.concatenate(
                [jnp.zeros((n_rows, 1)), jnp.cumsum(rows * rows, axis=1)],
                axis=1,
            )
            k = k0 + jnp.arange(n_knots)  # global knot ids
            glo = k * hop2 - hop2
            ghi = k * hop2 + hop2
            lo_r = jnp.clip(glo[None, :] - offsets[:, None], 0, out_len)
            hi_r = jnp.clip(ghi[None, :] - offsets[:, None], 0, out_len)
            sums = (
                jnp.take_along_axis(c, hi_r, axis=1)
                - jnp.take_along_axis(c, lo_r, axis=1)
            )
            # sequential sum in ascending row order: rows outside a knot's
            # window contribute an exact 0.0, so the addend sequence — and
            # therefore every bit of rms2 — is identical whether the rows
            # are a 1-batch neighborhood (convert) or a whole song
            # (convert_batch). jnp.sum's reduction tree would not be.
            total = sums[0]
            for r in range(1, n_rows):
                total = total + sums[r]
            rms2 = jnp.sqrt(total / frame2)  # (n_knots,)

            def interp(vals, pos, n_valid, local0):
                pos = jnp.clip(pos, 0.0, n_valid.astype(jnp.float32) - 1.0)
                lo = jnp.floor(pos).astype(jnp.int32)
                hi = jnp.minimum(lo + 1, n_valid - 1)
                frac = pos - lo.astype(jnp.float32)
                size = vals.shape[0]
                lo = jnp.clip(lo - local0, 0, size - 1)
                hi = jnp.clip(hi - local0, 0, size - 1)
                return vals[lo] * (1 - frac) + vals[hi] * frac

            idx = (
                offsets[emit_lo:emit_hi, None]
                + jnp.arange(out_len)[None, :]
            ).astype(jnp.float32)  # (n_emit, out_len) global positions
            fn_out = n_out.astype(jnp.float32)
            pos1 = (idx + 0.5) * (n1.astype(jnp.float32) / fn_out) - 0.5
            pos2 = (idx + 0.5) * (n2.astype(jnp.float32) / fn_out) - 0.5
            g1 = interp(rms1, pos1, n1, 0)
            g2 = jnp.maximum(interp(rms2, pos2, n2, k0), 1e-6)
            gain = jnp.power(g1, 1.0 - rate) * jnp.power(g2, rate - 1.0)
            gained = (rows[emit_lo:emit_hi] * gain)[:, :emit_len]
            absmax = jnp.max(jnp.abs(gained), axis=1)
            scale = 32767.0 / jnp.maximum(absmax, 1e-9)
            seg = jnp.round(gained * scale[:, None]).astype(jnp.int16)
            return seg, absmax

        self._trim_fns[key] = fn
        return fn

    def _put_gain_args(self, rows, offs, rms1):
        """Canonical placement for the RMS-gain graph's array inputs:
        replicated over the mesh (the knot sums read every row anyway).
        Chunk-graph outputs arrive with whatever sharding GSPMD chose for
        them; pinning the gain inputs makes the gain executable's jit key
        placement-stable, so prewarm()'s zero stand-ins load the SAME
        executable convert() later dispatches. mesh=None: plain asarray,
        zero-cost on the single-chip serving path."""
        return (
            self._put(rows, replicated=True),
            self._put(offs, replicated=True),
            self._put(rms1, replicated=True),
        )

    def _gain_layout(self, plan, batch_idxs, batch_bucket, chunk_outn,
                     n_audio: int, uploaded_w: int):
        """Emit geometry of the RMS-gain graphs for one song: shared by
        convert()'s dispatch_gain and prewarm() so both construct the SAME
        _gain_rows_fn keys (any divergence would compile an unwarmed
        graph at serving time)."""
        eng = self.engine
        window = eng.window
        upp = self.synth_cfg.upp
        t_pad_tgt = self.tgt_sr * eng.x_pad
        hop2 = self.tgt_sr // 2
        n_out_total = int(sum(chunk_outn))
        p_len_max = min(
            plan.bucket_len // window,
            2 * self.hubert_cfg.num_frames(plan.bucket_len),
        )
        out_len_max = p_len_max * upp - 2 * t_pad_tgt
        n_batches = len(batch_idxs)
        # neighborhood radius: a batch's rms2 knots + interpolation read
        # at most ~2.5*hop2 of output beyond its own span, so with every
        # middle batch spanning >= 3*hop2 one neighbor each side covers
        # it (production configs always do: middle chunks carry
        # >= (x_center - 2*x_query) s of content). Degenerate short-chunk
        # configs widen the radius until r neighbors span the reach —
        # bit-identical either way, because rows outside a knot's window
        # add an exact 0.0 to its sum (see _gain_rows_fn).
        batch_span = [
            sum(chunk_outn[ci] for ci in idxs) for idxs in batch_idxs
        ]
        gain_radius = 1
        if n_batches > 2:
            min_mid = min(batch_span[1:-1])
            if min_mid < 3 * hop2:
                gain_radius = min(
                    n_batches - 1,
                    int(np.ceil(3 * hop2 / max(min_mid, 1))),
                )
        # emit at each batch's own bucket width: fetched bytes stay exact
        emit_lens = [
            min(bb // window, 2 * self.hubert_cfg.num_frames(bb)) * upp
            - 2 * t_pad_tgt
            for bb in batch_bucket
        ]
        return {
            "n1": 1 + n_audio // (eng.sample_rate // 2),
            "n2": 1 + n_out_total // hop2,
            "nf1": 1 + uploaded_w // 8000,
            "n_out_total": n_out_total,
            "out_len_max": out_len_max,
            "gain_radius": gain_radius,
            "emit_lens": emit_lens,
        }

    @staticmethod
    def _start_host_copy(*arrays):
        """Start device->host transfers without blocking: the relay then
        streams every pending output concurrently and each later
        np.asarray blocks only on its own, already-in-flight copy (no-op
        on backends without the hint)."""
        for a in arrays:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass

    def _rows_to_audio(self, fetched_rows):
        """[(seg int16 (n,), absmax)] -> concatenated float32 audio."""
        parts = [
            seg.astype(np.float32) * (float(am) / 32767.0)
            for seg, am in fetched_rows
        ]
        return (
            np.concatenate(parts) if parts else np.zeros(0, np.float32)
        )

    def _host_finalize(self, audio_opt: np.ndarray,
                       opts: ConversionOptions):
        """Host tail of the reference post-processing (pipeline.py:454-461):
        optional resample + int16 normalize. The RMS envelope mix already
        happened on device (_gain_rows_fn) — this host's CPU takes seconds
        for the 8M-sample numpy version."""
        out_sr = self.tgt_sr
        if (
            opts.resample_sr >= self.engine.sample_rate
            and opts.resample_sr != self.tgt_sr
        ):
            import math as _math
            from scipy.signal import resample_poly

            g = _math.gcd(self.tgt_sr, opts.resample_sr)
            audio_opt = resample_poly(
                audio_opt, opts.resample_sr // g, self.tgt_sr // g
            )
            out_sr = opts.resample_sr

        audio_max = np.abs(audio_opt).max() / 0.99 if audio_opt.size else 0.0
        max_int16 = 32768.0
        if audio_max > 1:
            max_int16 /= audio_max
        return (audio_opt * max_int16).astype(np.int16), out_sr
