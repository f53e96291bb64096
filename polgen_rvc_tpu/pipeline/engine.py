"""The conversion engine: jitted chunk graphs + host orchestration.

Replaces the reference's VC.pipeline/VC.vc (pipeline.py:203-467) with a
TPU-native design:
  - weights convert once and stay on device; compiled graphs are cached per
    static bucket shape (the reference reloads every model per request —
    voice_conversion.py:71-100)
  - each chunk batch runs ONE jitted graph: HuBERT -> retrieval (on-device
    top-k; the reference round-trips to faiss on CPU per chunk) -> 2x frame
    upsample -> protect mix -> synthesizer -> waveform
  - F0 runs once over the full padded signal (reference semantics) through
    bucketed RMVPE graphs
  - long audio is cut at quiet points and padded to shared buckets: zero
    recompiles within a song, and chunk batches shard over a device mesh
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.hubert import HubertConfig, hubert_extract
from ..models.synthesizer import SynthesizerConfig, synthesizer_infer
from ..retrieval.topk import retrieval_blend
from ..utils.progress import NULL_PROGRESS, ProgressReporter
from .batch_cover import BatchCoverMixin
from .chunking import plan_chunks
from .config import ConversionOptions, EngineConfig
# coarse_f0_np / change_rms_np / _np_interp_linear are re-exported here:
# engine.py was their historical home before the mixin split
from .f0_dispatch import _F0_FRAME_BUCKET, F0DispatchMixin, coarse_f0_np  # noqa: F401
from .output import OutputPathMixin, _np_interp_linear, change_rms_np  # noqa: F401
from .prewarm import PrewarmMixin


class VoiceConverter(F0DispatchMixin, OutputPathMixin, BatchCoverMixin,
                     PrewarmMixin):
    """Cached, jitted voice conversion over one (synthesizer, hubert, rmvpe,
    index) model set. The F0 dispatch, RMS-gain output path, batch cover
    generation, and prewarm live in their mixin modules (f0_dispatch.py,
    output.py, batch_cover.py, prewarm.py); this module owns the converter
    state, the chunk graphs, and convert."""

    def __init__(
        self,
        *,
        synth_cfg: SynthesizerConfig,
        synth_params: dict,
        hubert_cfg: HubertConfig,
        hubert_params: dict,
        rmvpe_params: Optional[dict] = None,
        crepe_params: Optional[dict] = None,
        fcpe_params: Optional[dict] = None,
        fcpe_cfg=None,
        index_bank: Optional[np.ndarray] = None,
        engine: EngineConfig = EngineConfig(),
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        from .. import enable_compilation_cache

        enable_compilation_cache()
        self.synth_cfg = synth_cfg
        self.hubert_cfg = hubert_cfg
        self.engine = engine
        self.mesh = mesh
        self.tgt_sr = synth_cfg.sr
        self.version = "v2" if synth_cfg.input_dim == 768 else "v1"
        self.compute_dtype = jnp.dtype(engine.compute_dtype)

        if mesh is not None:
            from ..parallel.mesh import replicate, shard_hubert_params

            self.synth_params = replicate(synth_params, mesh)
            self.rmvpe_params = (
                replicate(rmvpe_params, mesh) if rmvpe_params else None
            )
            if mesh.shape.get("model", 1) > 1:
                self.hubert_params = shard_hubert_params(hubert_params, mesh)
            else:
                self.hubert_params = replicate(hubert_params, mesh)
            self.index_bank = (
                replicate(index_bank, mesh) if index_bank is not None else None
            )
        else:
            self.synth_params = jax.tree.map(jnp.asarray, synth_params)
            self.hubert_params = jax.tree.map(jnp.asarray, hubert_params)
            self.rmvpe_params = (
                jax.tree.map(jnp.asarray, rmvpe_params) if rmvpe_params else None
            )
            self.index_bank = (
                jnp.asarray(index_bank) if index_bank is not None else None
            )
        self.crepe_params = (
            jax.tree.map(jnp.asarray, crepe_params) if crepe_params else None
        )
        self.fcpe_params = (
            jax.tree.map(jnp.asarray, fcpe_params) if fcpe_params else None
        )
        self.fcpe_cfg = fcpe_cfg
        self._chunk_fns = {}
        self._f0_fns = {}
        self._crepe_fns = {}
        self._crepe_dec_fns = {}
        self._fcpe_fns = {}
        self._trim_fns = {}

    def _put(self, a, *, replicated: bool = False):
        """Host array -> device, batch-sharded over the mesh when present."""
        a = jnp.asarray(a)
        if self.mesh is None:
            return a
        from ..parallel.mesh import replicate, shard_batch

        return replicate(a, self.mesh) if replicated else shard_batch(a, self.mesh)

    def _assemble_rows(self, entries, p_len: int):
        """Shared convert/convert_batch row assembly for one chunk batch.

        entries: per-row (chunk, chunk_id, pitch_full, pitchf_full) where
        pitch_full/pitchf_full are the row's song-level host F0 arrays or
        None (None = the graph slices device-resident F0 itself, or the
        model is f0-free). Rows beyond len(entries) are padding.

        Returns a dict of host arrays with the layout both call paths feed
        the chunk graph: mask/hub_valid/sample lens+starts/f0 rows/noise
        ids plus the per-row valid frame counts — keeping the two
        orchestrators bit-identical by construction instead of by test.
        """
        eng = self.engine
        B = eng.chunk_batch
        window = eng.window
        pitch_b = np.ones((B, p_len), np.int32)
        pitchf_b = np.zeros((B, p_len), np.float32)
        mask_b = np.zeros((B, p_len), np.float32)
        starts = np.zeros(B, np.int32)
        samp_starts = np.zeros(B, np.int32)
        samp_lens = np.zeros(B, np.int32)
        hub_valid = np.zeros(B, np.int32)
        ids_b = np.zeros(B, np.int32)
        valid_frames = []
        for row, (c, ci, pitch_full, pitchf_full) in enumerate(entries):
            slice_len = c.slice_end - c.slice_start
            samp_starts[row] = c.slice_start
            samp_lens[row] = slice_len
            hub_valid[row] = max(self.hubert_cfg.num_frames(slice_len), 0)
            v = min(slice_len // window,
                    2 * self.hubert_cfg.num_frames(slice_len), p_len)
            valid_frames.append(v)
            mask_b[row, :v] = 1.0
            f0_lo = c.slice_start // window
            starts[row] = f0_lo
            ids_b[row] = ci
            if pitch_full is not None:
                seg_p = pitch_full[f0_lo : f0_lo + v]
                seg_f = pitchf_full[f0_lo : f0_lo + v]
                pitch_b[row, : len(seg_p)] = seg_p
                pitchf_b[row, : len(seg_f)] = seg_f
        return {
            "pitch": pitch_b, "pitchf": pitchf_b, "mask": mask_b,
            "starts": starts, "samp_starts": samp_starts,
            "samp_lens": samp_lens, "hub_valid": hub_valid, "ids": ids_b,
            "valid_frames": valid_frames,
        }

    def _noise_frames(self) -> int:
        """Fixed noise-draw frame count: the p_len of the config-level max
        bucket. Every chunk graph draws at this length and slices, so the
        noise a chunk sees never depends on its batch's bucket."""
        mb = self.engine.max_bucket_len
        return min(mb // self.engine.window,
                   2 * self.hubert_cfg.num_frames(mb))

    # ------------------------------------------------------------------
    # per-chunk jitted graph
    # ------------------------------------------------------------------

    def _chunk_fn(self, bucket_len: int, batch: int, *, use_index: bool,
                  use_protect: bool, use_f0: bool,
                  devf0_frames: Optional[int] = None,
                  dev_wav_bucket: Optional[int] = None,
                  emit: str = "raw"):
        """Jitted chunk-batch graph. With devf0_frames set, the graph takes
        the full-signal (1, devf0_frames) pitch arrays (device-resident F0
        output) plus per-row frame offsets and slices rows in-graph — no
        eager device ops, which cost a tunnel round trip each in this
        environment.

        With dev_wav_bucket set, the graph additionally slices each row's
        AUDIO window from the song's single uploaded int16 buffer
        (shape (1, dev_wav_bucket)) instead of taking a host-gathered
        (B, bucket_len) f32 matrix: the song uploads once (~6 MB int16)
        and every chunk batch reads it in place, instead of re-uploading
        overlapping f32 windows (~17 MB/song through the ~37 MB/s relay).

        emit selects the output stage fused into the graph (each avoided
        follow-up graph saves a ~10-25 ms tunnel dispatch):
          "raw"   — full (B, p_len*upp) waveform (batch-mode path)
          "trimf" — pad-trimmed, valid-masked f32 rows for the RMS gain
          "int16" — trimmed rows quantized per-row to int16, + absmax
                    (the _trim_fn contract, ready to fetch)"""
        key = (bucket_len, batch, use_index, use_protect, use_f0, devf0_frames,
               dev_wav_bucket, emit)
        if key in self._chunk_fns:
            return self._chunk_fns[key]

        assert bucket_len <= self.engine.max_bucket_len, (
            f"bucket {bucket_len} exceeds the config bound "
            f"{self.engine.max_bucket_len} (noise-draw shape would clip)"
        )
        hub_frames = self.hubert_cfg.num_frames(bucket_len)
        p_len = min(bucket_len // self.engine.window, 2 * hub_frames)
        # every graph draws noise at the CONFIG-level max frame count and
        # slices to its own p_len: the sequence a chunk sees is independent
        # of the bucket its batch compiled at, so per-batch (convert) and
        # per-class (convert_batch) bucketing render bit-identically
        noise_frames = self._noise_frames()
        v1 = self.version == "v1"
        noise_scale = self.engine.noise_scale
        cdt = self.compute_dtype
        # fused Pallas resblocks on real TPUs; XLA path on CPU/interpret
        use_pallas = jax.default_backend() not in ("cpu",)

        def step(hubert_params, synth_params, bank,
                 wav, pitch, pitchf, starts, frame_mask, hub_valid,
                 index_rate, protect, sid, key, chunk_ids,
                 inv_scale=None, sample_starts=None, sample_lens=None):
            # per-row noise keys derived from (seed, song-chunk index): a
            # chunk renders identically whatever batch slot it occupies, so
            # multi-song packed batches reproduce serial conversions exactly
            row_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(chunk_ids)
            if dev_wav_bucket is not None:
                # wav arrives as the (1, dev_wav_bucket) int16 song buffer;
                # dequantize and slice each row's window in-graph. The
                # in-graph zero tail keeps end-of-song slices in bounds
                # without growing the upload (or the F0 graph's bucket),
                # and the per-row length mask reproduces the host
                # gather_chunk_batch zero padding exactly.
                buf = wav[0].astype(jnp.float32) * inv_scale
                buf = jnp.concatenate(
                    [buf, jnp.zeros((bucket_len,), jnp.float32)]
                )
                wav = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(buf, (s,), (bucket_len,))
                )(sample_starts)
                idx = jnp.arange(bucket_len)[None, :]
                wav = jnp.where(idx < sample_lens[:, None], wav, 0.0)
            if use_f0 and devf0_frames is not None:
                # pitch/pitchf arrive as the full-signal (1, P) F0 output;
                # slice each row's window in-graph (pad first so the slices
                # never clamp near the end)
                pfull = jnp.pad(pitch[0], (0, p_len), constant_values=1)
                ffull = jnp.pad(pitchf[0], (0, p_len))
                pitch = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(pfull, (s,), (p_len,))
                )(starts)
                pitchf = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(ffull, (s,), (p_len,))
                )(starts)
            if use_f0:
                # rows sliced from the device-resident full-signal F0 carry
                # garbage past their valid length; mask to the same values
                # the host batch builder uses (pitch=1, pitchf=0)
                pitch = jnp.where(frame_mask > 0, pitch, 1)
                pitchf = jnp.where(frame_mask > 0, pitchf, 0.0)
            out_layer = (
                9 if (v1 and self.hubert_cfg.n_layers >= 9)
                else self.hubert_cfg.n_layers
            )
            # mask HuBERT's bucket-padding frames (True = padded): zeroed at
            # input and excluded from attention, so a chunk's features are
            # EXACTLY invariant to the bucket it rides in — per-batch
            # buckets, song-max batch-mode buckets, and any future shape
            # all render identically (and pad frames no longer bleed into
            # real frames through attention, unlike an unmasked pad)
            hub_pad_mask = (
                jnp.arange(hub_frames)[None, :] >= hub_valid[:, None]
            )
            feats = hubert_extract(
                hubert_params, self.hubert_cfg, wav,
                output_layer=out_layer, final_proj=v1, compute_dtype=cdt,
                padding_mask=hub_pad_mask, valid_samples=sample_lens,
            )
            feats0 = feats if use_protect else None
            if use_index:
                feats = retrieval_blend(
                    feats, bank, index_rate, k=self.engine.retrieval_k
                )
            feats = jnp.repeat(feats, 2, axis=1)[:, :p_len]
            if use_protect:
                feats0 = jnp.repeat(feats0, 2, axis=1)[:, :p_len]
                pff = jnp.where(pitchf > 0, 1.0, protect).astype(feats.dtype)[..., None]
                feats = feats * pff + feats0 * (1.0 - pff)
            x_mask = frame_mask[:, None, :].astype(cdt)
            audio = synthesizer_infer(
                synth_params, self.synth_cfg,
                feats, x_mask,
                pitch if use_f0 else None,
                pitchf if use_f0 else None,
                sid=sid, rng=row_keys, noise_scale=noise_scale,
                compute_dtype=cdt, use_pallas=use_pallas,
                noise_frames=noise_frames,
            )
            audio = audio.astype(jnp.float32)
            if emit == "raw":
                return audio
            # fused trim: valid frame count is the row's mask population
            upp = self.synth_cfg.upp
            t_pad_tgt = self.tgt_sr * self.engine.x_pad
            out_len = p_len * upp - 2 * t_pad_tgt
            valid = jnp.sum(frame_mask, axis=1).astype(jnp.int32)
            nvalid = jnp.maximum(valid * upp - 2 * t_pad_tgt, 0)
            rows = audio[:, t_pad_tgt : t_pad_tgt + out_len]
            idx = jnp.arange(out_len)[None, :]
            rows = jnp.where(idx < nvalid[:, None], rows, 0.0)
            if emit == "trimf":
                return rows
            absmax = jnp.max(jnp.abs(rows), axis=1)
            scale = 32767.0 / jnp.maximum(absmax, 1e-9)
            seg = jnp.round(rows * scale[:, None]).astype(jnp.int16)
            return seg, absmax

        jitted = jax.jit(step)

        def fn(wav, pitch, pitchf, starts, frame_mask, hub_valid,
               index_rate, protect, sid, key, chunk_ids, *dev_wav_args):
            return jitted(
                self.hubert_params, self.synth_params, self.index_bank,
                wav, pitch, pitchf, starts, frame_mask, hub_valid,
                index_rate, protect, sid, key, chunk_ids, *dev_wav_args,
            )

        fn._jitted = jitted  # introspection: prewarm zero-recompile test
        self._chunk_fns[key] = (fn, p_len)
        return self._chunk_fns[key]

    # ------------------------------------------------------------------
    # full pipeline
    # ------------------------------------------------------------------

    def _upload_preamble(self, audio16k):
        """High-pass + reflect pad + int16 quantize + async device upload
        of the whole signal (ONE C++ pass when the native toolchain
        exists, bit-identical to the python steps), then quiet-point chunk
        planning while the transfer streams. Single source for
        convert()/prewarm(): every graph's shapes and cache keys derive
        from this geometry, so a divergence between the two would compile
        an unwarmed graph at serving time."""
        eng = self.engine
        from ..ops.filters import highpass_filtfilt, highpass_filtfilt_pad_quant

        n_in = int(np.asarray(audio16k).shape[0])
        padded_len = n_in + 2 * eng.t_pad
        step_q = _F0_FRAME_BUCKET * 160
        bucket_q = max(int(np.ceil(padded_len / step_q)), 1) * step_q
        fused = highpass_filtfilt_pad_quant(
            np.asarray(audio16k, np.float64), eng.t_pad, bucket_q
        )
        if fused is not None:
            audio, qbuf, inv_scale = fused
            uploaded = (jnp.asarray(qbuf)[None], inv_scale, padded_len)
        else:
            audio = highpass_filtfilt(
                np.asarray(audio16k, np.float64)
            ).astype(np.float32)
            padded = np.pad(
                audio, (eng.t_pad, eng.t_pad), mode="reflect"
            ).astype(np.float32)
            uploaded = self._upload_audio(padded)
        audio_buf = uploaded[0]
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            audio_buf = replicate(audio_buf, self.mesh)
        plan = plan_chunks(audio, eng)  # padded_audio == padded bitwise
        return audio, uploaded, audio_buf, plan

    def _batch_geometry(self, plan):
        """Per-BATCH buckets: each batch of chunk_batch consecutive chunks
        compiles at the smallest bucket-grid size that fits its own chunks,
        not the song's longest chunk — quiet-point cuts drift +-t_query, so
        chunk lengths vary ~2x and song-max padding wastes 25-45% of chunk
        compute. Graph count stays bounded by the bucket grid. Shared by
        convert() and prewarm() (same cache keys by construction)."""
        eng = self.engine
        n_chunks = len(plan.chunks)
        B = eng.chunk_batch
        step_bucket = eng.bucket_step_s * eng.sample_rate
        batch_idxs = [
            list(range(g0, min(g0 + B, n_chunks)))
            for g0 in range(0, n_chunks, B)
        ]
        batch_bucket = [
            max(
                int(np.ceil(
                    (plan.chunks[ci].slice_end - plan.chunks[ci].slice_start)
                    / step_bucket
                )) * step_bucket
                for ci in idxs
            )
            for idxs in batch_idxs
        ]
        return batch_idxs, batch_bucket

    def _chunk_out_lengths(self, plan):
        """(valid frame count, trimmed output samples) per chunk — bucket-
        independent (any admitted bucket >= the chunk length)."""
        eng = self.engine
        upp = self.synth_cfg.upp
        t_pad_tgt = self.tgt_sr * eng.x_pad
        chunk_v = []
        for c in plan.chunks:
            slice_len = c.slice_end - c.slice_start
            chunk_v.append(min(slice_len // eng.window,
                               2 * self.hubert_cfg.num_frames(slice_len)))
        chunk_outn = [max(v * upp - 2 * t_pad_tgt, 0) for v in chunk_v]
        return chunk_v, chunk_outn


    def convert(
        self,
        audio16k: np.ndarray,
        opts: ConversionOptions = ConversionOptions(),
        progress: ProgressReporter = NULL_PROGRESS,
    ) -> tuple[np.ndarray, int]:
        """Full file-level conversion: float mono 16 kHz -> (int16, out_sr).

        Mirrors VC.pipeline (pipeline.py:289-467): high-pass, quiet-point
        chunking, one full-signal F0 pass, per-chunk conversion with pad
        trimming, RMS envelope mix, optional resample, int16 normalize.
        """
        eng = self.engine
        use_f0 = self.synth_cfg.use_f0
        progress(0.05, "high-pass filtering")
        # one int16 upload of the padded signal feeds the F0 graph, the
        # RMS1-envelope graph, AND the chunk graphs (which slice their
        # windows from it in-graph). Dispatched BEFORE chunk planning:
        # device_put is async, so the ~6 MB relay transfer streams while
        # the quiet-point search runs on host.
        audio, uploaded, audio_buf, plan = self._upload_preamble(audio16k)
        p_len_full = plan.padded_audio.shape[0] // eng.window

        rate_on = opts.volume_envelope != 1.0

        pitch_full = pitchf_full = None
        pitch_dev = pitchf_dev = None
        if use_f0:
            progress(0.15, f"extracting F0 ({opts.f0_method})")
            # rmvpe: dispatch the fused F0 graph and keep the result on
            # device — chunk graphs slice it there, so F0 overlaps host-side
            # chunk prep and nothing synchronizes until the final fetch
            dev = self.compute_f0_device(
                plan.padded_audio, p_len_full, opts, uploaded
            )
            if dev is not None:
                pitch_dev, pitchf_dev = dev
                if self.mesh is not None:
                    from ..parallel.mesh import replicate

                    # every data-shard slices from the same full-signal F0
                    pitch_dev = replicate(pitch_dev, self.mesh)
                    pitchf_dev = replicate(pitchf_dev, self.mesh)
            else:
                pitch_full, pitchf_full = self.compute_f0(
                    plan.padded_audio, p_len_full, opts, uploaded
                )

        use_index = self.index_bank is not None and opts.index_rate > 0
        use_protect = use_f0 and opts.protect < 0.5
        devf0_frames = (
            int(pitch_dev.shape[1]) if pitch_dev is not None else None
        )

        upp = self.synth_cfg.upp
        t_pad_tgt = self.tgt_sr * eng.x_pad
        window = eng.window
        rng = jax.random.PRNGKey(opts.seed)
        n_chunks = len(plan.chunks)
        B = eng.chunk_batch
        n_batches = -(-n_chunks // B)
        batch_idxs, batch_bucket = self._batch_geometry(plan)

        # every chunk's valid length and global output offset is known
        # up front — the RMS gain graphs need them before any fetch.
        chunk_v, chunk_outn = self._chunk_out_lengths(plan)
        chunk_off = np.concatenate([[0], np.cumsum(chunk_outn)])[:-1].astype(
            np.int64
        )
        n_out_total = int(sum(chunk_outn))
        hop2 = self.tgt_sr // 2

        rms1k = None
        if rate_on:
            # RMS1 knots of the source, from the shared upload
            rms1k = self._rms1_fn(uploaded[0].shape[1])(
                uploaded[0], uploaded[1], jnp.int32(eng.t_pad),
                jnp.int32(audio.shape[0]),
            )
            lay = self._gain_layout(
                plan, batch_idxs, batch_bucket, chunk_outn,
                audio.shape[0], uploaded[0].shape[1],
            )
            # gain rows live at the SONG-max width so neighborhoods from
            # different-bucket batches stack; the zero tail beyond a row's
            # own out_len adds an exact 0 to every knot sum
            out_len_max = lay["out_len_max"]
            gain_radius = lay["gain_radius"]
            zero_rows = jnp.zeros((B, out_len_max), jnp.float32)
            rows_fp: list = []
            gained: list = []

            def dispatch_gain(bi):
                """Gain + int16 for batch bi from its gain_radius-batch
                neighborhood (rows ascend in global order; zero rows add
                exactly 0)."""
                span = range(bi - gain_radius, bi + gain_radius + 1)
                stacked = jnp.concatenate(
                    [
                        rows_fp[bj] if 0 <= bj < len(rows_fp) else zero_rows
                        for bj in span
                    ],
                    axis=0,
                )
                offs = np.zeros((2 * gain_radius + 1) * B, np.int64)
                for j, bj in enumerate(span):
                    if 0 <= bj < n_batches:
                        for r in range(B):
                            ci = bj * B + r
                            if ci < n_chunks:
                                offs[j * B + r] = chunk_off[ci]
                k0 = max(0, int(chunk_off[min(bi * B, n_chunks - 1)])
                         // hop2 - 2)
                gfn = self._gain_rows_fn(
                    (2 * gain_radius + 1) * B, out_len_max, lay["nf1"],
                    gain_radius * B, (gain_radius + 1) * B,
                    lay["emit_lens"][bi],
                )
                g_rows, g_offs, g_rms1 = self._put_gain_args(
                    stacked, jnp.asarray(offs, jnp.int32), rms1k
                )
                return gfn(
                    g_rows, g_offs, g_rms1,
                    jnp.int32(lay["n1"]), jnp.int32(lay["n2"]),
                    jnp.int32(lay["n_out_total"]),
                    jnp.int32(k0), jnp.float32(opts.volume_envelope),
                )

        pending = []  # (device_out, valid_frames) — dispatch all, fetch later
        for bi, idxs in enumerate(batch_idxs):
            g0 = idxs[0]
            fn, p_len = self._chunk_fn(
                batch_bucket[bi], eng.chunk_batch,
                use_index=use_index, use_protect=use_protect, use_f0=use_f0,
                devf0_frames=devf0_frames,
                dev_wav_bucket=int(audio_buf.shape[1]),
                emit="trimf" if rate_on else "int16",
            )
            # device-side audio slicing: rows address the uploaded buffer;
            # padding rows read a zero-length window. Per-row noise keys
            # fold in the chunk index (packing-invariant).
            rowset = self._assemble_rows(
                [
                    (plan.chunks[ci], ci,
                     pitch_full if (use_f0 and pitch_dev is None) else None,
                     pitchf_full if (use_f0 and pitch_dev is None) else None)
                    for ci in idxs
                ],
                p_len,
            )
            valid_frames = rowset["valid_frames"]

            progress(0.3 + 0.6 * g0 / max(n_chunks, 1),
                     f"converting chunks {g0 + 1}-{idxs[-1] + 1}/{n_chunks}")
            sid_b = np.full((eng.chunk_batch,), opts.speaker_id, np.int32)
            if pitch_dev is not None:
                # (1, P) device-resident F0, already replicated over the mesh
                pitch_d, pitchf_d = pitch_dev, pitchf_dev
            else:
                pitch_d = self._put(rowset["pitch"])
                pitchf_d = self._put(rowset["pitchf"])
            out = fn(
                audio_buf, pitch_d, pitchf_d, self._put(rowset["starts"]),
                self._put(rowset["mask"]), self._put(rowset["hub_valid"]),
                jnp.float32(opts.index_rate), jnp.float32(opts.protect),
                self._put(sid_b), rng, self._put(rowset["ids"]),
                uploaded[1], self._put(rowset["samp_starts"]),
                self._put(rowset["samp_lens"]),
            )
            # async dispatch: don't synchronize here — later batches overlap
            # with this one's execution and with host-side prep
            pending.append((out, valid_frames))
            if rate_on:
                # out IS the trimmed masked rows (fused emit="trimf")
                rf = out
                if rf.shape[1] < out_len_max:
                    rf = jnp.pad(
                        rf, ((0, 0), (0, out_len_max - rf.shape[1]))
                    )
                rows_fp.append(rf)
                # gain_radius-batch lag: batch b's gain needs rows through
                # batch b+radius (RMS2 windows cross the boundary), so its
                # int16 fetch becomes available while later batches compute
                if len(rows_fp) >= gain_radius + 1:
                    gained.append(
                        dispatch_gain(len(rows_fp) - 1 - gain_radius)
                    )
        if rate_on:
            for tb in range(max(0, len(rows_fp) - gain_radius),
                            len(rows_fp)):
                gained.append(dispatch_gain(tb))

        # pipelined per-batch fetch: each np.asarray blocks only until ITS
        # batch finished + transferred, overlapping the remaining batches'
        # device compute with the host link
        if rate_on:
            packed = [
                (seg, am, vf)
                for (seg, am), (_, vf) in zip(gained, pending)
            ]
        else:
            # out IS (seg int16, absmax) — fused emit="int16"
            packed = [
                (seg_am[0], seg_am[1], vf) for seg_am, vf in pending
            ]

        progress(0.92, "fetching + finalizing")
        # the LAST batch's ~5 MB was the one transfer nothing overlapped
        # (no compute follows it): starting every copy up front hides it
        # behind the earlier batches' host-side row assembly
        for seg, absmax, _ in packed:
            self._start_host_copy(seg, absmax)
        rows = []
        for seg, absmax, valid_frames in packed:
            seg_h = np.asarray(seg)
            am_h = np.asarray(absmax)
            for row, v in enumerate(valid_frames):
                n = max(v * upp - 2 * t_pad_tgt, 0)
                if n:
                    rows.append((seg_h[row, :n], am_h[row]))
        audio_opt = self._rows_to_audio(rows)
        audio_int16, out_sr = self._host_finalize(audio_opt, opts)
        progress(1.0, "done")
        return audio_int16, out_sr