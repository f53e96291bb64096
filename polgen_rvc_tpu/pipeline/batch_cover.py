"""Batch cover generation: multi-song packed data parallelism.

Mixin half of VoiceConverter (pipeline/engine.py) — chunks from different
songs pack into shared per-bucket-class batches (SURVEY §2.2's scaling
axis); rendering is packing- and bucket-invariant (fixed-shape noise
draws), so packed output matches serial conversions.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.filters import highpass_filtfilt
from ..utils.progress import NULL_PROGRESS, ProgressReporter
from .chunking import plan_chunks
from .config import ConversionOptions
from .f0_dispatch import _F0_FRAME_BUCKET


class BatchCoverMixin:
    """convert_batch half of VoiceConverter (engine.py hosts the class)."""

    def convert_batch(
        self,
        audios: list,
        opts: "ConversionOptions" = None,
        progress: ProgressReporter = NULL_PROGRESS,
    ) -> list:
        """Batch cover generation: true multi-song data parallelism.

        Chunks from DIFFERENT songs pack into the same bucketed chunk
        batches, so a wide data mesh stays full even on short songs
        (PARITY §5 / SURVEY §2.2's scaling axis). Flow: every song's F0
        graph is dispatched before anything synchronizes, then a global
        work list of (song, chunk) pairs is packed bucket-by-bucket into
        shared batches, each batch trims + int16-packs on device (per-row
        scales keep rendering packing-invariant), and songs assemble on
        host from the pipelined fetches. Songs fall back to serial
        conversion only when they need host-side F0 (f0 file, crepe/fcpe).
        On a multi-host deployment, shard the song list
        across hosts — songs are independent, so the only DCN traffic is
        the work split.
        """
        opts = opts or ConversionOptions()
        eng = self.engine
        use_f0 = self.synth_cfg.use_f0
        n_songs = len(audios)
        if n_songs == 0:
            return []
        serial_needed = use_f0 and (
            opts.f0_method not in ("rmvpe+", "rmvpe") or bool(opts.f0_file)
            or self.rmvpe_params is None
        )
        if serial_needed:
            results = []
            for i, audio in enumerate(audios):
                progress(i / n_songs, f"song {i + 1}/{n_songs}")
                results.append(self.convert(np.asarray(audio), opts))
            progress(1.0, "batch done")
            return results

        # 1) per-song prep + F0 dispatch (no sync yet)
        progress(0.05, f"planning {n_songs} songs + dispatching F0")
        from ..ops.filters import highpass_filtfilt_pad_quant

        rate_on = opts.volume_envelope != 1.0
        songs = []
        for audio in audios:
            # same fused C++ head as convert() (bit-identical fallback)
            n_in = int(np.asarray(audio).shape[0])
            t = n_in + 2 * eng.t_pad
            step_q = _F0_FRAME_BUCKET * 160
            bucket_q = max(int(np.ceil(t / step_q)), 1) * step_q
            fused = highpass_filtfilt_pad_quant(
                np.asarray(audio, np.float64), eng.t_pad, bucket_q
            )
            if fused is not None:
                audio, qbuf, inv_scale = fused
            else:
                audio = highpass_filtfilt(
                    np.asarray(audio, np.float64)
                ).astype(np.float32)
                padded = np.pad(
                    audio, (eng.t_pad, eng.t_pad), mode="reflect"
                ).astype(np.float32)
                qbuf, inv_scale, t = self._quantize_audio(padded)
            plan = plan_chunks(audio, eng)
            p_len_full = plan.padded_audio.shape[0] // eng.window
            rec = {"audio": audio, "plan": plan, "p_len_full": p_len_full}
            # chunk rows gather on host here (batches mix songs, so rows
            # cannot all slice one device buffer) — from the DEQUANTIZED
            # signal, so packed rows are bit-identical to convert()'s
            # device-sliced rows
            plan.padded_audio = qbuf[:t].astype(np.float32) * inv_scale
            if use_f0 or rate_on:
                rec["uploaded"] = (jnp.asarray(qbuf)[None], inv_scale, t)
            if use_f0:
                _, pitch, pitchf, n = self._rmvpe_dispatch(
                    plan.padded_audio, opts, rec["uploaded"]
                )
                rec["pitch_d"], rec["pitchf_d"], rec["n"] = pitch, pitchf, n
            songs.append(rec)

        # 2) one synchronization point: fetch every song's (small) F0 arrays
        if use_f0:
            for rec in songs:
                p = rec["p_len_full"]
                rec["pitch"] = np.asarray(rec["pitch_d"][0, :p])
                rec["pitchf"] = np.asarray(rec["pitchf_d"][0, :p])

        # 3) global work list grouped by each CHUNK's own bucket class
        #    (the smallest bucket-grid size that fits it) — not the song's
        #    max bucket: quiet-point cuts drift +-t_query, so chunk lengths
        #    vary ~2x within a song and song-max padding wastes 25-45% of
        #    chunk compute. Bit-equality with serial convert() survives any
        #    bucketing because the noise draws are fixed-shape
        #    (bucket-invariant) and the masked models are pad-invariant.
        step_bucket = eng.bucket_step_s * eng.sample_rate
        work_by_bucket: dict = {}
        for si, rec in enumerate(songs):
            for ci, c in enumerate(rec["plan"].chunks):
                cls = -(-(c.slice_end - c.slice_start) // step_bucket) \
                    * step_bucket
                work_by_bucket.setdefault(cls, []).append((si, ci))

        use_index = self.index_bank is not None and opts.index_rate > 0
        use_protect = use_f0 and opts.protect < 0.5
        upp = self.synth_cfg.upp
        t_pad_tgt = self.tgt_sr * eng.x_pad
        rng = jax.random.PRNGKey(opts.seed)

        # song -> list of (chunk id, bucket, bucket-local batch index, row,
        # valid); a song's chunks may ride batches of DIFFERENT buckets, so
        # every placement carries its bucket and finalize sorts by chunk id
        placements: list[list] = [[] for _ in songs]
        bucket_outputs: dict = {}
        total_work = sum(len(v) for v in work_by_bucket.values())
        done_work = 0
        for bucket_len, work in sorted(work_by_bucket.items()):
            batch_outputs = bucket_outputs.setdefault(bucket_len, [])
            fn, p_len = self._chunk_fn(
                bucket_len, eng.chunk_batch, use_index=use_index,
                use_protect=use_protect, use_f0=use_f0,
                emit="trimf" if rate_on else "int16",
            )
            for g0 in range(0, len(work), eng.chunk_batch):
                group = work[g0 : g0 + eng.chunk_batch]
                wav = np.zeros((eng.chunk_batch, bucket_len), np.float32)
                for row, (si, ci) in enumerate(group):
                    c = songs[si]["plan"].chunks[ci]
                    seg = songs[si]["plan"].padded_audio[
                        c.slice_start : c.slice_end
                    ]
                    wav[row, : seg.shape[0]] = seg
                # per-row noise keys fold in the SONG-LOCAL chunk index, so a
                # packed row renders bit-identically to its serial conversion
                rowset = self._assemble_rows(
                    [
                        (songs[si]["plan"].chunks[ci], ci,
                         songs[si]["pitch"] if use_f0 else None,
                         songs[si]["pitchf"] if use_f0 else None)
                        for si, ci in group
                    ],
                    p_len,
                )
                for row, (si, ci) in enumerate(group):
                    placements[si].append(
                        (ci, bucket_len, len(batch_outputs), row,
                         rowset["valid_frames"][row])
                    )
                done_work += len(group)
                progress(0.2 + 0.55 * done_work / max(total_work, 1),
                         f"converting {done_work}/{total_work} chunks")
                sid_b = np.full((eng.chunk_batch,), opts.speaker_id, np.int32)
                starts_b = np.zeros(eng.chunk_batch, np.int32)
                out = fn(
                    self._put(wav), self._put(rowset["pitch"]),
                    self._put(rowset["pitchf"]), self._put(starts_b),
                    self._put(rowset["mask"]), self._put(rowset["hub_valid"]),
                    jnp.float32(opts.index_rate), jnp.float32(opts.protect),
                    self._put(sid_b), rng, self._put(rowset["ids"]),
                    None, None, self._put(rowset["samp_lens"]),
                )
                # trim is fused into the chunk graph (emit): with the RMS
                # envelope on, `out` is the masked f32 rows for the
                # per-song gain graphs; otherwise it's (int16 rows, absmax)
                # quantized per-row (packing-invariant — a row's bytes do
                # not depend on what else rides the batch), ready to fetch
                # pipelined behind later batches' compute.
                batch_outputs.append(out)

        # 4) per-song finalize. With the RMS envelope on, each song's rows
        #    (ascending output order, gathered from the shared batches) run
        #    one whole-song gain graph — the sequential-sum knot math makes
        #    its RMS2 values bit-identical to convert()'s windowed graphs,
        #    so packed output equals serial output exactly.
        progress(0.85, "fetching + finalizing songs")
        hop2 = self.tgt_sr // 2
        # pass 1 — dispatch every song's gain graph (device) and start
        # every device->host copy, so the per-song fetches below stream
        # concurrently instead of serializing compute->copy per song
        song_fetch: list[tuple] = []
        pending_raw: dict = {}
        for si, rec in enumerate(songs):
            # ascending chunk id == ascending global output order (the gain
            # graph's sequential knot sums require it for bit-equality)
            my = sorted(placements[si])
            out_lens = [
                max(v * upp - 2 * t_pad_tgt, 0) for _, _, _, _, v in my
            ]
            n_out = int(sum(out_lens))
            offsets = np.concatenate(
                [[0], np.cumsum(out_lens)]
            )[:-1].astype(np.int64)
            if rate_on and my:
                # Per-row ±radius neighborhood gain dispatches — the same
                # geometry as convert()'s streaming dispatch_gain, NOT one
                # whole-song row set (which round 4 measured SLOWER than
                # serial: every knot summed over all of a song's rows and
                # every row was padded to the song's widest bucket). Rows
                # outside a knot's window add an exact 0.0 to its
                # sequential sum, so the emitted bytes are bit-identical
                # to both the whole-song formulation and serial convert().
                raw_rows = [
                    bucket_outputs[b][bi][row] for _, b, bi, row, _ in my
                ]
                out_len = max(r.shape[0] for r in raw_rows)
                row_list = [
                    jnp.pad(r, (0, out_len - r.shape[0]))
                    if r.shape[0] < out_len else r
                    for r in raw_rows
                ]
                up = rec["uploaded"]
                rms1k = self._rms1_fn(up[0].shape[1])(
                    up[0], up[1], jnp.int32(eng.t_pad),
                    jnp.int32(rec["audio"].shape[0]),
                )
                n1 = 1 + rec["audio"].shape[0] // (eng.sample_rate // 2)
                n2 = 1 + n_out // hop2
                nf1 = 1 + up[0].shape[1] // 8000
                # radius rule mirrors _gain_layout: one neighbor per side
                # covers the ~3*hop2 knot/interp reach whenever every
                # middle row spans >= 3*hop2; degenerate short-chunk
                # configs widen it (bit-identical either way)
                n_my = len(my)
                radius = 1
                if n_my > 2:
                    min_mid = min(out_lens[1:-1])
                    if min_mid < 3 * hop2:
                        radius = min(
                            n_my - 1,
                            int(np.ceil(3 * hop2 / max(min_mid, 1))),
                        )
                zero_row = jnp.zeros((out_len,), jnp.float32)
                segs = []
                for i in range(n_my):
                    span = range(i - radius, i + radius + 1)
                    stacked = jnp.stack(
                        [
                            row_list[j] if 0 <= j < n_my else zero_row
                            for j in span
                        ],
                        axis=0,
                    )
                    offs = np.zeros(2 * radius + 1, np.int64)
                    for k, j in enumerate(span):
                        if 0 <= j < n_my:
                            offs[k] = offsets[j]
                    k0 = max(0, int(offsets[i]) // hop2 - 2)
                    gfn = self._gain_rows_fn(
                        2 * radius + 1, out_len, nf1, radius, radius + 1,
                        int(raw_rows[i].shape[0]),
                    )
                    g_rows, g_offs, g_rms1 = self._put_gain_args(
                        stacked, jnp.asarray(offs, jnp.int32), rms1k
                    )
                    seg, am = gfn(
                        g_rows, g_offs, g_rms1,
                        jnp.int32(n1), jnp.int32(n2), jnp.int32(n_out),
                        jnp.int32(k0), jnp.float32(opts.volume_envelope),
                    )
                    self._start_host_copy(seg, am)
                    segs.append((seg, am))
                song_fetch.append(("gain_rows", segs, out_lens))
            else:
                for _, b, bi, _, _ in my:
                    key = (b, bi)
                    if key not in pending_raw:
                        seg, absmax = bucket_outputs[b][bi]
                        self._start_host_copy(seg, absmax)
                        pending_raw[key] = (seg, absmax)
                song_fetch.append(("raw", my, out_lens))

        # pass 2 — fetch (each blocks only on its own in-flight copy) and
        # finalize on host
        results = []
        fetched: dict = {}
        for entry in song_fetch:
            if entry[0] == "gain_rows":
                _, segs, out_lens = entry
                rows = []
                for (seg, am), n in zip(segs, out_lens):
                    if n:
                        rows.append((np.asarray(seg)[0, :n],
                                     float(np.asarray(am)[0])))
            else:
                _, my, out_lens = entry
                rows = []
                for (_, b, bi, row, v), n in zip(my, out_lens):
                    key = (b, bi)
                    if key not in fetched:
                        seg, absmax = pending_raw[key]
                        fetched[key] = (np.asarray(seg), np.asarray(absmax))
                    seg_h, am_h = fetched[key]
                    if n:
                        rows.append((seg_h[row, :n], am_h[row]))
            audio_opt = self._rows_to_audio(rows)
            results.append(self._host_finalize(audio_opt, opts))
        progress(1.0, "batch done")
        return results

