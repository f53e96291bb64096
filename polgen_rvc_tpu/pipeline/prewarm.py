"""prewarm(): concurrent heavy-graph loading for zero-compile serving.

Mixin half of VoiceConverter (pipeline/engine.py). In a remote-PJRT
deployment (device behind a network relay), loading one cached chunk-graph
executable costs ~90 s even on persistent-cache hits, so the first
convert() of a song would pay ~5 back-to-back loads; prewarm issues them
from a thread pool using EXACTLY convert()'s graph keys and argument
placement (tests/test_pipeline.py pins the zero-recompile contract).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .config import ConversionOptions


class PrewarmMixin:
    """Prewarm half of VoiceConverter (engine.py hosts the converter)."""

    def prewarm(self, audio16k: np.ndarray,
                opts: ConversionOptions = ConversionOptions(),
                max_workers: int = 8) -> int:
        """Compile/load every heavyweight graph a convert() of this signal
        will dispatch — CONCURRENTLY. Returns the number of graphs warmed.

        In a remote-PJRT deployment (device behind a network relay, as
        here), loading one cached chunk-graph executable takes ~90 s —
        per graph, even on persistent-cache hits — so the first convert()
        of a song pays ~5 back-to-back loads. Those loads are
        relay/deserialize-bound, not device-bound, so a thread pool
        overlaps them. Host-side only: graphs, shapes, and cache keys are
        exactly convert()'s (argument construction goes through the same
        _assemble_rows/_put helpers; tests/test_pipeline.py asserts a
        prewarmed convert() triggers zero new compilations).
        """
        eng = self.engine
        use_f0 = self.synth_cfg.use_f0
        audio, uploaded, audio_buf, plan = self._upload_preamble(audio16k)
        p_len_full = plan.padded_audio.shape[0] // eng.window
        rate_on = opts.volume_envelope != 1.0
        use_index = self.index_bank is not None and opts.index_rate > 0
        use_protect = use_f0 and opts.protect < 0.5
        emit = "trimf" if rate_on else "int16"
        rng = jax.random.PRNGKey(opts.seed)

        tasks = []
        devf0_frames = None
        pitch_dev = pitchf_dev = None
        devf0_rmvpe = (
            use_f0 and opts.f0_method in ("rmvpe+", "rmvpe")
            and not opts.f0_file and self.rmvpe_params is not None
        )
        devf0_fcpe = (
            use_f0 and opts.f0_method == "fcpe" and not opts.f0_file
            and self.fcpe_params is not None and self.fcpe_cfg is not None
            and self.fcpe_cfg.hop_size == eng.window
        )
        devf0_crepe = (
            use_f0 and opts.f0_method == "mangio-crepe" and not opts.f0_file
            and self.crepe_params is not None
        )
        devf0_wanted = devf0_rmvpe or devf0_fcpe or devf0_crepe
        if devf0_rmvpe:
            # the F0 graph is itself one of the heavy loads: dispatch it
            # from the pool like the chunk graphs. Its (1, P) output shape
            # keys the chunk graphs (devf0_frames), so get P by abstract
            # evaluation — no compile, no execution.
            f0fn = self._f0_fn(int(audio_buf.shape[1]),
                               opts.f0_min, opts.f0_max)
            out_sh = jax.eval_shape(
                f0fn, self.rmvpe_params,
                jax.ShapeDtypeStruct((1, int(audio_buf.shape[1])), jnp.int16),
                jax.ShapeDtypeStruct((), jnp.float32), 0.03,
                jax.ShapeDtypeStruct((), jnp.float32),
            )
            devf0_frames = int(out_sh[1].shape[1])
            tasks.append((
                lambda: self._rmvpe_dispatch(plan.padded_audio, opts,
                                             uploaded)[:3],
                None,
            ))
            # shape/dtype/placement stand-ins for the chunk graphs' pitch
            # rows, exactly like the fcpe/crepe branches below: convert()
            # feeds the chunk graphs device-resident (1, P) F0 (engine.py
            # pitch_dev), so prewarm tracing with host-shaped (B, p_len)
            # rows would warm a DIFFERENT executable and re-pay the graph
            # load at first serve (the round-4 zero-recompile regression).
            pitch_dev = jnp.ones((1, devf0_frames), jnp.int32)
            pitchf_dev = jnp.zeros((1, devf0_frames), jnp.float32)
            if self.mesh is not None:
                pitch_dev = self._put(pitch_dev, replicated=True)
                pitchf_dev = self._put(pitchf_dev, replicated=True)
        elif devf0_fcpe:
            # the fused fcpe graph emits (1, bucket//hop + 1) — same shape
            # family as rmvpe, so the chunk graphs are shared between the
            # two methods
            devf0_frames = (
                int(audio_buf.shape[1]) // self.fcpe_cfg.hop_size + 1
            )
            tasks.append((
                lambda: self._fcpe_dispatch_device(
                    plan.padded_audio, p_len_full, opts, uploaded
                ),
                None,
            ))
            # shape/dtype/placement stand-ins for the chunk graphs' pitch
            # rows (values are irrelevant to compilation)
            pitch_dev = jnp.ones((1, devf0_frames), jnp.int32)
            pitchf_dev = jnp.zeros((1, devf0_frames), jnp.float32)
            if self.mesh is not None:
                pitch_dev = self._put(pitch_dev, replicated=True)
                pitchf_dev = self._put(pitchf_dev, replicated=True)
        elif devf0_crepe:
            # fused salience slabs + scan-Viterbi decode emit
            # (1, bucket//160 + 1) — the same shape family as rmvpe/fcpe,
            # so the chunk graphs are shared across all three methods
            devf0_frames = int(audio_buf.shape[1]) // 160 + 1
            tasks.append((
                lambda: self._crepe_dispatch_device(
                    plan.padded_audio, p_len_full, opts, uploaded
                ),
                None,
            ))
            pitch_dev = jnp.ones((1, devf0_frames), jnp.int32)
            pitchf_dev = jnp.zeros((1, devf0_frames), jnp.float32)
            if self.mesh is not None:
                pitch_dev = self._put(pitch_dev, replicated=True)
                pitchf_dev = self._put(pitchf_dev, replicated=True)
        if use_f0 and not devf0_wanted:
            # fcpe/crepe (and f0-file) path: the salience graph is itself a
            # heavy load — warm it from the pool. The chunk graphs below
            # only need SHAPE-correct pitch rows, which _assemble_rows
            # produces without real F0 values.
            tasks.append((
                lambda: self.compute_f0(plan.padded_audio, p_len_full, opts,
                                        uploaded),
                None,
            ))

        B = eng.chunk_batch
        batch_idxs, batch_bucket = self._batch_geometry(plan)
        seen = set()
        for idxs, bucket in zip(batch_idxs, batch_bucket):
            if bucket in seen:
                continue
            seen.add(bucket)
            fn, p_len = self._chunk_fn(
                bucket, B, use_index=use_index, use_protect=use_protect,
                use_f0=use_f0, devf0_frames=devf0_frames,
                dev_wav_bucket=int(audio_buf.shape[1]), emit=emit,
            )
            rowset = self._assemble_rows(
                [(plan.chunks[ci], ci, None, None) for ci in idxs],
                p_len,
            )
            if pitch_dev is not None:
                pitch_d, pitchf_d = pitch_dev, pitchf_dev
            else:
                pitch_d = self._put(rowset["pitch"])
                pitchf_d = self._put(rowset["pitchf"])
            sid_b = np.full((B,), opts.speaker_id, np.int32)
            args = (
                audio_buf, pitch_d, pitchf_d, self._put(rowset["starts"]),
                self._put(rowset["mask"]), self._put(rowset["hub_valid"]),
                jnp.float32(opts.index_rate), jnp.float32(opts.protect),
                self._put(sid_b), rng, self._put(rowset["ids"]),
                uploaded[1], self._put(rowset["samp_starts"]),
                self._put(rowset["samp_lens"]),
            )
            tasks.append((fn, args))

        if rate_on:
            # the RMS1 + per-bucket gain graphs load from the pool too
            # (same _gain_rows_fn keys as convert(): _gain_layout is the
            # single source of the emit geometry)
            _, chunk_outn = self._chunk_out_lengths(plan)
            lay = self._gain_layout(
                plan, batch_idxs, batch_bucket, chunk_outn,
                audio.shape[0], int(audio_buf.shape[1]),
            )
            rms1fn = self._rms1_fn(int(audio_buf.shape[1]))
            tasks.append((
                lambda: rms1fn(uploaded[0], uploaded[1],
                               jnp.int32(eng.t_pad),
                               jnp.int32(audio.shape[0])),
                None,
            ))
            n_rows = (2 * lay["gain_radius"] + 1) * B
            # stand-ins carry convert()'s exact placement (_put_gain_args):
            # jit keys include sharding, so an unsharded zeros here would
            # warm a DIFFERENT executable than convert() dispatches on a mesh
            zrows, zoffs, zrms = self._put_gain_args(
                jnp.zeros((n_rows, lay["out_len_max"]), jnp.float32),
                jnp.zeros(n_rows, jnp.int32),
                jnp.zeros(lay["nf1"], jnp.float32),
            )
            for emit_len in sorted(set(lay["emit_lens"])):
                gfn = self._gain_rows_fn(
                    n_rows, lay["out_len_max"], lay["nf1"],
                    lay["gain_radius"] * B, (lay["gain_radius"] + 1) * B,
                    emit_len,
                )
                tasks.append((gfn, (
                    zrows, zoffs, zrms, jnp.int32(lay["n1"]),
                    jnp.int32(lay["n2"]), jnp.int32(lay["n_out_total"]),
                    jnp.int32(0), jnp.float32(opts.volume_envelope),
                )))

        def run(task):
            fn, args = task
            return fn() if args is None else fn(*args)

        if len(tasks) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(max_workers, len(tasks))
            ) as pool:
                outs = list(pool.map(run, tasks))
        else:
            outs = [run(t) for t in tasks]
        # block until every graph finished (loads are the cost; the zero
        # executions behind them are milliseconds)
        for out in outs:
            jax.tree.map(
                lambda x: x.block_until_ready()
                if hasattr(x, "block_until_ready") else x,
                out,
            )
        return len(tasks)
