"""Long-form chunk planning with quiet-point cuts + static-shape bucketing.

Mirrors the reference's time-domain chunker (pipeline.py:330-344): when the
padded signal exceeds t_max, cut at the quietest sample (minimum sliding
window-sum magnitude) within +-t_query of every t_center multiple, rounded
down to a frame boundary. Each chunk is processed with +-t_pad reflect
context whose output is trimmed (pipeline.py:397).

TPU addition: chunks are padded to shared bucket lengths so one compiled
graph serves every chunk of a song (BASELINE: zero recompiles).
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from .config import EngineConfig


@dataclasses.dataclass
class Chunk:
    start: int        # content start in un-padded 16k samples
    end: int          # content end (exclusive)
    slice_start: int  # slice into the t_pad-padded signal
    slice_end: int


@dataclasses.dataclass
class ChunkPlan:
    chunks: List[Chunk]
    padded_audio: np.ndarray  # reflect-padded by t_pad on both sides
    bucket_len: int           # static per-chunk sample count (16k)


def find_cut_points(audio: np.ndarray, cfg: EngineConfig) -> list[int]:
    """Quiet-point cut sample indices (frame-aligned), reference semantics."""
    window = cfg.window
    audio_pad = np.pad(audio, (window // 2, window // 2), mode="reflect")
    if audio_pad.shape[0] <= cfg.t_max:
        return []
    # sliding sum of `window` consecutive samples
    csum = np.cumsum(np.concatenate([[0.0], audio_pad]))
    audio_sum = csum[window:] - csum[:-window]  # len == len(audio) + 1
    audio_sum = audio_sum[: audio.shape[0]]
    cuts = []
    for t in range(cfg.t_center, audio.shape[0], cfg.t_center):
        seg = np.abs(audio_sum[t - cfg.t_query : t + cfg.t_query])
        cut = t - cfg.t_query + int(np.argmin(seg))
        cuts.append(cut // window * window)
    return cuts


def plan_chunks(audio: np.ndarray, cfg: EngineConfig) -> ChunkPlan:
    """Split audio into overlapping padded chunks with a shared bucket size."""
    t_pad, window = cfg.t_pad, cfg.window
    padded = np.pad(audio, (t_pad, t_pad), mode="reflect").astype(np.float32)
    cuts = find_cut_points(audio, cfg)

    chunks = []
    s = 0
    for t in cuts:
        # reference slice: audio_pad[s : t + 2*t_pad + window]
        chunks.append(Chunk(start=s, end=t, slice_start=s,
                            slice_end=t + 2 * t_pad + window))
        s = t
    # final chunk: audio_pad[t:] (reference pipeline.py:416-447)
    chunks.append(Chunk(start=s, end=audio.shape[0], slice_start=s,
                        slice_end=padded.shape[0]))

    max_len = max(c.slice_end - c.slice_start for c in chunks)
    # bucket to a multiple of bucket_step_s seconds (already frame-aligned:
    # 4 s * 16000 = 400 * window) so few distinct shapes ever compile
    step = cfg.bucket_step_s * cfg.sample_rate
    bucket_len = int(np.ceil(max_len / step)) * step
    return ChunkPlan(chunks=chunks, padded_audio=padded, bucket_len=bucket_len)


def gather_chunk_batch(plan: ChunkPlan, chunk_indices, cfg: EngineConfig):
    """Stack chunks into a (B, bucket_len) matrix + per-chunk valid lengths."""
    b = len(chunk_indices)
    out = np.zeros((b, plan.bucket_len), np.float32)
    lengths = np.zeros(b, np.int64)
    for row, ci in enumerate(chunk_indices):
        c = plan.chunks[ci]
        seg = plan.padded_audio[c.slice_start : c.slice_end]
        out[row, : seg.shape[0]] = seg
        lengths[row] = seg.shape[0]
    return out, lengths
