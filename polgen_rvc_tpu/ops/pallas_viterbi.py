"""Pallas TPU kernel: banded Viterbi decode for the CREPE F0 path.

models/crepe.py's viterbi_path_device expresses the same recursion as a
lax.scan, but XLA lowers each of the ~15 tiny (360,)-element ops in the
scan body to its own VPU dispatch: measured ~80 us per timestep on a v5e
— 1.86 s for a 3-minute song at hop 128, the whole gap between the
mangio-crepe path and the >=100x RTF target (tools/profile_crepe_device.py).
Here the entire forward recursion runs INSIDE one kernel (a fori_loop over
a 1024-step time block; the Pallas grid streams blocks and the dp row
carries across grid steps in VMEM scratch, so observation loads and
backpointer stores double-buffer automatically), and a second
reverse-order kernel walks the backpointers.

Semantics are BIT-identical to viterbi_path_device (torchcrepe
decode.viterbi, reference pipeline.py:86-117): triangular band transitions,
log(p + 1e-20) smoothing with the out-of-band "teleport" candidate from the
previous row's global argmax, first-index argmax tie rules, f32 dp with
per-step renormalization, and pass-through rows for t >= n. Parity
(including adversarial exact ties) is pinned in tests/test_f0_methods.py
via interpret mode; the kernel is enabled only on TPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PITCH_BINS = 360
LANES = 384  # 360 padded to 3 x 128 lanes
BLK = 1024   # timesteps per grid block

_NEG_INF = np.float32(-np.inf)


def _band_rows(width: int, n_bins: int) -> np.ndarray:
    """(2*width, LANES) f32: row (d + half) holds band[j, d] = log_trans
    [j+d, j] at lane j (-inf outside [0, n_bins) on either side), padded to
    a sublane multiple. Same values as viterbi_path_device's band."""
    from ..models.crepe import _transition_matrix

    half = width - 1
    log_trans = np.log(_transition_matrix(width) + 1e-20)
    rows = np.full((2 * width, LANES), _NEG_INF, np.float32)
    j = np.arange(n_bins)
    for d in range(-half, half + 1):
        src = j + d
        ok = (src >= 0) & (src < n_bins)
        rows[d + half, j[ok]] = log_trans[src[ok], j[ok]]
    return rows


def _fwd_kernel(n_ref, obs_ref, band_ref, back_ref, dp_out_ref, dp_ref, *,
                half: int, log_eps: float, log_init: float, blk: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    n = n_ref[0]
    t0 = pl.program_id(0) * blk  # hoisted: program_id is kernel-top-only

    def step(k, _):
        t = t0 + k
        obs_t = obs_ref[pl.ds(k, 1), :]  # (1, LANES), pad lanes are -inf

        @pl.when(t == 0)
        def _():
            dp_ref[:] = log_init + obs_t
            back_ref[pl.ds(k, 1), :] = lane  # row 0: never read

        @pl.when(t > 0)
        def _():
            dp = dp_ref[:]
            maxv = jnp.max(dp)
            # first-index global argmax (numpy tie rule)
            m = jnp.min(jnp.where(dp == maxv, lane, LANES))
            eps_cand = maxv + np.float32(log_eps)
            best = jnp.full((1, LANES), _NEG_INF, jnp.float32)
            bi = jnp.zeros((1, LANES), jnp.int32)
            for d in range(-half, half + 1):
                # cand_d[j] = dp[j + d] + band[j, d]: the roll wraps lanes
                # >= 360 (kept at -inf) and the band rows are -inf wherever
                # j + d falls outside [0, 360), so wrapped values never win.
                # (d == 0 skips the roll: Mosaic rejects the zero-size
                # slice a no-op jnp.roll decomposes into)
                shifted = dp if d == 0 else jnp.roll(dp, -d, axis=1)
                cand = shifted + band_ref[pl.ds(d + half, 1), :]
                take = cand > best  # strict: ties keep the lowest d
                best = jnp.where(take, cand, best)
                bi = jnp.where(take, lane + d, bi)
            # out-of-band candidate: every such transition scores exactly
            # log_eps, so the winner is the previous row's global argmax;
            # on an exact tie the dense scan keeps the lower source index
            take_eps = (eps_cand > best) | ((eps_cand == best) & (m < bi))
            best = jnp.where(take_eps, eps_cand, best)
            bi = jnp.where(take_eps, m, bi)
            dp_new = best + obs_t
            dp_new = dp_new - jnp.max(dp_new)  # renorm keeps f32 at full res
            valid = t < n  # rows past n: dp unchanged, identity backpointer
            dp_ref[:] = jnp.where(valid, dp_new, dp)
            back_ref[pl.ds(k, 1), :] = jnp.where(valid, bi, lane)

        return 0

    jax.lax.fori_loop(0, blk, step, 0)
    dp_out_ref[:] = dp_ref[:]


def _bwd_kernel(end_ref, back_ref, path_ref, cur_ref, row_ref, *, blk: int):
    i = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    blk_lane = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    t0 = (pl.num_programs(0) - 1 - i) * blk

    @pl.when(i == 0)
    def _():
        cur_ref[0] = end_ref[0]

    def step(kk, _):
        k = blk - 1 - kk
        t = t0 + k
        cur = cur_ref[0]
        row_ref[:] = jnp.where(blk_lane == k, cur, row_ref[:])

        @pl.when(t > 0)
        def _():
            back_row = back_ref[pl.ds(k, 1), :]
            cur_ref[0] = jnp.sum(jnp.where(lane == cur, back_row, 0))

        return 0

    jax.lax.fori_loop(0, blk, step, 0)
    path_ref[:] = row_ref[:]


def viterbi_path_pallas(log_obs, n, width: int = 12,
                        interpret: bool = False, blk: int = BLK):
    """(T, 360) f32 log observations -> (T,) int32 path. Same contract as
    models.crepe.viterbi_path_device: n is the dynamic valid-frame count,
    rows t >= n are pass-through. T may be any length; it is padded to a
    BLK multiple with pass-through rows (bit-equivalent: the backtrace
    walks identity pointers down from the padded tail)."""
    t_len, n_bins = log_obs.shape
    assert n_bins == PITCH_BINS, n_bins
    if t_len == 0:
        return jnp.zeros((0,), jnp.int32)
    half = width - 1
    t_pad = (-t_len) % blk
    n_blocks = (t_len + t_pad) // blk
    obs = jnp.pad(
        log_obs.astype(jnp.float32),
        ((0, t_pad), (0, LANES - PITCH_BINS)),
        constant_values=_NEG_INF,
    )
    band = jnp.asarray(_band_rows(width, PITCH_BINS))
    n_arr = jnp.minimum(jnp.asarray(n, jnp.int32), t_len).reshape(1)

    back, dp_fin = pl.pallas_call(
        functools.partial(
            _fwd_kernel, half=half,
            log_eps=float(np.log(1e-20)),
            log_init=float(np.log(1.0 / PITCH_BINS)), blk=blk,
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((blk, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * width, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * blk, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, LANES), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.float32)],
        interpret=interpret,
    )(n_arr, obs, band)

    # first-index argmax of the final dp over the real bins
    end = jnp.argmax(dp_fin[0, :PITCH_BINS]).astype(jnp.int32).reshape(1)

    path = pl.pallas_call(
        functools.partial(_bwd_kernel, blk=blk),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((blk, LANES), lambda i, nb=n_blocks: (nb - 1 - i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blk), lambda i, nb=n_blocks: (0, nb - 1 - i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((1, n_blocks * blk), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((1, blk), jnp.int32),
        ],
        interpret=interpret,
    )(end, back)

    return path[0, :t_len]
