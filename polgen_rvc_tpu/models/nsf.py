"""NSF-source HiFi-GAN decoder as pure JAX functions.

Capability parity with the reference decoder stack
(/root/reference/rvc/lib/algorithm/generators.py:94-156, nsf.py:14-144,
residuals.py:15-67): harmonic sine source from F0, per-stage transposed-conv
upsampling with source injection, multi-kernel residual blocks, tanh output.

TPU-first redesign of the sine source: the reference accumulates phase with
an audio-rate cumsum plus wrap-correction bookkeeping (generators.py:126-147).
Since the wrap corrections subtract whole cycles they cannot change sin(2*pi*x);
we instead compute phase in closed form from a frame-rate cumsum —
  phase[f*upp + k] = cumsum_frames(frac(upp * rad_f))[f] + (k+1) * rad_f[f]
— eliminating the multi-million-element sequential dependency entirely and
keeping every term small enough for fp32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.conv import conv1d, conv_transpose1d
from .synthesizer import SynthesizerConfig

LRELU_SLOPE = 0.1


# ---------------------------------------------------------------------------
# harmonic source
# ---------------------------------------------------------------------------


def sine_source(
    f0,
    upp: int,
    sample_rate: int,
    *,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
    rng: Optional[jax.Array] = None,
    noise_samples: Optional[int] = None,
):
    """F0 frames -> audio-rate sine + gated noise (SineGen, harmonic_num=0).

    f0: (B, T) Hz at frame rate. Returns (B, T * upp) source signal.
    With harmonic_num=0 the reference zeroes its random initial phase
    (generators.py:127-129), so the sine itself is deterministic; only the
    additive noise consumes randomness.

    noise_samples: when set (>= T*upp), noise draws at this FIXED length
    and slices to T*upp — the drawn sequence then does not depend on the
    graph's padded length, so a chunk renders bit-identically whatever
    bucket its batch compiled at (bucket-invariant rendering).
    """
    f0 = f0.astype(jnp.float32)
    rad_f = jnp.mod(f0 / sample_rate, 1.0)  # cycles per input sample, (B, T)

    # frame-level phase accumulation, kept mod 1 for fp32 health
    per_frame = jnp.mod(rad_f * upp, 1.0)
    cum = jnp.cumsum(per_frame, axis=-1)
    start_phase = jnp.mod(cum - per_frame, 1.0)  # exclusive cumsum, mod 1

    # within-frame ramp: sample k of frame f advances (k+1) * rad_f[f]
    k = jnp.arange(1, upp + 1, dtype=jnp.float32)
    phase = start_phase[..., :, None] + rad_f[..., :, None] * k[None, :]
    phase = phase.reshape(f0.shape[:-1] + (f0.shape[-1] * upp,))

    sine = jnp.sin(2.0 * jnp.pi * phase) * sine_amp

    uv = (f0 > voiced_threshold).astype(jnp.float32)
    uv = jnp.repeat(uv, upp, axis=-1)
    noise_amp = uv * noise_std + (1.0 - uv) * (sine_amp / 3.0)
    n_out = sine.shape[-1]
    n_draw = n_out if noise_samples is None else noise_samples
    if rng is not None and rng.ndim == 2:
        # per-row keys: packing-invariant noise (see synthesizer_infer)
        noise = noise_amp * jax.vmap(
            lambda k: jax.random.normal(k, (n_draw,), jnp.float32)[:n_out]
        )(rng)
    elif rng is not None:
        noise = noise_amp * jax.random.normal(
            rng, sine.shape[:-1] + (n_draw,), jnp.float32
        )[..., :n_out]
    else:
        noise = jnp.zeros_like(sine)
    return sine * uv + noise


def source_module(params, f0, upp: int, sample_rate: int, rng=None, dtype=jnp.float32,
                  noise_samples=None):
    """SourceModuleHnNSF: sine -> tanh(linear) merge (nsf.py:14-40)."""
    sine = sine_source(f0, upp, sample_rate, rng=rng,
                       noise_samples=noise_samples)  # (B, T*upp)
    w = params["l_linear"]["w"].astype(dtype)  # (1, 1)
    b = params["l_linear"]["b"].astype(dtype)
    return jnp.tanh(sine.astype(dtype) * w[0, 0] + b[0])  # (B, T*upp)


# ---------------------------------------------------------------------------
# residual blocks
# ---------------------------------------------------------------------------


def resblock(x, params, *, kernel_size: int, dilations):
    """HiFi-GAN ResBlock1/2 (residuals.py:32-67): pairs of dilated + plain
    convs with leaky-relu pre-activations and residual adds."""
    for i, d in enumerate(dilations):
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        pad1 = (kernel_size * d - d) // 2
        xt = conv1d(
            xt, params["convs1"][i]["w"], params["convs1"][i]["b"],
            dilation=d, padding=pad1,
        )
        xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
        pad2 = (kernel_size - 1) // 2
        xt = conv1d(xt, params["convs2"][i]["w"], params["convs2"][i]["b"], padding=pad2)
        x = xt + x
    return x


def _resblock_dilations(cfg: SynthesizerConfig):
    return [
        (int(k), tuple(int(x) for x in d))
        for k, d in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
    ]


# ---------------------------------------------------------------------------
# generators
# ---------------------------------------------------------------------------


def generator_nsf(params, cfg: SynthesizerConfig, x, f0, g=None, *, rng=None,
                  use_pallas: bool = False, noise_frames=None):
    """GeneratorNSF (nsf.py:43-144): conv_pre -> per-stage [lrelu ->
    transposed-conv upsample -> + noise_conv(source)] -> mean(resblocks)
    -> lrelu -> conv_post -> tanh.

    x: (B, inter, T); f0: (B, T) Hz; g: (B, gin, 1). Returns (B, T * upp).
    """
    dtype = x.dtype
    upp = cfg.upp
    har = source_module(
        params["m_source"], f0, upp, cfg.sr, rng=rng, dtype=dtype,
        noise_samples=None if noise_frames is None else noise_frames * upp,
    )
    har = har[:, None, :]  # (B, 1, T*upp)

    x = conv1d(x, params["conv_pre"]["w"], params["conv_pre"]["b"], padding=3)
    if g is not None:
        x = x + conv1d(g, params["cond"]["w"], params["cond"]["b"])

    num_kernels = len(cfg.resblock_kernel_sizes)
    kd = _resblock_dilations(cfg)
    rates = [int(r) for r in cfg.upsample_rates]
    kernels = [int(k) for k in cfg.upsample_kernel_sizes]
    n_up = len(rates)

    for i in range(n_up):
        # stride of the source-injection conv at this stage: remaining upsample
        stride_f0 = 1
        for r in rates[i + 1 :]:
            stride_f0 *= r
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        u, k = rates[i], kernels[i]
        if use_pallas and k - 2 * ((k - u) // 2) == u:
            from ..ops.pallas_convtranspose import conv_transpose1d_pallas

            x = conv_transpose1d_pallas(
                x, params["ups"][i]["w"], params["ups"][i]["b"],
                stride=u, padding=(k - u) // 2,
                time_tile=128 if u >= 12 else 256,
            )
        else:
            x = conv_transpose1d(
                x, params["ups"][i]["w"], params["ups"][i]["b"],
                stride=u, padding=(k - u) // 2,
            )
        npad = stride_f0 // 2 if stride_f0 > 1 else 0
        x = x + conv1d(
            har, params["noise_convs"][i]["w"], params["noise_convs"][i]["b"],
            stride=stride_f0, padding=npad,
        )
        stage_params = [
            params["resblocks"][i * num_kernels + j] for j in range(num_kernels)
        ]
        if use_pallas and x.shape[1] <= 32 and x.shape[2] % 4 == 0:
            # time-folded kernel (tools/bench_fold.py on v5e): folding 4
            # samples into channels presents M=128 to the MXU — 0.075 s vs
            # 0.185 s plain at the bench C=32 stage. Folding C=64 measured
            # SLOWER (equal MXU passes + transpose cost), so only the last
            # stage folds.
            from ..ops.pallas_resblock import fused_resblock_group_folded

            x = fused_resblock_group_folded(
                x, stage_params,
                kernel_sizes=[k for k, _ in kd],
                dilations=[d for _, d in kd],
                fold=4, time_tile=2048,
            )
        elif use_pallas and x.shape[1] <= 128:
            # fused Pallas path: the low-channel stages run ~6% MXU util
            # under XLA's conv lowering (see ops/pallas_resblock.py).
            # Tile sizes from the v5e sweep (tools/bench_dec_stages.py):
            # the widest tile VMEM admits wins — halo recompute shrinks,
            # and at C=64/128 the M=C_out MXU underfill is a hardware
            # floor, so time is the only axis left to amortize. C >= 256
            # runs XLA (implicit GEMM fills the MXU there; the
            # per-resblock pallas variant measured no better).
            from ..ops.pallas_resblock import fused_resblock_group

            tile = 4096 if x.shape[1] <= 32 else 2048 if x.shape[1] <= 64 else 1024
            x = fused_resblock_group(
                x, stage_params,
                kernel_sizes=[k for k, _ in kd],
                dilations=[d for _, d in kd],
                time_tile=tile,
            )
        else:
            acc = None
            for j in range(num_kernels):
                ksz, dil = kd[j]
                r = resblock(x, stage_params[j], kernel_size=ksz, dilations=dil)
                acc = r if acc is None else acc + r
            x = acc / num_kernels

    x = jax.nn.leaky_relu(x, 0.01)  # default F.leaky_relu slope (nsf.py:142)
    x = conv1d(x, params["conv_post"]["w"], None, padding=3)
    return jnp.tanh(x)[:, 0, :]  # (B, T*upp)


def generator(params, cfg: SynthesizerConfig, x, g=None):
    """Plain HiFi-GAN generator for no-f0 models (generators.py:12-91 — the
    reference's forward is dead code due to a nesting bug (SURVEY §2 #13f);
    implemented correctly here)."""
    x = conv1d(x, params["conv_pre"]["w"], params["conv_pre"]["b"], padding=3)
    if g is not None:
        x = x + conv1d(g, params["cond"]["w"], params["cond"]["b"])

    num_kernels = len(cfg.resblock_kernel_sizes)
    kd = _resblock_dilations(cfg)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = conv_transpose1d(
            x, params["ups"][i]["w"], params["ups"][i]["b"],
            stride=int(u), padding=(int(k) - int(u)) // 2,
        )
        acc = None
        for j in range(num_kernels):
            ksz, dil = kd[j]
            r = resblock(x, params["resblocks"][i * num_kernels + j], kernel_size=ksz, dilations=dil)
            acc = r if acc is None else acc + r
        x = acc / num_kernels

    x = jax.nn.leaky_relu(x, 0.01)
    x = conv1d(x, params["conv_post"]["w"], None, padding=3)
    return jnp.tanh(x)[:, 0, :]
