"""RVC v2 VITS synthesizer (inference path) as pure JAX functions.

Capability parity with the reference generator network
(/root/reference/rvc/lib/algorithm/synthesizers.py:162-188 and submodules):
TextEncoder with windowed relative-position attention (attentions.py:9-163),
conv FFN (attentions.py:166-221), mean-only residual-coupling flow over a
gated dilated WaveNet (residuals.py:109-233, modules.py:9-93), speaker
embedding conditioning, and z_p = m_p + exp(logs_p)·N(0,1)·noise_scale
sampling with an explicit PRNG key (replacing torch.randn_like).

Design notes (TPU-first, not a port):
  - params are nested dicts; weight-norm already folded by convert/
  - shapes are static per call site; masks carry variable lengths
  - attention keeps (B, heads, T, d) layout so scores/relative terms are
    plain batched matmuls on the MXU
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.conv import conv1d


@dataclasses.dataclass(frozen=True)
class SynthesizerConfig:
    """The 18 positional args stored in RVC .pth checkpoints
    (reference checkpoint schema, infer.py:86-97) plus derived fields."""

    spec_channels: int
    segment_size: int
    inter_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    resblock: str
    resblock_kernel_sizes: tuple
    resblock_dilation_sizes: tuple
    upsample_rates: tuple
    upsample_initial_channel: int
    upsample_kernel_sizes: tuple
    spk_embed_dim: int
    gin_channels: int
    sr: int
    use_f0: bool = True
    input_dim: int = 768  # 768 for v2, 256 for v1

    @property
    def upp(self) -> int:
        return int(math.prod(self.upsample_rates))


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def layer_norm_channels(x, gamma, beta, eps: float = 1e-5):
    """LayerNorm over the channel axis of (B, C, T) tensors
    (reference normalization.py applies LN on transposed activations)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * gamma.astype(x.dtype)[None, :, None] + beta.astype(x.dtype)[None, :, None]


def _rel_to_abs(x):
    """(B, H, L, 2L-1) relative-position logits -> (B, H, L, L) absolute."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, l * 2 * l)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l + 1, 2 * l - 1)
    return x[:, :, :l, l - 1 :]


def _abs_to_rel(x):
    """(B, H, L, L) attention weights -> (B, H, L, 2L-1) relative layout."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l * l + l * (l - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (l, 0)))
    x = x.reshape(b, h, l, 2 * l)
    return x[:, :, :, 1:]


def _window_rel_embeddings(emb, length: int, window_size: int):
    """Slice/pad the (1, 2w+1, d) learned table to (1, 2L-1, d)."""
    pad_len = max(length - (window_size + 1), 0)
    start = max((window_size + 1) - length, 0)
    if pad_len > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_len, pad_len), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


def _band_to_dense(band, t: int, w: int):
    """(..., T, 2w+1) diagonal band -> (..., T, T) dense with zeros outside.

    D[t, s] = band[t, s - t + w] for |s - t| <= w. One pad + one reshape
    (the textbook rel->abs trick materializes (T, 2T-1) intermediates —
    2x the final size — which is pure HBM traffic at song-scale T)."""
    lead = band.shape[:-2]
    a = jnp.pad(band, [(0, 0)] * len(lead) + [(0, 0), (0, t - w)])
    flat = a.reshape(*lead, t * (t + w + 1))
    d = flat[..., : t * (t + w)].reshape(*lead, t, t + w)
    return d[..., w:]


def _dense_band_extract(p, t: int, w: int):
    """(..., T, T) -> (..., T, 2w+1): p[t, t - w + i], zero where out of range."""
    idx = jnp.arange(t)[:, None] + jnp.arange(-w, w + 1)[None, :]
    valid = (idx >= 0) & (idx < t)
    idx = jnp.clip(idx, 0, t - 1)
    band = jnp.take_along_axis(
        p, jnp.broadcast_to(idx, p.shape[:-2] + idx.shape), axis=-1
    )
    return band * valid.astype(p.dtype)


def relative_attention(x, params, *, n_heads: int, window_size: int, attn_mask=None):
    """Windowed relative-position self-attention on (B, C, T).

    The learned relative terms only span +-window_size (10), so both the
    key-logit and value contributions are computed as (T, 2w+1) bands
    instead of the reference's (T, 2T-1) expansions (attentions.py:123-158)
    — same math, O(T*w) instead of O(T^2) side traffic."""
    b, c, t = x.shape
    dk = c // n_heads
    w = window_size
    q = conv1d(x, params["q"]["w"], params["q"]["b"])
    k = conv1d(x, params["k"]["w"], params["k"]["b"])
    v = conv1d(x, params["v"]["w"], params["v"]["b"])

    def split_heads(y):  # (B, C, T) -> (B, H, T, dk)
        return y.reshape(b, n_heads, dk, t).swapaxes(2, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    scale = 1.0 / math.sqrt(dk)
    scores = jnp.einsum("bhtd,bhsd->bhts", q * scale, k)

    if t > w:
        rel_k = params["emb_rel_k"].astype(x.dtype)  # (1, 2w+1, dk)
        band = jnp.einsum("bhtd,xrd->bhtr", q * scale, rel_k)
        scores = scores + _band_to_dense(band, t, w)
    else:  # tiny sequences: reference-style full expansion
        rel_k = _window_rel_embeddings(params["emb_rel_k"].astype(x.dtype), t, w)
        rel_logits = jnp.einsum("bhtd,xrd->bhtr", q * scale, rel_k)
        scores = scores + _rel_to_abs(rel_logits)

    if attn_mask is not None:
        scores = jnp.where(attn_mask == 0, jnp.asarray(-1e4, scores.dtype), scores)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", p, v)

    if t > w:
        rel_v = params["emb_rel_v"].astype(x.dtype)  # (1, 2w+1, dk)
        p_band = _dense_band_extract(p, t, w)
        out = out + jnp.einsum("bhtr,xrd->bhtd", p_band, rel_v)
    else:
        rel_v = _window_rel_embeddings(params["emb_rel_v"].astype(x.dtype), t, w)
        out = out + jnp.einsum("bhtr,xrd->bhtd", _abs_to_rel(p), rel_v)

    out = out.swapaxes(2, 3).reshape(b, c, t)
    return conv1d(out, params["o"]["w"], params["o"]["b"])


def ffn(x, x_mask, params, *, kernel_size: int):
    """Conv feed-forward with same-padding and relu (attentions.py:166-221)."""
    pad_l = (kernel_size - 1) // 2
    pad_r = kernel_size // 2

    def same_pad(y):
        if kernel_size == 1:
            return y
        return jnp.pad(y, ((0, 0), (0, 0), (pad_l, pad_r)))

    y = conv1d(same_pad(x * x_mask), params["conv1"]["w"], params["conv1"]["b"])
    y = jax.nn.relu(y)
    y = conv1d(same_pad(y * x_mask), params["conv2"]["w"], params["conv2"]["b"])
    return y * x_mask


def transformer_encoder(
    x, x_mask, layers, *, n_heads: int, window_size: int, kernel_size: int,
    use_flash: bool = False
):
    """Stack of rel-attention + FFN blocks with post-LN residuals.

    use_flash (TPU, large T): streams the content term through the Pallas
    flash kernel instead of materializing (T, T) scores — equivalent math
    (ops/flash_relattn.py), contiguous-prefix masks via segment ids."""
    attn_mask = None
    if not use_flash:
        attn_mask = x_mask[:, :, None, :] * x_mask[:, :, :, None]  # (B,1,T,T)
    x = x * x_mask
    for lp in layers:
        if use_flash:
            from ..ops.flash_relattn import relative_attention_flash

            y = relative_attention_flash(
                x, lp["attn"], n_heads=n_heads, window_size=window_size,
                frame_mask=x_mask,
            )
        else:
            y = relative_attention(
                x, lp["attn"], n_heads=n_heads, window_size=window_size,
                attn_mask=attn_mask,
            )
        x = layer_norm_channels(x + y, lp["norm1"]["gamma"], lp["norm1"]["beta"])
        y = ffn(x, x_mask, lp["ffn"], kernel_size=kernel_size)
        x = layer_norm_channels(x + y, lp["norm2"]["gamma"], lp["norm2"]["beta"])
    return x * x_mask


def text_encoder(params, cfg: SynthesizerConfig, phone, pitch, x_mask,
                 *, use_flash: bool = False):
    """enc_p: features(+pitch emb) -> (m_p, logs_p) (encoders.py:76-126).

    phone: (B, T, input_dim); pitch: (B, T) int32 coarse bins or None;
    x_mask: (B, 1, T).
    """
    w = params["emb_phone"]
    x = phone @ w["w"].astype(phone.dtype) + w["b"].astype(phone.dtype)
    if pitch is not None:
        x = x + jnp.asarray(params["emb_pitch"], x.dtype)[pitch]
    x = x * math.sqrt(cfg.hidden_channels)
    x = jax.nn.leaky_relu(x, 0.1)
    x = x.swapaxes(1, 2)  # (B, H, T)
    x = transformer_encoder(
        x,
        x_mask,
        params["encoder"],
        n_heads=cfg.n_heads,
        window_size=10,
        kernel_size=cfg.kernel_size,
        use_flash=use_flash,
    )
    stats = conv1d(x, params["proj"]["w"], params["proj"]["b"]) * x_mask
    m, logs = jnp.split(stats, 2, axis=1)
    return m, logs


# ---------------------------------------------------------------------------
# WaveNet + flow
# ---------------------------------------------------------------------------


def wavenet(x, x_mask, params, g=None, *, hidden_channels: int, n_layers: int,
            kernel_size: int, dilation_rate: int = 1):
    """Gated dilated-conv stack with speaker conditioning (modules.py:9-93)."""
    output = jnp.zeros_like(x)
    if g is not None:
        g_all = conv1d(g, params["cond"]["w"], params["cond"]["b"])
    for i in range(n_layers):
        dilation = dilation_rate**i
        padding = (kernel_size * dilation - dilation) // 2
        x_in = conv1d(
            x,
            params["in"][i]["w"],
            params["in"][i]["b"],
            dilation=dilation,
            padding=padding,
        )
        if g is not None:
            x_in = x_in + g_all[:, 2 * hidden_channels * i : 2 * hidden_channels * (i + 1)]
        t_act = jnp.tanh(x_in[:, :hidden_channels])
        s_act = jax.nn.sigmoid(x_in[:, hidden_channels:])
        acts = t_act * s_act
        res_skip = conv1d(acts, params["skip"][i]["w"], params["skip"][i]["b"])
        if i < n_layers - 1:
            x = (x + res_skip[:, :hidden_channels]) * x_mask
            output = output + res_skip[:, hidden_channels:]
        else:
            output = output + res_skip
    return output * x_mask


def _coupling_reverse(x, x_mask, params, g, cfg: SynthesizerConfig):
    """Mean-only residual coupling layer, reverse direction
    (residuals.py:175-229 with mean_only=True)."""
    half = cfg.inter_channels // 2
    x0, x1 = x[:, :half], x[:, half:]
    h = conv1d(x0, params["pre"]["w"], params["pre"]["b"]) * x_mask
    h = wavenet(
        h,
        x_mask,
        params["enc"],
        g=g,
        hidden_channels=cfg.hidden_channels,
        n_layers=3,
        kernel_size=5,
        dilation_rate=1,
    )
    m = conv1d(h, params["post"]["w"], params["post"]["b"]) * x_mask
    x1 = (x1 - m) * x_mask
    return jnp.concatenate([x0, x1], axis=1)


def flow_reverse(params, cfg: SynthesizerConfig, z_p, x_mask, g):
    """ResidualCouplingBlock reverse pass: 4x (coupling, flip) undone in
    reverse order (residuals.py:144-157)."""
    x = z_p
    for layer_params in reversed(params):
        x = jnp.flip(x, axis=1)  # undo Flip
        x = _coupling_reverse(x, x_mask, layer_params, g, cfg)
    return x


# ---------------------------------------------------------------------------
# full inference
# ---------------------------------------------------------------------------


def synthesizer_infer(
    params: dict,
    cfg: SynthesizerConfig,
    phone,
    x_mask,
    pitch=None,
    nsff0=None,
    sid=0,
    *,
    rng: Optional[jax.Array] = None,
    noise_scale: float = 0.66666,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    noise_frames: Optional[int] = None,
):
    """Full generator inference (synthesizers.py:162-188).

    phone: (B, T, input_dim) content features (already 2x-upsampled)
    x_mask: (B, 1, T) float mask of valid frames
    pitch:  (B, T) int coarse f0 bins (use_f0 models)
    nsff0:  (B, T) float f0 in Hz (use_f0 models)
    sid:    (B,) int speaker ids
    rng:    PRNG key for the latent + NSF noise; None -> deterministic
            (noise-free debug mode for activation parity)
    noise_frames: when set (>= T), every noise draw happens at this FIXED
            frame length and slices to T, so the drawn sequence does not
            depend on the graph's padded length — a chunk renders
            bit-identically whatever bucket its batch compiled at. The
            engine passes its config-level max bucket here.
    Returns (B, T * upp) waveform at cfg.sr.
    """
    from .nsf import generator_nsf, generator  # local import to avoid cycle

    phone = phone.astype(compute_dtype)
    x_mask = x_mask.astype(compute_dtype)
    sid = jnp.atleast_1d(jnp.asarray(sid, jnp.int32))
    g = jnp.asarray(params["emb_g"], compute_dtype)[sid][:, :, None]  # (B, gin, 1)

    # flash rel-attention generates the band bias in-kernel (no (T, T)
    # arrays at all); worthwhile once T spans multiple tiles. TPU-only —
    # CPU runs the banded XLA path (tested equal).
    use_flash = use_pallas and phone.shape[1] >= 512
    m_p, logs_p = text_encoder(
        params["enc_p"], cfg, phone, pitch, x_mask, use_flash=use_flash
    )

    # latent sampling stays fp32 regardless of compute dtype: exp(logs)+noise
    # in bf16 costs ~2.4 dB mel distortion; fp32 here costs nothing and the
    # rest of the graph in bf16 lands at ~0.1 dB (see tests/test_quality.py)
    m_p32 = m_p.astype(jnp.float32)
    logs_p32 = logs_p.astype(jnp.float32)
    T = m_p.shape[-1]
    nf = T if noise_frames is None else noise_frames
    if rng is not None and rng.ndim == 2:
        # per-row keys (B, 2): noise depends only on each row's own key, so
        # a chunk renders identically no matter which batch slot it rides in
        # (packing-invariant batch cover generation). The draw happens at
        # the fixed noise_frames length and slices to T, so it is also
        # bucket-invariant (see docstring).
        ks = jax.vmap(jax.random.split)(rng)  # (B, 2, 2)
        k_lat, k_nsf = ks[:, 0], ks[:, 1]
        eps = jax.vmap(
            lambda k: jax.random.normal(
                k, m_p.shape[1:-1] + (nf,), jnp.float32
            )[..., :T]
        )(k_lat)
    elif rng is not None:
        k_lat, k_nsf = jax.random.split(rng)
        eps = jax.random.normal(
            k_lat, m_p.shape[:-1] + (nf,), jnp.float32
        )[..., :T]
    else:
        k_nsf = None
        eps = jnp.zeros_like(m_p32)
    z_p = (m_p32 + jnp.exp(logs_p32) * eps * noise_scale) * x_mask.astype(jnp.float32)

    z = flow_reverse(params["flow"], cfg, z_p.astype(compute_dtype), x_mask, g)
    z = z * x_mask

    if cfg.use_f0:
        audio = generator_nsf(
            params["dec"], cfg, z, nsff0, g, rng=k_nsf, use_pallas=use_pallas,
            noise_frames=noise_frames,
        )
    else:
        audio = generator(params["dec"], cfg, z, g)
    return audio
