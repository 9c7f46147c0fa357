"""Shared building blocks for the PASSION-TPU backbones (flax, channels-last).

Functional re-designs of the reference block zoo (code/models/blocks.py):
conv+InstanceNorm+LeakyReLU units (post/pre-norm), transformer pieces,
probability-region-map (PRM) generators, modality/region fusion blocks, and
the masked channel cross-attention. All tensors are channels-last
`(B, H, W, Z, C)`; stacked per-modality tensors are `(B, M=4, H, W, Z, C)`.

The reference's boolean row masking `y[mask] = x[mask]` (blocks.py:387-390
etc.) becomes a broadcast multiply, and its per-forward host-built attention
masks (models/mask.py) are replaced by the traced bias builders in
`passion_tpu.ops.attn_mask`.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from passion_tpu.ops import s2d
from passion_tpu.ops.attn_mask import cross_key_bias, fusion_attention_bias
from passion_tpu.ops.fused_norm import instance_norm_lrelu
from passion_tpu.ops.norm import instance_norm

NUM_MODALS = 4

# Rematerialization of the training decoders (the 5-pass FusePath/
# DecoderFuse + 4-pass DecoderSep dominate training-activation memory at
# 80^3). Trace-time process global (same pattern as fused_norm._ENABLED):
#   "full" — nn.remat, recompute the whole decoder forward in backward
#            (lowest memory; the r1-r3 default),
#   "conv" — remat with a policy that SAVES conv/matmul outputs and
#            recomputes only the cheap elementwise/norm epilogues
#            (~the forward conv time cheaper than "full" in backward),
#   "none" — save all residuals (fastest; the r5 default).
# r5 roofline sweep (scripts/roofline_train.py, real v5e, mmFormer 80^3
# bs=1 PASSION step): every mode runs AT its HBM roofline — none 191 GB /
# 224 ms measured (4.46 steps/s), conv 183 GB / 230 ms (4.35), full
# 246 GB / 298 ms (3.35) — so the policy choice IS the bytes choice, and
# "none" measures fastest while fitting the canonical bs=1 config in
# 16 GB alongside AdamW state. Memory-tighter configs (local batch >= 2,
# bigger basic_dims) should set PASSION_DECODER_REMAT=conv (or full).
import os as _os

DECODER_REMAT = _os.environ.get("PASSION_DECODER_REMAT", "none")


def _conv_outputs_saveable(prim, *_, **__):
    return getattr(prim, "name", "") in ("conv_general_dilated", "dot_general")


def decoder_remat(cls, **remat_kw):
    """Apply the configured decoder remat mode to a linen Module class."""
    if DECODER_REMAT == "none":
        return cls
    if DECODER_REMAT == "conv":
        return nn.remat(cls, policy=_conv_outputs_saveable, **remat_kw)
    return nn.remat(cls, **remat_kw)


# torch kaiming_normal_(fan_in, leaky_relu a=0) == variance_scaling(2, fan_in)
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def leaky_relu(x, negative_slope: float = 0.2):
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)


def mask_modalities(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero features of absent modalities.

    Args:
      x: (B, M, ..., C) stacked per-modality tensor.
      mask: (B, M) bool/float modality-present mask.

    jit-safe equivalent of the reference's `y[mask] = x[mask]`
    (rfnet.py:158-163): absent rows become zeros.
    """
    shape = (x.shape[0], x.shape[1]) + (1,) * (x.ndim - 2)
    return x * mask.astype(x.dtype).reshape(shape)


def flatten_modalities(x: jnp.ndarray) -> jnp.ndarray:
    """(B, M, H, W, Z, C) -> (B, H, W, Z, M*C), modality-major channel order.

    Matches the reference's `y.view(B, -1, H, W, Z)` after stacking along a
    modality axis in NCHWD layout (rfnet.py:162).
    """
    b, m, h, w, z, c = x.shape
    return jnp.moveaxis(x, 1, 4).reshape(b, h, w, z, m * c)


def mask_channels(x: jnp.ndarray, mask: jnp.ndarray, num_modals: int = NUM_MODALS) -> jnp.ndarray:
    """Zero absent modalities on a FLAT modality-major channel axis.

    x: (B, ..., M*C); mask: (B, M). The flat layout is the TPU-native
    representation of the reference's stacked (B, M, C, ...) tensors: with
    channels last, a stacked tensor's (M=4, C=8) tail pads to (8, 128) tiles
    — a 16-32x HBM blowup — while the flat M*C tail stays dense.
    """
    b = x.shape[0]
    c = x.shape[-1] // num_modals
    m = jnp.repeat(mask.astype(x.dtype), c, axis=1)  # (B, M*C)
    return x * m.reshape((b,) + (1,) * (x.ndim - 2) + (num_modals * c,))


def mask_kernel_rows(kernel: jnp.ndarray, in_mask: jnp.ndarray,
                     num_modals: int = NUM_MODALS) -> jnp.ndarray:
    """Fold a modality mask into a conv kernel's INPUT-channel rows.

    kernel: (..., M*C, O); in_mask: (M,). For modality-flat inputs whose
    absent-modality channels are exactly zero (the invariant `mask_channels`
    creates), `conv(mask_channels(x), k) == conv(x, mask_kernel_rows(k, m))`
    EXACTLY: every dropped term is an exact 0 * finite product either way.
    Masking the (tiny) kernel instead of the (GB-scale) activation removes
    the per-mask masked-copy round trip from the 15-mask sweep's fuse pass
    (predict.py:209-215 rebuild) — see MMFormer.fuse_inference."""
    c = kernel.shape[-2] // num_modals
    rows = jnp.repeat(in_mask.astype(kernel.dtype), c)
    return kernel * rows[:, None]


def split_modalities(x: jnp.ndarray, num_modals: int = NUM_MODALS):
    """Flat (B, ..., M*C) -> list of M tensors (B, ..., C)."""
    c = x.shape[-1] // num_modals
    return [x[..., m * c:(m + 1) * c] for m in range(num_modals)]


def blockdiag_grouped_kernel(w: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Grouped-conv kernel (k,k,k, Ci/G, Co) -> dense block-diagonal
    (k,k,k, Ci, Co): output group g reads only input group g, exactly the
    grouped-conv connectivity, with structural zeros elsewhere."""
    k1, k2, k3, cig, co = w.shape
    cog = co // groups
    # linear in w -> one einsum against a constant eye instead of G
    # dynamic-update-slices per traced conv (kernel builders showed up as
    # DUS + kernel-copy time in the train-step trace)
    w6 = w.reshape(k1, k2, k3, cig, groups, cog)
    eye_g = jnp.asarray(np.eye(groups, dtype=np.float32), w.dtype)
    full = jnp.einsum("xyzigo,gh->xyzgiho", w6, eye_g)
    return full.reshape(k1, k2, k3, cig * groups, co)


class Conv3d(nn.Module):
    """Plain 3D conv with torch-style explicit padding (reflect or zeros).

    `groups > 1` gives a grouped conv: with modality-major flat channels and
    groups=4, this IS four independent per-modality convs executed as one
    XLA op with a stacked weight — the TPU-native form of the reference's
    four separate encoders.

    Grouped convs are EXECUTED dense with a block-diagonal kernel expanded
    at trace time from the same per-group parameters (param tree unchanged).
    XLA's feature_group_count handling rewrites grouped convs into 6-D
    non-MXU fusions whose forward AND gradients run at <1% FLOP utilization
    (profiled: 43 ms for a 4 GFLOP input-gradient at encoder stage 2, ~30%
    of the whole mmFormer PASSION train step); the dense conv takes the
    normal MXU convolution path, and the 4x structural-zero FLOPs are far
    cheaper than the fallback."""

    features: int
    k_size: int = 3
    stride: int = 1
    padding: int = 1
    pad_type: str = "reflect"  # 'reflect' | 'zeros'
    use_bias: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x, in_mask=None):
        """`in_mask` ((M,) bool, groups == 1 only): fold a modality mask
        into the kernel's input rows instead of masking the activation
        (`mask_kernel_rows`) — the sweep fuse path's premasked execution."""
        if self.padding:
            p = self.padding
            mode = "reflect" if self.pad_type == "reflect" else "constant"
            x = jnp.pad(
                x, ((0, 0), (p, p), (p, p), (p, p), (0, 0)), mode=mode
            )
        if in_mask is not None:
            assert self.groups == 1, "in_mask only on ungrouped convs"
            # raw-param twin of the nn.Conv below: same child name
            # ("Conv_0"), param names, shapes, and initializers — the param
            # tree is IDENTICAL whichever branch traces
            kernel, bias = _RawConv(self.features, x.shape[-1], self.k_size,
                                    use_bias=self.use_bias, name="Conv_0")()
            kernel = mask_kernel_rows(kernel, in_mask)
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (self.stride,) * 3, "VALID",
                dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        if self.groups > 1:
            kernel, bias = _RawConv(self.features,
                                    x.shape[-1] // self.groups,
                                    self.k_size, use_bias=self.use_bias,
                                    name="Conv_0")()
            if s2d.native_groups_enabled():
                # forward-only inference traces: native grouped conv now
                # beats the dense block-diagonal form (r4 microbench, see
                # ops/s2d.py native_groups); gradients still need dense
                y = jax.lax.conv_general_dilated(
                    x, kernel.astype(x.dtype), (self.stride,) * 3, "VALID",
                    dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
                    feature_group_count=self.groups)
            else:
                dense = blockdiag_grouped_kernel(kernel, self.groups)
                y = jax.lax.conv_general_dilated(
                    x, dense.astype(x.dtype), (self.stride,) * 3, "VALID",
                    dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        return nn.Conv(
            features=self.features,
            kernel_size=(self.k_size,) * 3,
            strides=(self.stride,) * 3,
            padding="VALID",
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            kernel_init=conv_kernel_init,
        )(x)


class _RawConv(nn.Module):
    """Declares nn.Conv-compatible params (kernel, bias) and returns them raw
    — for externally-fused execution paths (ops/s2d.py) that need the
    canonical weights but not nn.Conv's computation. Init matches Conv3d
    exactly (same shapes, same initializers, same RNG fold by module path)."""

    features: int
    in_features: int
    k_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        shape = (self.k_size,) * 3 + (self.in_features, self.features)
        kernel = self.param("kernel", conv_kernel_init, shape)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class RawConv3dParams(nn.Module):
    """Param-tree twin of `Conv3d` (child Conv_0/{kernel,bias})."""

    features: int
    in_features: int
    k_size: int = 3

    @nn.compact
    def __call__(self):
        return _RawConv(self.features, self.in_features, self.k_size,
                        name="Conv_0")()


class RawGeneralConv3dParams(nn.Module):
    """Param-tree twin of `GeneralConv3d`/`GeneralConv3dPreNorm`
    (child Conv3d_0/Conv_0/{kernel,bias})."""

    features: int
    in_features: int
    k_size: int = 3

    @nn.compact
    def __call__(self):
        return RawConv3dParams(self.features, self.in_features, self.k_size,
                               name="Conv3d_0")()


class _EmbeddingLayerRawParams(nn.Module):
    """Param-tree twin of `_EmbeddingLayer` (general_conv3d x3:
    4C -> C/4 -> C/4 -> C, blocks.py:376-379)."""

    in_channel: int

    @nn.compact
    def __call__(self):
        c = self.in_channel
        return (
            RawGeneralConv3dParams(c // 4, 4 * c, 1, name="GeneralConv3d_0")(),
            RawGeneralConv3dParams(c // 4, c // 4, 3, name="GeneralConv3d_1")(),
            RawGeneralConv3dParams(c, c // 4, 1, name="GeneralConv3d_2")(),
        )


class PRMGeneratorRawParams(nn.Module):
    """Param-tree twin of `PRMGenerator` (embedding + 2-conv PRM head)."""

    in_channel: int
    num_cls: int = 4

    @nn.compact
    def __call__(self):
        c = self.in_channel
        emb = _EmbeddingLayerRawParams(c, name="embedding_layer")()
        head = RawGeneralConv3dParams(16, 2 * c, 1, name="GeneralConv3d_0")()
        out = RawConv3dParams(self.num_cls, 16, 1, name="Conv3d_0")()
        return emb, head, out


class RegionAwareModalFusionS2D(nn.Module):
    """`RegionAwareModalFusion` executed in the space-to-depth domain —
    exact math, identical param tree (raw conv twins + ModalFusionS2D
    sharing the canonical Dense paths).

    __call__(x1s (B, blocks, 4C*8) MASKED S2D features,
             prm_soft (B, blocks, K*8) S2D softmax probs (class, phase),
             -) -> (B, blocks, C*8)."""

    in_channel: int
    num_cls: int = 4

    @nn.compact
    def __call__(self, y, prm_soft):
        from passion_tpu.ops import s2d as _s2d

        c = self.in_channel
        rf_ks = (
            RawGeneralConv3dParams(c, self.num_cls * c, 1,
                                   name="region_fusion_c1")(),
            RawGeneralConv3dParams(c, c, 3, name="region_fusion_c2")(),
            RawGeneralConv3dParams(c // 2, c, 1, name="region_fusion_c3")(),
        )
        sc_ks = (
            RawGeneralConv3dParams(c, self.num_cls * c, 1,
                                   name="GeneralConv3d_0")(),
            RawGeneralConv3dParams(c, c, 3, name="GeneralConv3d_1")(),
            RawGeneralConv3dParams(c // 2, c, 1, name="GeneralConv3d_2")(),
        )
        ys = [y[..., m * c * 8:(m + 1) * c * 8] for m in range(NUM_MODALS)]
        region_fused = []
        for r in range(self.num_cls):
            pr = prm_soft[..., r * 8:(r + 1) * 8]  # (B, blocks, 8)
            region_feat = [
                (ym.reshape(ym.shape[:4] + (c, 8)) * pr[..., None, :]
                 ).reshape(ym.shape)
                for ym in ys
            ]
            region_fused.append(ModalFusionS2D(name=f"modal_fusion_{r}")(
                region_feat, pr))
        rf = jnp.concatenate(region_fused, axis=-1)
        for (k, b), ksz in zip(rf_ks, (1, 3, 1)):
            rf = _s2d.conv_postnorm_s2d(rf, k, b, k_size=ksz)
        sc = y
        for (k, b), ksz in zip(sc_ks, (1, 3, 1)):
            sc = _s2d.conv_postnorm_s2d(sc, k, b, k_size=ksz)
        return jnp.concatenate([rf, sc], axis=-1)


class FusionPreNormRawParams(nn.Module):
    """Param-tree twin of `FusionPreNorm` (3x GeneralConv3dPreNorm with
    kernel sizes 1, 3, 1) returning the raw (kernel, bias) pairs."""

    in_channel: int
    in_features: int

    @nn.compact
    def __call__(self):
        c = self.in_channel
        return (
            RawGeneralConv3dParams(c, self.in_features, 1,
                                   name="GeneralConv3dPreNorm_0")(),
            RawGeneralConv3dParams(c, c, 3, name="GeneralConv3dPreNorm_1")(),
            RawGeneralConv3dParams(c, c, 1, name="GeneralConv3dPreNorm_2")(),
        )


class GeneralConv3d(nn.Module):
    """conv3d -> InstanceNorm -> LeakyReLU(0.2) (blocks.py:354-370)."""

    features: int
    k_size: int = 3
    stride: int = 1
    padding: int = 1
    pad_type: str = "reflect"
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv3d(self.features, self.k_size, self.stride, self.padding,
                   self.pad_type, groups=self.groups)(x)
        return instance_norm_lrelu(x)


class GeneralConv3dPreNorm(nn.Module):
    """InstanceNorm -> LeakyReLU(0.2) -> conv3d (blocks.py:300-316).

    Note the reference normalizes with `normalization(out_ch)` but applies it
    to the *input*; InstanceNorm3d is parameter-free so the channel count is
    irrelevant — semantics are norm(input).
    """

    features: int
    k_size: int = 3
    stride: int = 1
    padding: int = 1
    pad_type: str = "reflect"
    groups: int = 1

    @nn.compact
    def __call__(self, x, in_mask=None, skip_norm: bool = False):
        """`skip_norm`: the input already carries IN+LReLU (hoisted into the
        sweep engine's encode phase — valid because the norm is
        mask-independent once masking moves into the kernel via `in_mask`)."""
        if not skip_norm:
            x = instance_norm_lrelu(x)
        return Conv3d(self.features, self.k_size, self.stride, self.padding,
                      self.pad_type, groups=self.groups)(x, in_mask=in_mask)


# ---------------------------------------------------------------------------
# Token-transformer pieces (mmformer.py:192-313, m2ftrans.py:245-395)
# ---------------------------------------------------------------------------


class SelfAttention(nn.Module):
    """Multi-head self-attention, qkv without bias (mmformer.py:192-227)."""

    heads: int = 8
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, c = x.shape
        head_dim = c // self.heads
        qkv = nn.Dense(3 * c, use_bias=False, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (head_dim ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        y = nn.Dense(c, name="proj")(y)
        return nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)


class MaskedAttention(nn.Module):
    """Self-attention with the M2FTrans fusion-visibility mask.

    Token layout: 4 modality blocks + 1 fusion block of `tokens_per_block`
    tokens each. Returns (output, attention-probabilities) — the attention is
    consumed downstream by Weight_Attention (m2ftrans.py:321-359).
    """

    heads: int = 8
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True):
        b, n, c = x.shape
        tokens_per_block = n // (NUM_MODALS + 1)
        head_dim = c // self.heads
        qkv = nn.Dense(3 * c, use_bias=False, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (head_dim ** -0.5)
        attn = attn + fusion_attention_bias(mask, tokens_per_block)
        attn = jax.nn.softmax(attn, axis=-1)
        attn_probs = attn
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        y = nn.Dense(c, name="proj")(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return y, attn_probs


class FeedForward(nn.Module):
    """Linear -> GELU -> Dropout -> Linear -> Dropout (mmformer.py:267-279)."""

    hidden_dim: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        c = x.shape[-1]
        x = nn.Dense(self.hidden_dim)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(c)(x)
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class Transformer(nn.Module):
    """Pre-norm transformer with per-layer positional re-add (mmformer.py:282-313).

    `deterministic` is positional so the module can sit under flax's lifted
    vmap (which maps positional args only).
    """

    depth: int = 1
    heads: int = 8
    mlp_dim: int = 4096
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        for j in range(self.depth):
            x = x + pos
            h = nn.LayerNorm(epsilon=1e-5, name=f"attn_norm_{j}")(x)
            h = SelfAttention(self.heads, self.dropout_rate,
                              name=f"attn_{j}")(h, deterministic=deterministic)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
            x = x + h
            f = nn.LayerNorm(epsilon=1e-5, name=f"ffn_norm_{j}")(x)
            f = FeedForward(self.mlp_dim, self.dropout_rate,
                            name=f"ffn_{j}")(f, deterministic=deterministic)
            x = x + f
        return x


class MaskedTransformer(nn.Module):
    """Depth-N masked transformer returning per-layer attention maps
    (m2ftrans.py:363-395). Attention maps are stop-gradiented as in the
    reference (`attn.detach()`, m2ftrans.py:393)."""

    depth: int = 3
    heads: int = 8
    mlp_dim: int = 4096
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        attn_list = []
        for j in range(self.depth):
            h = nn.LayerNorm(epsilon=1e-5, name=f"attn_norm_{j}")(x)
            h, attn = MaskedAttention(self.heads, self.dropout_rate,
                                      name=f"attn_{j}")(
                h, mask, deterministic=deterministic)
            attn_list.append(jax.lax.stop_gradient(attn))
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
            x = x + h
            f = nn.LayerNorm(epsilon=1e-5, name=f"ffn_norm_{j}")(x)
            f = FeedForward(self.mlp_dim, self.dropout_rate,
                            name=f"ffn_{j}")(f, deterministic=deterministic)
            x = x + f
        return x, attn_list


# ---------------------------------------------------------------------------
# ConvNeXt-ish LN+GELU conv blocks (blocks.py:32-109) — channels-last makes
# the reference's nchwd2nlc2nchwd LayerNorm shuffling a plain LayerNorm.
# ---------------------------------------------------------------------------


class DepthWiseConvBlock(nn.Module):
    """1x1 conv -> LN -> GELU -> depthwise 3x3 -> LN -> GELU -> 1x1 -> LN."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        mid = x.shape[-1]
        x = nn.Conv(mid, (1, 1, 1))(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(mid, (3, 3, 3), padding=1, feature_group_count=mid)(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(self.out_channels, (1, 1, 1))(x)
        return nn.LayerNorm(epsilon=1e-6)(x)


class GroupConvBlock(nn.Module):
    """Inverted-bottleneck grouped conv FFN with residual (blocks.py:65-109)."""

    expand_ratio: int = 4
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, identity=None, *, deterministic: bool = True):
        c = x.shape[-1]
        inp = x
        x = nn.Conv(c * self.expand_ratio, (1, 1, 1))(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        x = jax.nn.gelu(x, approximate=False)
        # torch: Conv3d(4c, 4c, 3, groups=c) -> each group spans 4 channels
        x = nn.Conv(c * self.expand_ratio, (3, 3, 3), padding=1,
                    feature_group_count=c)(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(c, (1, 1, 1))(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        x = nn.Dropout(self.proj_drop)(x, deterministic=deterministic)
        x = (inp if identity is None else identity) + x
        return jax.nn.gelu(x, approximate=False)


class MultiMaskAttentionLayer(nn.Module):
    """Channel-token cross-attention with per-modality K/V projections.

    Queries are CHANNELS (spatial as features): query (B, Cq, L) attends over
    4*Ck key channels; key channels of absent modalities are masked out
    (blocks.py:246-297). `feature_maps` is a (B, M, H, W, Z, Ck) stack.
    """

    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, query, feature_maps, mask, *, deterministic: bool = True):
        identity = query
        b, h, w, z, cq = query.shape
        ck = feature_maps.shape[-1]
        l = h * w * z

        q = DepthWiseConvBlock(cq, name="query_map")(query)

        keys, values = [], []
        for m, nm in enumerate(("flair", "t1ce", "t1", "t2")):
            fm = feature_maps[:, m]
            keys.append(DepthWiseConvBlock(ck, name=f"key_map_{nm}")(fm))
            values.append(DepthWiseConvBlock(ck, name=f"value_map_{nm}")(fm))

        # (B, C, L) channel-token layout
        def to_cl(t):
            return t.reshape(b, l, -1).swapaxes(1, 2)

        q = to_cl(q)
        k = jnp.concatenate([to_cl(t) for t in keys], axis=1)  # (B, 4Ck, L)
        v = jnp.concatenate([to_cl(t) for t in values], axis=1)

        attn = jnp.einsum("bql,bkl->bqk", q, k) * (l ** -0.5)
        attn = attn + cross_key_bias(mask, ck)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        y = jnp.einsum("bqk,bkl->bql", attn, v)
        y = y.swapaxes(1, 2).reshape(b, h, w, z, cq)
        y = DepthWiseConvBlock(cq, name="out_project")(y)
        y = nn.Dropout(self.proj_drop)(y, deterministic=deterministic)
        return identity + y


class MultiMaskCrossBlock(nn.Module):
    """Masked cross-attention + FFNs (blocks.py:206-244)."""

    expand_ratio: int = 4
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    ffn_feature_maps: bool = True

    @nn.compact
    def __call__(self, kernels, feature_maps, mask, *, deterministic: bool = True):
        kernels = MultiMaskAttentionLayer(
            self.attn_drop_rate, self.drop_rate, name="cross_attn"
        )(kernels, feature_maps, mask, deterministic=deterministic)
        kernels = GroupConvBlock(self.expand_ratio, name="ffn1")(
            kernels, identity=kernels, deterministic=deterministic)
        if self.ffn_feature_maps:
            ffn2 = GroupConvBlock(self.expand_ratio, name="ffn2")
            feature_maps = jnp.stack(
                [ffn2(feature_maps[:, m], identity=feature_maps[:, m],
                      deterministic=deterministic)
                 for m in range(NUM_MODALS)],
                axis=1,
            )
        return kernels, feature_maps


class MultiCrossToken(nn.Module):
    """Stack of MultiMaskCrossBlocks refining the fusion kernel volume
    (m2ftrans.py:25-61)."""

    num_layers: int = 2
    mlp_ratio: int = 4
    drop_rate: float = 0.1
    attn_drop_rate: float = 0.0

    @nn.compact
    def __call__(self, feature_maps, kernels, mask, *, deterministic: bool = True):
        for i in range(self.num_layers):
            kernels, feature_maps = MultiMaskCrossBlock(
                expand_ratio=self.mlp_ratio,
                drop_rate=self.drop_rate,
                attn_drop_rate=self.attn_drop_rate,
                ffn_feature_maps=(i != self.num_layers - 1),
                name=f"layer_{i}",
            )(kernels, feature_maps, mask, deterministic=deterministic)
        return kernels


# ---------------------------------------------------------------------------
# PRM generators and fusion blocks (blocks.py:372-626)
# ---------------------------------------------------------------------------


class _EmbeddingLayer(nn.Module):
    """general_conv3d x3: (4C -> C/4 -> C/4 -> C) (blocks.py:376-379)."""

    in_channel: int

    @nn.compact
    def __call__(self, y):
        c = self.in_channel
        y = GeneralConv3d(c // 4, k_size=1, padding=0)(y)
        y = GeneralConv3d(c // 4, k_size=3, padding=1)(y)
        return GeneralConv3d(c, k_size=1, padding=0)(y)


class PRMGeneratorLastStage(nn.Module):
    """Deepest-scale PRM head on masked flat modality features
    (prm_generator_laststage_pk, blocks.py:396-416). Returns logits.

    x: (B, ..., 4*in_channel) flat modality-major."""

    in_channel: int
    num_cls: int = 4

    @nn.compact
    def __call__(self, x, mask):
        y = mask_channels(x, mask)
        y = _EmbeddingLayer(self.in_channel, name="embedding_layer")(y)
        y = GeneralConv3d(16, k_size=1, padding=0)(y)
        return Conv3d(self.num_cls, k_size=1, padding=0)(y)


class PRMGenerator(nn.Module):
    """PRM head on [decoded features | embedded masked skip] concat
    (prm_generator_pk, blocks.py:443-464). Returns logits.

    x2: (B, ..., 4*in_channel) flat modality-major."""

    in_channel: int
    num_cls: int = 4

    @nn.compact
    def __call__(self, x1, x2, mask):
        y = mask_channels(x2, mask)
        y = _EmbeddingLayer(self.in_channel, name="embedding_layer")(y)
        y = jnp.concatenate([x1, y], axis=-1)
        y = GeneralConv3d(16, k_size=1, padding=0)(y)
        return Conv3d(self.num_cls, k_size=1, padding=0)(y)


class PRMFusion(nn.Module):
    """Plain PRM head (prm_fusion_pk, blocks.py:481-492). Returns logits."""

    num_cls: int = 4

    @nn.compact
    def __call__(self, x):
        x = GeneralConv3d(16, k_size=1, padding=0)(x)
        return Conv3d(self.num_cls, k_size=1, padding=0)(x)


class ModalFusion(nn.Module):
    """Learned sigmoid per-modality weights inside one region
    (blocks.py:495-517). Operates on a LIST of per-modality 5-D tensors to
    avoid materializing (B, M, ..., C) 6-D temps."""

    @nn.compact
    def __call__(self, xs, prm_region):
        """xs: list of M tensors (B, H, W, Z, C) region features;
        prm_region: (B, H, W, Z)."""
        b = xs[0].shape[0]
        prm_avg = jnp.mean(prm_region, axis=(1, 2, 3)) + 1e-7  # (B,)
        feat_avg = jnp.concatenate(
            [jnp.mean(x, axis=(1, 2, 3)) for x in xs], axis=-1
        ) / prm_avg[:, None]  # (B, M*C) modality-major
        vec = jnp.concatenate([feat_avg, prm_avg[:, None]], axis=-1)
        w = nn.Dense(128, kernel_init=conv_kernel_init)(vec)
        w = leaky_relu(w)
        w = nn.Dense(NUM_MODALS, kernel_init=conv_kernel_init)(w)
        w = jax.nn.sigmoid(w)  # (B, M)
        out = xs[0] * w[:, 0, None, None, None, None]
        for m in range(1, NUM_MODALS):
            out = out + xs[m] * w[:, m, None, None, None, None]
        return out


class ModalFusionS2D(nn.Module):
    """`ModalFusion` on space-to-depth tensors — identical params
    (Dense_0/Dense_1) and identical math: per-channel means reduce over
    (space, phases), and the learned per-modality sigmoid weights rescale
    the S2D tensors elementwise."""

    @nn.compact
    def __call__(self, xs, prm_region):
        """xs: list of M S2D tensors (B, hb, wb, zb, C*8); prm_region:
        (B, hb, wb, zb, 8) — one class's phase block."""
        b = xs[0].shape[0]
        prm_avg = jnp.mean(prm_region, axis=(1, 2, 3, 4)) + 1e-7  # (B,)
        feat_avg = jnp.concatenate(
            [jnp.mean(x.reshape(x.shape[:4] + (-1, 8)), axis=(1, 2, 3, 5))
             for x in xs], axis=-1) / prm_avg[:, None]  # (B, M*C)
        vec = jnp.concatenate([feat_avg, prm_avg[:, None]], axis=-1)
        w = nn.Dense(128, kernel_init=conv_kernel_init)(vec)
        w = leaky_relu(w)
        w = nn.Dense(NUM_MODALS, kernel_init=conv_kernel_init)(w)
        w = jax.nn.sigmoid(w)  # (B, M)
        out = xs[0] * w[:, 0, None, None, None, None]
        for m in range(1, NUM_MODALS):
            out = out + xs[m] * w[:, m, None, None, None, None]
        return out


class RegionAwareModalFusion(nn.Module):
    """Region-aware modality fusion (blocks.py:582-626).

    Splits masked modality features into PRM-weighted regions, fuses
    modalities per region with learned weights, then concatenates with a
    shortcut fusion of the raw masked features. All tensors stay 5-D flat
    modality-major.
    """

    in_channel: int
    num_cls: int = 4

    @nn.compact
    def __call__(self, x, prm, mask):
        """x: (B, H, W, Z, 4*C) flat; prm: (B, H, W, Z, K) softmax probs;
        mask: (B, M)."""
        y = mask_channels(x, mask)
        ys = split_modalities(y)
        region_fused = []
        for r in range(self.num_cls):
            pr = prm[..., r:r + 1]
            region_feat = [ym * pr for ym in ys]
            region_fused.append(
                ModalFusion(name=f"modal_fusion_{r}")(region_feat, prm[..., r])
            )
        # region_fusion (blocks.py:520-531): region-major channel concat
        rf = jnp.concatenate(region_fused, axis=-1)  # (B, ..., K*C)
        rf = GeneralConv3d(self.in_channel, k_size=1, padding=0,
                           name="region_fusion_c1")(rf)
        rf = GeneralConv3d(self.in_channel, k_size=3, padding=1,
                           name="region_fusion_c2")(rf)
        rf = GeneralConv3d(self.in_channel // 2, k_size=1, padding=0,
                           name="region_fusion_c3")(rf)

        sc = GeneralConv3d(self.in_channel, k_size=1, padding=0)(y)
        sc = GeneralConv3d(self.in_channel, k_size=3, padding=1)(sc)
        sc = GeneralConv3d(self.in_channel // 2, k_size=1, padding=0)(sc)
        return jnp.concatenate([rf, sc], axis=-1)


class FusionPreNorm(nn.Module):
    """3x general_conv3d_prenorm on flattened modality stack
    (fusion_prenorm, blocks.py:533-542).

    NOTE: unlike every other k=3 conv in the reference (explicit
    pad_type='reflect'), fusion_prenorm leaves general_conv3d_prenorm's
    default pad_type='zeros' (blocks.py:301,538) — so the RFM middle conv is
    ZERO-padded. Verified by weight-transplant parity."""

    in_channel: int

    @nn.compact
    def __call__(self, x, in_mask=None, prenormed: bool = False):
        """x: (B, H, W, Z, M*C) already flattened (mmFormer passes masked
        concatenated features).

        Premasked sweep-fuse mode (`in_mask` + `prenormed`): x arrives
        UNMASKED with the first conv's IN+LReLU already applied (hoisted
        into the mask-independent encode); the modality mask is folded into
        the first conv's kernel rows instead — exactly equivalent (see
        `mask_kernel_rows`)."""
        c = self.in_channel
        x = GeneralConv3dPreNorm(c, k_size=1, padding=0)(
            x, in_mask=in_mask, skip_norm=prenormed)
        x = GeneralConv3dPreNorm(c, k_size=3, padding=1, pad_type="zeros")(x)
        return GeneralConv3dPreNorm(c, k_size=1, padding=0)(x)


class FusionPostNorm(nn.Module):
    """Mask then 3x general_conv3d (fusion_postnorm, blocks.py:567-580)."""

    in_channel: int

    @nn.compact
    def __call__(self, x, mask):
        """x: (B, H, W, Z, M*C) flat modality-major; mask: (B, M)."""
        c = self.in_channel
        y = mask_channels(x, mask)
        y = GeneralConv3d(c, k_size=1, padding=0)(y)
        y = GeneralConv3d(c, k_size=3, padding=1)(y)
        return GeneralConv3d(c, k_size=1, padding=0)(y)


def zero_unimodal_self_dist(dist: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero dist[b, k] where sample b's mask IS the unimodal mask k.

    For such samples the mod-k distillation pass and the real-mask (teacher)
    pass are the same computation, so the reference's separately-executed
    passes produce bit-equal features and an EXACTLY zero prototype distance
    — which the driver then turns into 0/0 = NaN rp and an all-False
    preference gate (reference train.py:265-268; NaN-faithfulness note in
    engine/train_loop.py). Our 5 passes are vmap lanes of one program: in a
    plain forward the lanes are bit-identical too, but under value_and_grad
    XLA fuses the stop-gradient teacher path differently from the student
    lanes, and the ~1e-8 rounding residue breaks the 0/0. Enforce the
    invariant by construction instead of relying on compiler scheduling.
    """
    mask_f = mask.astype(jnp.float32)
    unimodal = (jnp.sum(mask_f, axis=1, keepdims=True) == 1.0).astype(
        jnp.float32)
    return dist * (1.0 - mask_f * unimodal)
