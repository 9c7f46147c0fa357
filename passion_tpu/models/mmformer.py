"""mmFormer: 3D conv/transformer hybrid, TPU-native rebuild of
code/models/mmformer.py.

Architecture (reference mmformer.py:24-189,328-447): five-stage pre-norm conv
encoders per modality (dims 8->128); *IntraFormer* — per-modality 1x1 conv to
d=512 over the (S/16)^3 bottleneck voxels, learned positional embedding, and a
depth-1 self-attention transformer; *InterFormer* — the 4 modalities' tokens
concatenated through a shared multimodal transformer and decoded back to conv
features; a fusion decoder with `fusion_prenorm` modality fusion at all 5
scales and deep-supervision heads seg_d4..seg_d1.

TPU-first: per-modality features live FLAT on the channel axis
(modality-major (B, ..., 4*C) — dense TPU tiles, vs 16-32x padding for
stacked (B, 4, ..., 8) tails); the 4 encoders are ONE grouped-conv encoder;
the PASSION training forward's 5 InterFormer+decoder passes
(mmformer.py:447,468-531) are one vmapped pass over a stacked (5, B, 4) mask
axis with tied params.

Reference quirks preserved / fixed:
  * the InterFormer token->volume reshape (mmformer.py:444) reinterprets the
    (B, 4T, 512) token matrix as (B, s, s, s, 2048), interleaving tokens
    4v..4v+3 into voxel v's channels — a fixed scramble feeding a learned
    1x1 conv; replicated exactly for architecture parity.
  * the reference masks the T2 self-distillation x5 stack with masks_mod2
    (T1) instead of masks_mod3 (mmformer.py:522) — an evident bug; we use
    masks_mod3 (documented deviation, affects mmFormer training only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from passion_tpu import losses
from passion_tpu.ops.fused_norm import instance_norm_lrelu
from passion_tpu.models.layers import (
    Conv3d,
    decoder_remat,
    FusionPreNorm,
    FusionPreNormRawParams,
    GeneralConv3dPreNorm,
    RawConv3dParams,
    RawGeneralConv3dParams,
    Transformer,
    mask_channels,
    mask_kernel_rows,
    mask_modalities,
    split_modalities,
    zero_unimodal_self_dist,
)
from passion_tpu.models.rfnet import _unimodal_mask_stack
from passion_tpu.ops import s2d
from passion_tpu.ops.resize import upsample2_trilinear_s2d, upsample_trilinear

NUM_MODALS = 4
TRANSFORMER_DIM = 512
MLP_DIM = 4096
NUM_HEADS = 8
DEPTH = 1


class GroupedEncoder(nn.Module):
    """5-stage pre-norm conv encoder for all 4 modalities at once
    (mmformer.py:24-64), grouped per modality. (B,H,W,Z,4) -> flat scales.

    With `use_s2d` (default) the 80-cube stage-1 block and the stage-2 entry
    run in the space-to-depth polyphase domain (ops/s2d.py) — exact
    re-indexing, identical param tree (raw-param twins), dense TPU tiles.
    """

    basic_dims: int = 8
    use_s2d: bool = True

    @nn.compact
    def __call__(self, x):
        c, g = self.basic_dims, NUM_MODALS

        def gc(feat, **kw):
            return GeneralConv3dPreNorm(feat * g, groups=g, **kw)

        if self.use_s2d and all(d % 2 == 0 for d in x.shape[1:4]):
            k1, b1 = RawConv3dParams(c * g, 1, name="e1_c1")()
            k2, b2 = RawGeneralConv3dParams(c * g, c, name="e1_c2")()
            k3, b3 = RawGeneralConv3dParams(c * g, c, name="e1_c3")()
            ks, bs = RawGeneralConv3dParams(c * 2 * g, c, name="e2_c1")()

            def prenorm_s2d(xin, k, b):  # IN -> LReLU -> conv (pre-norm)
                y = instance_norm_lrelu(xin, phase_group=8)
                return s2d.s2d_conv(s2d.s2d_pad(y),
                                    s2d.s2d_conv3_kernel(k, groups=g),
                                    s2d.s2d_bias(b))

            xs = s2d.space_to_depth(x)
            x1s = s2d.s2d_conv(s2d.s2d_pad(xs),
                               s2d.s2d_conv3_kernel(k1, groups=g),
                               s2d.s2d_bias(b1))  # bare conv (mmformer.py:28)
            x1s = x1s + prenorm_s2d(prenorm_s2d(x1s, k2, b2), k3, b3)
            x2 = instance_norm_lrelu(x1s, phase_group=8)
            x2 = s2d.s2d_conv(s2d.s2d_pad(x2, right=False),
                              s2d.s2d_conv3_stride2_kernel(ks, groups=g), bs)
            # x1 STAYS in space-to-depth layout end-to-end: the fusion
            # decoder's scale-1 stage consumes it directly (is_s2d_scale1).
            x1 = x1s
        else:
            x1 = Conv3d(c * g, groups=g, name="e1_c1")(x)  # bare conv (mmformer.py:28)
            x1 = x1 + gc(c, name="e1_c3")(gc(c, name="e1_c2")(x1))
            x2 = gc(c * 2, stride=2, name="e2_c1")(x1)
        outs = [x1]
        x2 = x2 + gc(c * 2, name="e2_c3")(gc(c * 2, name="e2_c2")(x2))
        outs.append(x2)
        for i, mult in enumerate((4, 8, 16), start=3):
            xi = gc(c * mult, stride=2, name=f"e{i}_c1")(outs[-1])
            xi = xi + gc(c * mult, name=f"e{i}_c3")(gc(c * mult, name=f"e{i}_c2")(xi))
            outs.append(xi)
        return tuple(outs)


class DecoderSep(nn.Module):
    """Shared 5-scale per-modality decoder -> softmax (mmformer.py:66-114).
    Applied once per modality with tied params (single-modality inputs).

    If x1 arrives in space-to-depth layout (detected by matching x2's
    spatial size), the whole scale-1 stage runs on the 40-cube block grid
    with dense channels (ops/s2d.py) — exact polyphase execution, identical
    param tree via raw twins. The canonical 80-cube scale-1 convs at C=8-16
    otherwise dominate the training backward: XLA computes their weight
    gradients as non-MXU fusions at <1% FLOP utilization (profiled,
    scripts/trace_train.py)."""

    num_cls: int = 4
    basic_dims: int = 8

    @nn.compact
    def __call__(self, x1, x2, x3, x4, x5):
        c = self.basic_dims
        de = GeneralConv3dPreNorm(c * 8, name="d4_c1")(upsample_trilinear(x5, 2))
        de = GeneralConv3dPreNorm(c * 8, k_size=1, padding=0, name="d4_out")(
            GeneralConv3dPreNorm(c * 8, name="d4_c2")(
                jnp.concatenate([de, x4], axis=-1)))
        de = GeneralConv3dPreNorm(c * 4, name="d3_c1")(upsample_trilinear(de, 2))
        de = GeneralConv3dPreNorm(c * 4, k_size=1, padding=0, name="d3_out")(
            GeneralConv3dPreNorm(c * 4, name="d3_c2")(
                jnp.concatenate([de, x3], axis=-1)))
        de = GeneralConv3dPreNorm(c * 2, name="d2_c1")(upsample_trilinear(de, 2))
        de = GeneralConv3dPreNorm(c * 2, k_size=1, padding=0, name="d2_out")(
            GeneralConv3dPreNorm(c * 2, name="d2_c2")(
                jnp.concatenate([de, x2], axis=-1)))
        if x1.shape[1] == x2.shape[1]:  # x1 in space-to-depth layout
            kd1c1 = RawGeneralConv3dParams(c, c * 2, 3, name="d1_c1")()
            kd1c2 = RawGeneralConv3dParams(c, c * 2, 3, name="d1_c2")()
            kd1out = RawGeneralConv3dParams(c, c, 1, name="d1_out")()
            kseg, bseg = RawConv3dParams(self.num_cls, c, 1,
                                         name="seg_layer")()
            des = s2d.prenorm_conv_s2d(upsample2_trilinear_s2d(de), *kd1c1,
                                       k_size=3)
            des = s2d.prenorm_conv_s2d(
                jnp.concatenate([des, x1], axis=-1), *kd1c2, k_size=3)
            des = s2d.prenorm_conv_s2d(des, *kd1out, k_size=1)
            logits = s2d.depth_to_space(
                s2d.s2d_conv(des, s2d.s2d_conv1_kernel(kseg),
                             s2d.s2d_bias(bseg)))
        else:
            de = GeneralConv3dPreNorm(c, name="d1_c1")(upsample_trilinear(de, 2))
            de = GeneralConv3dPreNorm(c, k_size=1, padding=0, name="d1_out")(
                GeneralConv3dPreNorm(c, name="d1_c2")(
                    jnp.concatenate([de, x1], axis=-1)))
            logits = Conv3d(self.num_cls, k_size=1, padding=0,
                            name="seg_layer")(de)
        return jax.nn.softmax(logits, axis=-1)


class DecoderFuse(nn.Module):
    """Fusion decoder with deep supervision (mmformer.py:116-189).

    Inputs x1..x4 are flat masked modality stacks (B, ..., 4*C_k);
    x5 is the InterFormer-decoded volume (B, s, s, s, 16c*4).
    Returns (logits, (pred1..pred4), (de_x1_f..de_x5_f)).
    """

    num_cls: int = 4
    basic_dims: int = 8

    @nn.compact
    def __call__(self, x1, x2, x3, x4, x5, pm_mask=None):
        """`pm_mask` ((4,), sweep-fuse premasked mode): x1..x4 arrive
        UNMASKED and PRENORMED (first-RFM IN+LReLU hoisted into the encode
        phase, MMFormer.features) and the modality mask is folded into each
        RFM's first conv kernel instead — exactly equivalent and removes
        the per-mask masked-copy + norm of the stored features from the
        15x fuse loop (predict.py:209-215)."""
        c = self.basic_dims
        pn = pm_mask is not None
        de_x5_f = FusionPreNorm(c * 16, name="RFM5")(x5)
        pred4 = Conv3d(self.num_cls, k_size=1, padding=0, name="seg_d4")(de_x5_f)
        de_x5 = GeneralConv3dPreNorm(c * 8, name="d4_c1")(
            upsample_trilinear(de_x5_f, 2))

        de_x4 = FusionPreNorm(c * 8, name="RFM4")(x4, in_mask=pm_mask,
                                                  prenormed=pn)
        de_x4_f = GeneralConv3dPreNorm(c * 8, k_size=1, padding=0, name="d4_out")(
            GeneralConv3dPreNorm(c * 8, name="d4_c2")(
                jnp.concatenate([de_x4, de_x5], axis=-1)))
        pred3 = Conv3d(self.num_cls, k_size=1, padding=0, name="seg_d3")(de_x4_f)
        de_x4 = GeneralConv3dPreNorm(c * 4, name="d3_c1")(
            upsample_trilinear(de_x4_f, 2))

        de_x3 = FusionPreNorm(c * 4, name="RFM3")(x3, in_mask=pm_mask,
                                                  prenormed=pn)
        de_x3_f = GeneralConv3dPreNorm(c * 4, k_size=1, padding=0, name="d3_out")(
            GeneralConv3dPreNorm(c * 4, name="d3_c2")(
                jnp.concatenate([de_x3, de_x4], axis=-1)))
        pred2 = Conv3d(self.num_cls, k_size=1, padding=0, name="seg_d2")(de_x3_f)
        de_x3 = GeneralConv3dPreNorm(c * 2, name="d2_c1")(
            upsample_trilinear(de_x3_f, 2))

        de_x2 = FusionPreNorm(c * 2, name="RFM2")(x2, in_mask=pm_mask,
                                                  prenormed=pn)
        de_x2_f = GeneralConv3dPreNorm(c * 2, k_size=1, padding=0, name="d2_out")(
            GeneralConv3dPreNorm(c * 2, name="d2_c2")(
                jnp.concatenate([de_x2, de_x3], axis=-1)))
        pred1 = Conv3d(self.num_cls, k_size=1, padding=0, name="seg_d1")(de_x2_f)

        if x1.shape[1] == x2.shape[1]:
            # x1 arrives in space-to-depth layout: the whole scale-1 stage
            # runs on the block grid with dense channels (ops/s2d.py) —
            # exact polyphase execution, identical param tree (raw twins).
            kd1c1 = RawGeneralConv3dParams(c, c * 2, 3, name="d1_c1")()
            rfm1 = FusionPreNormRawParams(c, c * 4, name="RFM1")()
            kd1c2 = RawGeneralConv3dParams(c, c * 2, 3, name="d1_c2")()
            kd1out = RawGeneralConv3dParams(c, c, 1, name="d1_out")()
            kseg, bseg = RawConv3dParams(self.num_cls, c, 1,
                                         name="seg_layer")()
            de_x2s = s2d.prenorm_conv_s2d(
                upsample2_trilinear_s2d(de_x2_f), *kd1c1, k_size=3)
            de_x1s = x1
            for i, ((k, b), ksz) in enumerate(zip(rfm1, (1, 3, 1))):
                if pn and i == 0:
                    # premasked mode: x1 is prenormed (encode-hoisted
                    # IN+LReLU) and unmasked; mask the 1x1 kernel rows
                    k = mask_kernel_rows(k, pm_mask)
                    de_x1s = s2d.s2d_conv(de_x1s, s2d.s2d_conv1_kernel(k),
                                          s2d.s2d_bias(b))
                    continue
                # fusion_prenorm's k3 conv is ZERO-padded (see FusionPreNorm)
                de_x1s = s2d.prenorm_conv_s2d(de_x1s, k, b, k_size=ksz,
                                              pad_mode="zeros")
            h = s2d.prenorm_conv_s2d(
                jnp.concatenate([de_x1s, de_x2s], axis=-1), *kd1c2, k_size=3)
            de_x1_fs = s2d.prenorm_conv_s2d(h, *kd1out, k_size=1)
            logits = s2d.depth_to_space(
                s2d.s2d_conv(de_x1_fs, s2d.s2d_conv1_kernel(kseg),
                             s2d.s2d_bias(bseg)))
            de_x1_f = s2d.depth_to_space(de_x1_fs)
        else:
            de_x2 = GeneralConv3dPreNorm(c, name="d1_c1")(
                upsample_trilinear(de_x2_f, 2))
            de_x1 = FusionPreNorm(c, name="RFM1")(x1, in_mask=pm_mask,
                                                  prenormed=pn)
            de_x1_f = GeneralConv3dPreNorm(c, k_size=1, padding=0,
                                           name="d1_out")(
                GeneralConv3dPreNorm(c, name="d1_c2")(
                    jnp.concatenate([de_x1, de_x2], axis=-1)))
            logits = Conv3d(self.num_cls, k_size=1, padding=0,
                            name="seg_layer")(de_x1_f)

        return logits, (pred1, pred2, pred3, pred4), (
            de_x1_f, de_x2_f, de_x3_f, de_x4_f, de_x5_f)


class EncodeConv(nn.Module):
    """Per-modality 1x1 conv to transformer width (mmformer.py:337-340),
    grouped over the flat modality-channel axis."""

    trans_dim: int = TRANSFORMER_DIM

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.trans_dim * NUM_MODALS, (1, 1, 1),
                       feature_group_count=NUM_MODALS)(x)


class FusePath(nn.Module):
    """InterFormer + fusion decoder for ONE modality mask.

    Vmapped over a stacked mask axis with tied params to realize the
    reference's 5 sequential passes (mmformer.py:447,468-531) as one batched
    computation.
    """

    num_cls: int = 4
    basic_dims: int = 8
    heads: int = NUM_HEADS
    mlp_dim: int = MLP_DIM
    depth: int = DEPTH

    @nn.compact
    def __call__(self, feats, intra_stack, pos_all, mask,
                 deterministic: bool = True, premasked: bool = False):
        """feats: tuple of 4 flat scales (B,...,4*C_k); intra_stack:
        (B,4,T,512); pos_all: (1, 4T, 512); mask: (B, 4).

        `premasked` (static, sweep-fuse fast path): feats arrive UNMASKED
        with each scale's first-RFM IN+LReLU already applied
        (MMFormer.features hoists it — it is mask-independent); the mask is
        folded into the RFM first-conv kernels inside DecoderFuse instead
        of copying the GB-scale stored features per mask. Requires a
        batch-uniform mask (the sweep engine broadcasts one mask per call);
        token masking still uses the full (B, 4) mask."""
        b, _, t, d = intra_stack.shape
        s = round(t ** (1 / 3))
        tokens = mask_modalities(intra_stack, mask).reshape(b, NUM_MODALS * t, d)
        x1_s2d = feats[0].shape[1] == feats[1].shape[1]
        inter = Transformer(self.depth, self.heads, self.mlp_dim,
                            name="multimodal_transformer")(
            tokens, pos_all, deterministic)
        # Reference reshape scramble (mmformer.py:444): (B, 4T, 512) ->
        # (B, s, s, s, 2048), then a learned 1x1 decode conv.
        x5 = inter.reshape(b, s, s, s, d * NUM_MODALS)
        x5 = nn.Conv(self.basic_dims * 16 * NUM_MODALS, (1, 1, 1),
                     name="multimodal_decode_conv")(x5)
        if premasked:
            flat = list(feats)
            pm_mask = mask[0]
        else:
            flat = [(s2d.mask_channels_s2d(f, mask) if k == 0 and x1_s2d
                     else mask_channels(f, mask))
                    for k, f in enumerate(feats)]
            pm_mask = None
        return DecoderFuse(self.num_cls, self.basic_dims, name="decoder_fuse")(
            *flat, x5, pm_mask=pm_mask)


class MMFormer(nn.Module):
    """mmFormer backbone with PASSION training outputs (mmformer.py:328-659)."""

    # Inference-trace norm implementation (engine/sliding_window.py): with
    # the r5 premasked fuse, XLA's native norm fuses stats into this
    # model's conv epilogues and beats the Pallas kernel by ~37 ms/pass
    # (RFNet/M2FTrans keep the Pallas default — their fuse paths OOM with
    # the XLA norm's fp32 intermediates at auto wb=75).
    PALLAS_INFER_NORM = False

    num_cls: int = 4
    basic_dims: int = 8
    mask_type: str = "idt"
    patch_size: int = 80  # training patch edge; bottleneck tokens = (ps/16)^3
    trans_dim: int = TRANSFORMER_DIM
    mlp_dim: int = MLP_DIM
    heads: int = NUM_HEADS
    depth: int = DEPTH
    use_s2d: bool = True  # polyphase scale-1 execution (ops/s2d.py)

    # Deep-supervision schedule: preds at 1/2..1/16 resolution
    # (mmformer.py:540-544, up_ops=[up2, up4, up8, up16]).
    PRM_WEIGHTS = (0.5, 0.25, 0.125, 0.0625)
    PRM_UPSCALES = (2, 4, 8, 16)

    def setup(self):
        self.encoder = GroupedEncoder(self.basic_dims, self.use_s2d,
                                      name="encoders")
        self.encode_convs = EncodeConv(self.trans_dim, name="encode_convs")
        self.intra_transformers = nn.vmap(
            Transformer, in_axes=(1, 0, None), out_axes=1,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )(self.depth, self.heads, self.mlp_dim, name="intra_transformers")
        # remat: the PASSION training forward runs FusePath 5x (real mask +
        # 4 unimodal) and DecoderSep 4x at 80^3 — rematerializing their
        # activations in the backward pass is what fits the step in HBM
        # (SURVEY §7 hard-part 2).
        self.decoder_sep = decoder_remat(DecoderSep)(
            self.num_cls, self.basic_dims, name="decoder_sep")
        self.fuse_path = nn.vmap(
            # static: deterministic + premasked flags
            decoder_remat(FusePath, static_argnums=(5, 6)),
            in_axes=(None, None, None, 0, None, None), out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False, "dropout": True},
        )(self.num_cls, self.basic_dims, self.heads, self.mlp_dim,
          self.depth, name="fuse_path")
        t = (self.patch_size // 16) ** 3
        # Learned per-modality positional embeddings (mmformer.py:342-345);
        # zero-init as in the reference.
        self.pos = self.param("pos", nn.initializers.zeros,
                              (NUM_MODALS, 1, t, self.trans_dim))

    def encode(self, x, mask, deterministic: bool = True):
        """Returns (flat scales x1..x5 (B,...,4*C_k), intra_stack
        (B,4,T,512), pos_all (1,4T,512)). x1 is in space-to-depth layout
        when the polyphase path is active (block grid == x2's grid)."""
        idt = self.mask_type != "pdt"
        if idt:
            x = x * mask.astype(x.dtype)[:, None, None, None, :]
        feats = self.encoder(x)
        if idt:
            feats = tuple(
                (s2d.mask_channels_s2d(f, mask)
                 if k == 0 and f.shape[1] == feats[1].shape[1]
                 else mask_channels(f, mask))
                for k, f in enumerate(feats))

        x5 = feats[4]  # (B, s, s, s, 4*16c)
        b, s = x5.shape[0], x5.shape[1]
        t = s ** 3
        if t != self.pos.shape[2]:
            raise ValueError(
                f"input bottleneck has {t} tokens but pos embedding was sized "
                f"for patch_size={self.patch_size}; construct the model with "
                f"the matching patch_size")
        # grouped 1x1 -> (B, s, s, s, 4*D) modality-major -> (B, 4, T, D)
        tok = self.encode_convs(x5).reshape(b, t, NUM_MODALS, self.trans_dim)
        tok = tok.transpose(0, 2, 1, 3)
        intra = self.intra_transformers(tok, self.pos, deterministic)
        # mmformer.py:433 — intra tokens are masked in both pdt and idt modes
        intra = mask_modalities(intra, mask)
        pos_all = jnp.moveaxis(self.pos, 1, 0).reshape(
            1, NUM_MODALS * t, self.trans_dim)
        return feats, intra, pos_all

    def __call__(self, x, mask, deterministic: bool = True):
        feats, intra, pos_all = self.encode(x, mask, deterministic)
        logits, _, _ = self.fuse_path(feats[:4], intra, pos_all, mask[None],
                                      deterministic, False)
        return jax.nn.softmax(logits[0], axis=-1)

    def _pos_all(self):
        t = self.pos.shape[2]
        return jnp.moveaxis(self.pos, 1, 0).reshape(
            1, NUM_MODALS * t, self.trans_dim)

    def features(self, x, deterministic: bool = True):
        """Mask-INDEPENDENT window features for the 15-mask sweep.

        Encoders are modality-grouped and the IntraFormer is per-modality,
        so neither depends on the mask; FusePath applies ALL masking itself
        (tokens via mask_modalities, conv skips via mask_channels), hence
        `fuse_inference(features(x), m) == __call__(x, m)` for every mask m.
        """
        feats = self.encoder(x)
        x5 = feats[4]
        b, s = x5.shape[0], x5.shape[1]
        t = s ** 3
        if t != self.pos.shape[2]:
            raise ValueError(
                f"input bottleneck has {t} tokens but pos embedding was sized "
                f"for patch_size={self.patch_size}")
        tok = self.encode_convs(x5).reshape(b, t, NUM_MODALS, self.trans_dim)
        tok = tok.transpose(0, 2, 1, 3)
        intra = self.intra_transformers(tok, self.pos, deterministic)
        # x1 is stored in space-to-depth layout: dense TPU tiles (a stored
        # conventional (80^3, 32) bf16 tensor tile-pads 4x in HBM).
        x1 = feats[0]
        if x1.shape[1] != feats[1].shape[1]:  # encoder returned conventional
            x1 = s2d.space_to_depth(x1)
        # Hoist each scale's first-RFM IN+LReLU out of the per-mask fuse
        # loop: with the mask folded into the RFM kernels (premasked
        # DecoderFuse), the norm input is the SAME unmasked feature for all
        # 15 masks — compute it once per case here instead of 15x there.
        # Exactness: per-(window, channel) IN statistics are untouched by
        # other channels' masking, and every masked channel's contribution
        # dies in the zeroed kernel rows (mask_kernel_rows).
        x1 = instance_norm_lrelu(x1, phase_group=8)
        rest = tuple(instance_norm_lrelu(f) for f in feats[1:4])
        return {"x1s": x1, "rest": rest, "intra": intra}

    def fuse_inference(self, fts, mask, deterministic: bool = True):
        """InterFormer + fusion decode + softmax from precomputed features.
        x1 stays in S2D layout straight into the fusion decoder; stored
        scales are prenormed and unmasked — the premasked FusePath folds
        `mask` into the RFM kernels (batch-uniform mask required, which the
        sweep engine guarantees by broadcasting one mask per call)."""
        feats = (fts["x1s"],) + tuple(fts["rest"])
        logits, _, _ = self.fuse_path(feats, fts["intra"],
                                      self._pos_all(), mask[None],
                                      deterministic, True)
        return jax.nn.softmax(logits[0], axis=-1)

    def train_losses(self, x, mask, target, temp=1.0, use_passion=True,
                     deterministic: bool = True):
        """Training forward with in-graph per-sample losses
        (mmformer.py:449-657). Returns the same dict as RFNet.train_losses."""
        sg = jax.lax.stop_gradient
        idt = self.mask_type != "pdt"
        b = x.shape[0]
        feats, intra, pos_all = self.encode(x, mask, deterministic)

        masks = _unimodal_mask_stack(mask) if use_passion else mask[None]
        fuse_logits, prms, de_feats = self.fuse_path(
            feats[:4], intra, pos_all, masks, deterministic, False)

        # x1 stays in S2D layout: the modality slice is contiguous there too
        # (modality-major original channels, each expanded by 8 phases), and
        # DecoderSep runs its scale-1 stage on the block grid directly.
        per_mod = [split_modalities(f) for f in feats]  # [scale][modality]
        sep_preds = [self.decoder_sep(*[per_mod[k][m] for k in range(5)])
                     for m in range(NUM_MODALS)]

        modal_gate = mask.astype(jnp.float32) if idt else jnp.ones(
            (b, NUM_MODALS), jnp.float32)
        if idt:  # mask sep predictions (mmformer.py:461-462)
            sep_preds = [p * modal_gate[:, m, None, None, None, None]
                         for m, p in enumerate(sep_preds)]

        sep_cols = [
            losses.softmax_weighted_loss_bs(sep_preds[m], target, self.num_cls)
            + losses.dice_loss_bs(sep_preds[m], target, self.num_cls)
            for m in range(NUM_MODALS)
        ]
        sep_loss = jnp.concatenate(sep_cols, axis=1) * modal_gate

        prm_loss = jnp.zeros((b, 1), jnp.float32)
        for k, (w, up) in enumerate(zip(self.PRM_WEIGHTS, self.PRM_UPSCALES)):
            p = jax.nn.softmax(prms[k][0], axis=-1)
            prm_loss = prm_loss + w * (
                losses.softmax_weighted_loss_bs(p, target, self.num_cls, up_scale=up)
                + losses.dice_loss_bs(p, target, self.num_cls, up_scale=up)
            )

        if not use_passion:
            zeros = jnp.zeros((b, NUM_MODALS), jnp.float32)
            return dict(
                fuse_pred=jax.nn.softmax(fuse_logits[0], axis=-1),
                prm_loss=prm_loss, sep_loss=sep_loss,
                kl_loss=zeros, proto_loss=zeros, dist=zeros,
            )

        kl_cols, proto_cols, dist_cols = [], [], []
        teacher_fuse = sg(fuse_logits[0])
        teacher_feat = sg(de_feats[0][0])
        for m in range(NUM_MODALS):
            kl = losses.temp_kl_loss_bs(
                fuse_logits[m + 1], teacher_fuse, target, self.num_cls, temp)
            for k, (w, up) in enumerate(zip(self.PRM_WEIGHTS, self.PRM_UPSCALES)):
                kl = kl + w * losses.temp_kl_loss_bs(
                    prms[k][m + 1], sg(prms[k][0]), target, self.num_cls, temp,
                    up_scale=up)
            proto, dist = losses.prototype_passion_loss_bs(
                de_feats[0][m + 1], teacher_feat, target,
                fuse_logits[m + 1], teacher_fuse, self.num_cls, temp)
            kl_cols.append(kl)
            proto_cols.append(proto)
            dist_cols.append(dist)

        kl_loss = jnp.concatenate(kl_cols, axis=1) * modal_gate
        proto_loss = jnp.concatenate(proto_cols, axis=1) * modal_gate
        dist = jnp.concatenate(dist_cols, axis=1) * modal_gate
        dist = zero_unimodal_self_dist(dist, mask)

        return dict(
            fuse_pred=jax.nn.softmax(fuse_logits[0], axis=-1),
            prm_loss=prm_loss, sep_loss=sep_loss,
            kl_loss=kl_loss, proto_loss=proto_loss, dist=dist,
        )


Model = MMFormer
