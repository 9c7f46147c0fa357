"""M2FTrans: masked-attention fusion transformer, TPU-native rebuild of
code/models/m2ftrans.py.

Architecture (reference m2ftrans.py:63-241,399-460,473-566): five-stage conv
encoders per modality; a *Bottleneck* — 4xT modality tokens concatenated with
T learnable fusion tokens through a depth-3 MaskedTransformer whose attention
is block-masked so fusion tokens see only PRESENT modalities and modality
tokens attend within-modality (models/mask.py:5-22, rebuilt as a traced bias
in ops/attn_mask.py); *Weight_Attention* — the first transformer layer's
fusion-row attention converted to per-modality spatial weight maps, upsampled
x2 (nearest) to modulate all 5 skip levels; *Decoder_fusion* — MultiCrossToken
channel cross-attention fusion at the two deepest scales, fusion_postnorm at
the shallow scales, prm_fusion deep-supervision heads at all 5 scales.

TPU-first: per-modality encoders are one nn.vmap-lifted encoder; the PASSION
training forward's 5 Bottleneck+WeightAttention+decoder passes
(m2ftrans.py:547,588-643) are one vmapped pass over a stacked (5, B, 4) mask
axis with tied params.
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
    FusionPostNorm,
    GeneralConv3d,
    MaskedTransformer,
    MultiCrossToken,
    PRMFusion,
    RawConv3dParams,
    RawGeneralConv3dParams,
    mask_channels,
    split_modalities,
    zero_unimodal_self_dist,
)
from passion_tpu.models.rfnet import _unimodal_mask_stack
from passion_tpu.ops import s2d
from passion_tpu.ops.resize import (upsample2_trilinear_s2d, upsample_nearest, upsample_trilinear)

NUM_MODALS = 4
MLP_DIM = 4096
NUM_HEADS = 8
DEPTH = 3


class GroupedEncoder(nn.Module):
    """5-stage post-norm conv encoder for all 4 modalities at once
    (m2ftrans.py:63-103), grouped per modality. (B,H,W,Z,4) -> flat scales.

    With `use_s2d` (default), the 80-cube stage-1 block and the stage-2
    entry run in the space-to-depth polyphase domain (ops/s2d.py) — exact,
    identical param tree. x1 is converted back to conventional layout at
    exit because M2FTrans' weight-attention decoder consumes it spatially.
    """

    basic_dims: int = 8
    use_s2d: bool = True

    @nn.compact
    def __call__(self, x):
        c, g = self.basic_dims, NUM_MODALS

        def gc(feat, **kw):
            return GeneralConv3d(feat * g, groups=g, **kw)

        if self.use_s2d and all(d % 2 == 0 for d in x.shape[1:4]):
            k1, b1 = RawGeneralConv3dParams(c * g, 1, name="e1_c1")()
            k2, b2 = RawGeneralConv3dParams(c * g, c, name="e1_c2")()
            k3, b3 = RawGeneralConv3dParams(c * g, c, name="e1_c3")()
            ks, bs = RawGeneralConv3dParams(c * 2 * g, c, name="e2_c1")()

            def gen_s2d(xin, k, b):
                return s2d.conv_postnorm_s2d(xin, k, b, k_size=3, groups=g)

            xs = s2d.space_to_depth(x)
            x1s = gen_s2d(xs, k1, b1)
            x1s = x1s + gen_s2d(gen_s2d(x1s, k2, b2), k3, b3)
            x2 = s2d.s2d_conv(s2d.s2d_pad(x1s, right=False),
                              s2d.s2d_conv3_stride2_kernel(ks, groups=g), bs)
            x2 = instance_norm_lrelu(x2)
            x1 = s2d.depth_to_space(x1s)
        else:
            x1 = gc(c, name="e1_c1")(x)
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
    """Shared 5-scale per-modality decoder -> softmax (m2ftrans.py:105-153)."""

    num_cls: int = 4
    basic_dims: int = 8

    @nn.compact
    def __call__(self, x1, x2, x3, x4, x5):
        c = self.basic_dims
        de = GeneralConv3d(c * 8, name="d4_c1")(upsample_trilinear(x5, 2))
        de = GeneralConv3d(c * 8, k_size=1, padding=0, name="d4_out")(
            GeneralConv3d(c * 8, name="d4_c2")(jnp.concatenate([de, x4], axis=-1)))
        de = GeneralConv3d(c * 4, name="d3_c1")(upsample_trilinear(de, 2))
        de = GeneralConv3d(c * 4, k_size=1, padding=0, name="d3_out")(
            GeneralConv3d(c * 4, name="d3_c2")(jnp.concatenate([de, x3], axis=-1)))
        de = GeneralConv3d(c * 2, name="d2_c1")(upsample_trilinear(de, 2))
        de = GeneralConv3d(c * 2, k_size=1, padding=0, name="d2_out")(
            GeneralConv3d(c * 2, name="d2_c2")(jnp.concatenate([de, x2], axis=-1)))
        if x1.shape[1] == x2.shape[1]:  # x1 in space-to-depth layout:
            # run the whole scale-1 stage on the block grid (ops/s2d.py) —
            # exact polyphase execution, identical param tree via raw twins.
            # Canonical 80-cube C=8-16 convs otherwise dominate the training
            # backward as non-MXU weight/input-gradient fusions (profiled).
            kd1c1 = RawGeneralConv3dParams(c, c * 2, 3, name="d1_c1")()
            kd1c2 = RawGeneralConv3dParams(c, c * 2, 3, name="d1_c2")()
            kd1out = RawGeneralConv3dParams(c, c, 1, name="d1_out")()
            kseg, bseg = RawConv3dParams(self.num_cls, c, 1,
                                         name="seg_layer")()
            des = s2d.conv_postnorm_s2d(
                upsample2_trilinear_s2d(de), *kd1c1, k_size=3)
            des = s2d.conv_postnorm_s2d(
                jnp.concatenate([des, x1], axis=-1), *kd1c2, k_size=3)
            des = s2d.conv_postnorm_s2d(des, *kd1out, k_size=1)
            logits = s2d.depth_to_space(
                s2d.s2d_conv(des, s2d.s2d_conv1_kernel(kseg),
                             s2d.s2d_bias(bseg)))
        else:
            de = GeneralConv3d(c, name="d1_c1")(upsample_trilinear(de, 2))
            de = GeneralConv3d(c, k_size=1, padding=0, name="d1_out")(
                GeneralConv3d(c, name="d1_c2")(
                    jnp.concatenate([de, x1], axis=-1)))
            logits = Conv3d(self.num_cls, k_size=1, padding=0,
                            name="seg_layer")(de)
        return jax.nn.softmax(logits, axis=-1)


class DecoderFusion(nn.Module):
    """Fusion decoder with cross-token fusion at deep scales
    (m2ftrans.py:156-241).

    Args:
      wx1..wx5: weight-attention-modulated stacked features (B, 4, ..., C_k);
      fusion: transformed fusion-token volume (B, s, s, s, 16c);
      mask: (B, 4) per-pass modality mask.
    Returns (logits, (prm1..prm5), (de_x1..de_x5)).
    """

    num_cls: int = 4
    basic_dims: int = 8

    @nn.compact
    def __call__(self, wx1, wx2, wx3, wx4, wx5, fusion, mask,
                 deterministic: bool = True):
        c = self.basic_dims

        prm5 = PRMFusion(self.num_cls, name="prm_fusion5")(fusion)
        de_x5 = MultiCrossToken(name="CT5")(wx5, fusion, mask,
                                            deterministic=deterministic)
        de_x5 = jnp.concatenate([de_x5, fusion], axis=-1)
        de_x5 = GeneralConv3d(c * 16, k_size=1, padding=0, name="d5_out")(
            GeneralConv3d(c * 16, name="d5_c2")(de_x5))
        de_x5 = GeneralConv3d(c * 8, name="d4_c1")(upsample_trilinear(de_x5, 2))

        prm4 = PRMFusion(self.num_cls, name="prm_fusion4")(de_x5)
        de_x4 = MultiCrossToken(name="CT4")(wx4, de_x5, mask,
                                            deterministic=deterministic)
        de_x4 = jnp.concatenate([de_x4, de_x5], axis=-1)
        de_x4 = GeneralConv3d(c * 8, k_size=1, padding=0, name="d4_out")(
            GeneralConv3d(c * 8, name="d4_c2")(de_x4))
        de_x4 = GeneralConv3d(c * 4, name="d3_c1")(upsample_trilinear(de_x4, 2))

        prm3 = PRMFusion(self.num_cls, name="prm_fusion3")(de_x4)
        de_x3 = FusionPostNorm(c * 4, name="RFM3")(wx3, mask)
        de_x3 = jnp.concatenate([de_x3, de_x4], axis=-1)
        de_x3 = GeneralConv3d(c * 4, k_size=1, padding=0, name="d3_out")(
            GeneralConv3d(c * 4, name="d3_c2")(de_x3))
        de_x3 = GeneralConv3d(c * 2, name="d2_c1")(upsample_trilinear(de_x3, 2))

        prm2 = PRMFusion(self.num_cls, name="prm_fusion2")(de_x3)
        de_x2 = FusionPostNorm(c * 2, name="RFM2")(wx2, mask)
        de_x2 = jnp.concatenate([de_x2, de_x3], axis=-1)
        de_x2 = GeneralConv3d(c * 2, k_size=1, padding=0, name="d2_out")(
            GeneralConv3d(c * 2, name="d2_c2")(de_x2))
        de_x2 = GeneralConv3d(c, name="d1_c1")(upsample_trilinear(de_x2, 2))

        prm1 = PRMFusion(self.num_cls, name="prm_fusion1")(de_x2)
        de_x1 = FusionPostNorm(c, name="RFM1")(wx1, mask)
        de_x1 = jnp.concatenate([de_x1, de_x2], axis=-1)
        de_x1 = GeneralConv3d(c, k_size=1, padding=0, name="d1_out")(
            GeneralConv3d(c, name="d1_c2")(de_x1))

        logits = Conv3d(self.num_cls, k_size=1, padding=0, name="seg_layer")(de_x1)
        return logits, (prm1, prm2, prm3, prm4, prm5), (
            de_x1, de_x2, de_x3, de_x4, de_x5)


def _weight_maps(attn0, s):
    """Fusion-row attention -> per-modality spatial weights
    (m2ftrans.py:436-443).

    attn0: (B, heads, 5T, 5T) first-layer attention (already stop-gradiented).
    Returns (B, s, s, s, 4) channels-last: per modality, total attention its
    token at each voxel receives from all fusion tokens and heads.
    """
    t = s ** 3
    fusion_rows = attn0[:, :, NUM_MODALS * t:, :]  # (B, H, T, 5T)
    per_mod = jnp.sum(fusion_rows, axis=(1, 2))  # (B, 5T)
    maps = per_mod[:, : NUM_MODALS * t].reshape(
        attn0.shape[0], NUM_MODALS, s, s, s)
    return jnp.moveaxis(maps, 1, 4)


class FusePath(nn.Module):
    """Bottleneck + Weight_Attention + fusion decoder for ONE modality mask.

    Vmapped over a stacked mask axis with tied params to realize the
    reference's 5 sequential passes (m2ftrans.py:547,588-643) as one batched
    computation.
    """

    num_cls: int = 4
    basic_dims: int = 8
    heads: int = NUM_HEADS
    mlp_dim: int = MLP_DIM
    depth: int = DEPTH

    @nn.compact
    def __call__(self, feats, fusion_tokens, pos, mask,
                 deterministic: bool = True):
        """feats: tuple of 5 FLAT scales (B,...,4*C_k); fusion_tokens:
        (B,T,16c); pos: (1, 5T, 16c); mask: (B, 4)."""
        c = self.basic_dims
        e = c * 16
        x5 = feats[4]  # (B, s, s, s, 4*16c) flat modality-major
        b, s = x5.shape[0], x5.shape[1]
        t = s ** 3
        # flat channels -> modality-major token sequence (B, 4T, E)
        embed = x5.reshape(b, t, NUM_MODALS, e).transpose(0, 2, 1, 3)
        embed = embed.reshape(b, NUM_MODALS * t, e)
        tokens = jnp.concatenate([embed, fusion_tokens], axis=1) + pos
        tokens, attn_list = MaskedTransformer(
            self.depth, self.heads, self.mlp_dim, name="trans_bottle")(
            tokens, mask, deterministic)

        chunks = tokens.reshape(b, NUM_MODALS + 1, t, e)
        modal_tra = chunks[:, :NUM_MODALS].reshape(b, NUM_MODALS, s, s, s, e)
        fusion_tra = chunks[:, NUM_MODALS].reshape(b, s, s, s, e)

        # Weight_Attention (m2ftrans.py:420-460): nearest x2 between scales.
        # Weight maps are (B, S, S, S, 4) channels-last; a flat feature scale
        # is modulated by repeating each modality's map C_k times.
        w = _weight_maps(attn_list[0], s)  # (B, s, s, s, 4)
        wx5 = modal_tra * jnp.moveaxis(w, 4, 1)[..., None]  # small at s^3
        ws = [w]
        for _ in range(4):
            ws.append(upsample_nearest(ws[-1]))

        def modulate_flat(feat, wmap):
            ck = feat.shape[-1] // NUM_MODALS
            return feat * jnp.repeat(wmap, ck, axis=-1)

        # CT4 consumes a stacked (B, 4, s4, s4, s4, 8c) — small at 1/8 res.
        x4w = modulate_flat(feats[3], ws[1])
        s4 = x4w.shape[1]
        wx4 = jnp.moveaxis(
            x4w.reshape(b, s4, s4, s4, NUM_MODALS, c * 8), 4, 1)
        wx3 = modulate_flat(feats[2], ws[2])
        wx2 = modulate_flat(feats[1], ws[3])
        wx1 = modulate_flat(feats[0], ws[4])

        return DecoderFusion(self.num_cls, self.basic_dims,
                             name="decoder_fusion")(
            wx1, wx2, wx3, wx4, wx5, fusion_tra, mask, deterministic)


class M2FTrans(nn.Module):
    """M2FTrans backbone with PASSION training outputs (m2ftrans.py:473-771)."""

    num_cls: int = 4
    basic_dims: int = 8
    mask_type: str = "idt"
    patch_size: int = 80  # bottleneck tokens = (ps/16)^3
    heads: int = NUM_HEADS
    mlp_dim: int = MLP_DIM
    depth: int = DEPTH
    use_s2d: bool = True  # polyphase scale-1 execution (ops/s2d.py)

    # Deep supervision at full..1/16 resolution (m2ftrans.py:499-504,652-656).
    PRM_WEIGHTS = (0.5, 0.25, 0.125, 0.0625, 0.03125)
    PRM_UPSCALES = (1, 2, 4, 8, 16)

    def setup(self):
        e = self.basic_dims * 16
        t = (self.patch_size // 16) ** 3
        self.encoder = GroupedEncoder(self.basic_dims, self.use_s2d,
                                      name="encoders")
        # remat: see mmformer.MMFormer.setup
        self.decoder_sep = decoder_remat(DecoderSep)(
            self.num_cls, self.basic_dims, name="decoder_sep")
        self.fuse_path = nn.vmap(
            decoder_remat(FusePath, static_argnums=(5,)),  # deterministic flag
            in_axes=(None, None, None, 0, None), out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False, "dropout": True},
        )(self.num_cls, self.basic_dims, self.heads, self.mlp_dim,
          self.depth, name="fuse_path")
        # pos zero-init; fusion tokens ~ N(0,1) (m2ftrans.py:491-492)
        self.pos = self.param("pos", nn.initializers.zeros,
                              (1, t * (NUM_MODALS + 1), e))
        self.fusion = self.param(
            "fusion", nn.initializers.normal(stddev=1.0), (1, t, e))

    def encode(self, x, mask):
        idt = self.mask_type != "pdt"
        if idt:
            x = x * mask.astype(x.dtype)[:, None, None, None, :]
        feats = self.encoder(x)
        if idt:
            feats = tuple(mask_channels(f, mask) for f in feats)
        return feats

    def _fusion_tokens(self, b):
        return jnp.broadcast_to(self.fusion, (b,) + self.fusion.shape[1:])

    def __call__(self, x, mask, deterministic: bool = True):
        feats = self.encode(x, mask)
        logits, _, _ = self.fuse_path(
            feats, self._fusion_tokens(x.shape[0]), self.pos, mask[None],
            deterministic)
        return jax.nn.softmax(logits[0], axis=-1)

    def features(self, x, deterministic: bool = True):
        """Mask-INDEPENDENT window features for the 15-mask sweep.

        The grouped encoder is block-diagonal over modalities (groups=4
        convs), so a present modality's features never depend on an absent
        modality's input channel; zeroing the input (idt `encode`) and
        zeroing the feature channels (`fuse_inference`) are therefore
        interchangeable, and `fuse_inference(features(x), m) == __call__(x,
        m)` for every mask m. The sweep encodes once and runs only the
        Bottleneck + Weight_Attention + fusion decoder per mask (vs 15 full
        forwards in the reference, train.py:589-604)."""
        return self.encoder(x)

    def fuse_inference(self, fts, mask, deterministic: bool = True):
        """Fusion decode + softmax from precomputed `features`."""
        if self.mask_type != "pdt":
            fts = tuple(mask_channels(f, mask) for f in fts)
        logits, _, _ = self.fuse_path(
            fts, self._fusion_tokens(fts[0].shape[0]), self.pos, mask[None],
            deterministic)
        return jax.nn.softmax(logits[0], axis=-1)

    def train_losses(self, x, mask, target, temp=1.0, use_passion=True,
                     deterministic: bool = True):
        """Training forward with in-graph per-sample losses
        (m2ftrans.py:568-769). Returns the same dict as RFNet.train_losses."""
        sg = jax.lax.stop_gradient
        idt = self.mask_type != "pdt"
        b = x.shape[0]
        feats = self.encode(x, mask)

        masks = _unimodal_mask_stack(mask) if use_passion else mask[None]
        fuse_logits, prms, de_feats = self.fuse_path(
            feats, self._fusion_tokens(b), self.pos, masks, deterministic)

        per_mod = [split_modalities(f) for f in feats]  # [scale][modality]
        if self.use_s2d and all(d % 2 == 0 for d in feats[0].shape[1:4]):
            # re-express the scale-1 modality slices in space-to-depth layout
            # (a pure reshape/transpose) so DecoderSep runs its scale-1 stage
            # densely on the block grid instead of at 80^3 with C=8-16.
            per_mod[0] = [s2d.space_to_depth(t) for t in per_mod[0]]
        sep_preds = [self.decoder_sep(*[per_mod[k][m] for k in range(5)])
                     for m in range(NUM_MODALS)]

        modal_gate = mask.astype(jnp.float32) if idt else jnp.ones(
            (b, NUM_MODALS), jnp.float32)
        if idt:  # mask sep predictions (m2ftrans.py:580-581)
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


Model = M2FTrans
