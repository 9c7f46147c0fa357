"""RFNet: region-aware fusion CNN, TPU-native rebuild of code/models/rfnet.py.

Architecture (reference rfnet.py:15-152): four per-modality residual conv
encoders (dims 8->64, stride-2 downsampling over 4 scales), a shared
`Decoder_sep` U-Net decoder for the per-modality self-distillation targets,
and a `Decoder_fuse` that at each scale predicts a probability region map
(PRM) and re-weights modality features per region.

TPU-first re-design choices:
  * channels-last `(B, H, W, Z, C)`; per-modality features live FLAT on the
    channel axis, modality-major `(B, ..., 4*C)` — a stacked (B, 4, ..., 8)
    tensor's (4, 8) tail pads to (8, 128) TPU tiles (16-32x HBM waste), the
    flat tail stays dense;
  * the 4 per-modality encoders are ONE grouped-conv encoder
    (feature_group_count=4, stacked weights) — a single batched XLA op,
    mathematically identical to 4 separate encoders;
  * the shared sep-decoder runs per modality with tied params;
  * the PASSION training forward's 5 fusion-decoder passes (1 real mask +
    4 unimodal masks, reference rfnet.py:244,267-275) are ONE vmapped pass
    over a stacked `(5, B, 4)` mask axis with tied params;
  * per-sample `_bs` losses (reference rfnet.py:277-379) fall out of the
    batched computation directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from passion_tpu import losses
from passion_tpu.models.layers import (
    Conv3d,
    decoder_remat,
    GeneralConv3d,
    PRMGenerator,
    PRMGeneratorLastStage,
    PRMGeneratorRawParams,
    RawConv3dParams,
    RawGeneralConv3dParams,
    RegionAwareModalFusion,
    RegionAwareModalFusionS2D,
    leaky_relu,
    mask_channels,
    split_modalities,
    zero_unimodal_self_dist,
)
from passion_tpu.ops import s2d
from passion_tpu.ops.norm import instance_norm
from passion_tpu.ops.resize import upsample2_trilinear_s2d, upsample_trilinear

NUM_MODALS = 4


class GroupedEncoder(nn.Module):
    """4-scale residual conv encoder for all 4 modalities at once
    (rfnet.py:15-48), grouped so each modality sees only its own channels.
    Input (B, H, W, Z, 4) -> flat scales (B, ..., 4*c)..(B, ..., 4*8c).

    With `use_s2d` (default), the 80-cube stage-1 block and the stage-2
    entry execute in the space-to-depth polyphase domain (ops/s2d.py) — an
    exact re-indexing that makes the scale-1 tensors dense in the TPU lane
    dimension (measured 3.8x on the stage-1 block). The param tree is
    IDENTICAL either way (raw-param twins), so checkpoints and the torch
    importer are unaffected.
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
                y = s2d.s2d_conv(s2d.s2d_pad(xin),
                                 s2d.s2d_conv3_kernel(k, groups=g),
                                 s2d.s2d_bias(b))
                return leaky_relu(s2d.instance_norm_s2d(y))

            xs = s2d.space_to_depth(x)
            x1s = gen_s2d(xs, k1, b1)
            r = gen_s2d(gen_s2d(x1s, k2, b2), k3, b3)
            x1s = x1s + r
            x2 = s2d.s2d_conv(s2d.s2d_pad(x1s, right=False),
                              s2d.s2d_conv3_stride2_kernel(ks, groups=g), bs)
            x2 = leaky_relu(instance_norm(x2))
            # x1 STAYS in space-to-depth layout end-to-end; the fusion
            # decoder's scale-1 stage consumes it directly.
            x1 = x1s
        else:
            x1 = gc(c, name="e1_c1")(x)
            x1 = x1 + gc(c, name="e1_c3")(gc(c, name="e1_c2")(x1))
            x2 = gc(c * 2, stride=2, name="e2_c1")(x1)
        x2 = x2 + gc(c * 2, name="e2_c3")(gc(c * 2, name="e2_c2")(x2))
        x3 = gc(c * 4, stride=2, name="e3_c1")(x2)
        x3 = x3 + gc(c * 4, name="e3_c3")(gc(c * 4, name="e3_c2")(x3))
        x4 = gc(c * 8, stride=2, name="e4_c1")(x3)
        x4 = x4 + gc(c * 8, name="e4_c3")(gc(c * 8, name="e4_c2")(x4))
        return x1, x2, x3, x4


class DecoderSep(nn.Module):
    """Shared per-modality U-Net decoder -> softmax pred (rfnet.py:50-89).
    Applied once per modality with tied params (single-modality inputs)."""

    num_cls: int = 4
    basic_dims: int = 8

    @nn.compact
    def __call__(self, x1, x2, x3, x4):
        c = self.basic_dims
        de_x4 = GeneralConv3d(c * 4, name="d3_c1")(upsample_trilinear(x4, 2))
        cat_x3 = jnp.concatenate([de_x4, x3], axis=-1)
        de_x3 = GeneralConv3d(c * 4, k_size=1, padding=0, name="d3_out")(
            GeneralConv3d(c * 4, name="d3_c2")(cat_x3))
        de_x3 = GeneralConv3d(c * 2, name="d2_c1")(upsample_trilinear(de_x3, 2))
        cat_x2 = jnp.concatenate([de_x3, x2], axis=-1)
        de_x2 = GeneralConv3d(c * 2, k_size=1, padding=0, name="d2_out")(
            GeneralConv3d(c * 2, name="d2_c2")(cat_x2))
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
                upsample2_trilinear_s2d(de_x2), *kd1c1, k_size=3)
            des = s2d.conv_postnorm_s2d(
                jnp.concatenate([des, x1], axis=-1), *kd1c2, k_size=3)
            des = s2d.conv_postnorm_s2d(des, *kd1out, k_size=1)
            logits = s2d.depth_to_space(
                s2d.s2d_conv(des, s2d.s2d_conv1_kernel(kseg),
                             s2d.s2d_bias(bseg)))
        else:
            de_x2 = GeneralConv3d(c, name="d1_c1")(
                upsample_trilinear(de_x2, 2))
            cat_x1 = jnp.concatenate([de_x2, x1], axis=-1)
            de_x1 = GeneralConv3d(c, k_size=1, padding=0, name="d1_out")(
                GeneralConv3d(c, name="d1_c2")(cat_x1))
            logits = Conv3d(self.num_cls, k_size=1, padding=0,
                            name="seg_layer")(de_x1)
        return jax.nn.softmax(logits, axis=-1)


class DecoderFuse(nn.Module):
    """Region-aware fusion decoder (rfnet.py:91-152).

    Inputs are flat modality-major scales (B, ..., 4*C_k).
    Returns (fuse logits, (prm1..prm4 logits), (de_x1..de_x4 features)).
    """

    num_cls: int = 4
    basic_dims: int = 8

    @nn.compact
    def __call__(self, x1, x2, x3, x4, mask):
        c = self.basic_dims
        sg = jax.lax.stop_gradient

        prm4 = PRMGeneratorLastStage(c * 8, self.num_cls, name="prm_generator4")(x4, mask)
        de_x4 = RegionAwareModalFusion(c * 8, self.num_cls, name="RFM4")(
            x4, sg(jax.nn.softmax(prm4, axis=-1)), mask)
        de_x4 = GeneralConv3d(c * 4, name="d3_c1")(upsample_trilinear(de_x4, 2))

        prm3 = PRMGenerator(c * 4, self.num_cls, name="prm_generator3")(de_x4, x3, mask)
        de_x3 = RegionAwareModalFusion(c * 4, self.num_cls, name="RFM3")(
            x3, sg(jax.nn.softmax(prm3, axis=-1)), mask)
        de_x3 = jnp.concatenate([de_x3, de_x4], axis=-1)
        de_x3 = GeneralConv3d(c * 4, k_size=1, padding=0, name="d3_out")(
            GeneralConv3d(c * 4, name="d3_c2")(de_x3))
        de_x3 = GeneralConv3d(c * 2, name="d2_c1")(upsample_trilinear(de_x3, 2))

        prm2 = PRMGenerator(c * 2, self.num_cls, name="prm_generator2")(de_x3, x2, mask)
        de_x2 = RegionAwareModalFusion(c * 2, self.num_cls, name="RFM2")(
            x2, sg(jax.nn.softmax(prm2, axis=-1)), mask)
        de_x2 = jnp.concatenate([de_x2, de_x3], axis=-1)
        de_x2 = GeneralConv3d(c * 2, k_size=1, padding=0, name="d2_out")(
            GeneralConv3d(c * 2, name="d2_c2")(de_x2))

        if x1.shape[1] == x2.shape[1]:
            # x1 arrives in space-to-depth layout: the whole scale-1 stage
            # (PRM head, region-aware fusion, seg head) runs on the block
            # grid with dense channels — exact polyphase execution,
            # identical param tree (raw twins).
            prm1, de_x1, de_x2, logits = self._scale1_s2d(de_x2, x1, mask, sg)
        else:
            de_x2 = GeneralConv3d(c, name="d1_c1")(
                upsample_trilinear(de_x2, 2))
            prm1 = PRMGenerator(c, self.num_cls, name="prm_generator1")(
                de_x2, x1, mask)
            de_x1 = RegionAwareModalFusion(c, self.num_cls, name="RFM1")(
                x1, sg(jax.nn.softmax(prm1, axis=-1)), mask)
            de_x1 = jnp.concatenate([de_x1, de_x2], axis=-1)
            de_x1 = GeneralConv3d(c, k_size=1, padding=0, name="d1_out")(
                GeneralConv3d(c, name="d1_c2")(de_x1))
            logits = Conv3d(self.num_cls, k_size=1, padding=0,
                            name="seg_layer")(de_x1)
        return logits, (prm1, prm2, prm3, prm4), (de_x1, de_x2, de_x3, de_x4)

    def _scale1_s2d(self, de_x2_prev, x1s, mask, sg):
        """Scale-1 decoder stage in the space-to-depth domain (exact).

        de_x2_prev: (B, 40-grid, 2c) conventional; x1s: (B, 40-grid, 4c*8)
        S2D. Returns (prm1 logits, de_x1, de_x2, logits) at 80-grid
        conventional layout — converted back via depth_to_space (cheap; the
        heavy convs all ran dense)."""
        c = self.basic_dims
        kd1c1 = RawGeneralConv3dParams(c, c * 2, 3, name="d1_c1")()
        emb, head, out = PRMGeneratorRawParams(c, self.num_cls,
                                               name="prm_generator1")()
        de_x2s = s2d.conv_postnorm_s2d(
            upsample2_trilinear_s2d(de_x2_prev), *kd1c1, k_size=3)

        y = s2d.mask_channels_s2d(x1s, mask)
        e = y
        for (k, b), ksz in zip(emb, (1, 3, 1)):
            e = s2d.conv_postnorm_s2d(e, k, b, k_size=ksz)
        e = s2d.conv_postnorm_s2d(
            jnp.concatenate([de_x2s, e], axis=-1), *head, k_size=1)
        prm1s = s2d.s2d_conv(e, s2d.s2d_conv1_kernel(out[0]),
                             s2d.s2d_bias(out[1]))

        # softmax over the K classes within each (block, phase)
        v = prm1s.reshape(prm1s.shape[:4] + (self.num_cls, 8))
        prm_soft = sg(jax.nn.softmax(v, axis=-2)).reshape(prm1s.shape)

        de_x1s = RegionAwareModalFusionS2D(c, self.num_cls, name="RFM1")(
            y, prm_soft)

        de_x1s = jnp.concatenate([de_x1s, de_x2s], axis=-1)
        kd1c2 = RawGeneralConv3dParams(c, c * 2, 3, name="d1_c2")()
        kd1out = RawGeneralConv3dParams(c, c, 1, name="d1_out")()
        de_x1s = s2d.conv_postnorm_s2d(de_x1s, *kd1c2, k_size=3)
        de_x1s = s2d.conv_postnorm_s2d(de_x1s, *kd1out, k_size=1)
        kseg, bseg = RawConv3dParams(self.num_cls, c, 1, name="seg_layer")()
        logits = s2d.depth_to_space(
            s2d.s2d_conv(de_x1s, s2d.s2d_conv1_kernel(kseg),
                         s2d.s2d_bias(bseg)))
        return (s2d.depth_to_space(prm1s), s2d.depth_to_space(de_x1s),
                s2d.depth_to_space(de_x2s), logits)


def _unimodal_mask_stack(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, 4) -> (5, B, 4): [real mask, mod0-only, ..., mod3-only]."""
    b = mask.shape[0]
    eye = jnp.broadcast_to(
        jnp.eye(NUM_MODALS, dtype=mask.dtype)[:, None, :], (NUM_MODALS, b, NUM_MODALS)
    )
    return jnp.concatenate([mask[None], eye], axis=0)


class RFNet(nn.Module):
    """RFNet backbone with PASSION training outputs (rfnet.py:176-403)."""

    num_cls: int = 4
    basic_dims: int = 8
    mask_type: str = "idt"  # 'idt' | 'idt_drop' | 'pdt'
    use_s2d: bool = True  # polyphase scale-1 execution (ops/s2d.py)

    # PRM deep-supervision schedule: scale-k weight and upsample factor
    # (rfnet.py:284-288, up_ops=[Identity, up2, up4, up8]).
    PRM_WEIGHTS = (0.5, 0.25, 0.125, 0.0625)
    PRM_UPSCALES = (1, 2, 4, 8)

    def setup(self):
        self.encoder = GroupedEncoder(self.basic_dims, self.use_s2d,
                                      name="encoders")
        # remat: see mmformer.MMFormer.setup — the 5-pass fusion decoder and
        # 4x sep decoder dominate training-activation memory at 80^3.
        self.decoder_sep = decoder_remat(DecoderSep)(
            self.num_cls, self.basic_dims, name="decoder_sep")
        self.decoder_fuse = nn.vmap(
            decoder_remat(DecoderFuse),
            in_axes=(None, None, None, None, 0), out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )(self.num_cls, self.basic_dims, name="decoder_fuse")

    def encode(self, x, mask):
        """x: (B, H, W, Z, 4) modality-channel volume -> 4 flat scales
        (B, ..., 4*C_k) (masked under idt). x1 is in space-to-depth layout
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
        return feats

    def __call__(self, x, mask):
        """Inference: softmax fused prediction (rfnet.py:403)."""
        x1, x2, x3, x4 = self.encode(x, mask)
        logits, _, _ = self.decoder_fuse(x1, x2, x3, x4, mask[None])
        return jax.nn.softmax(logits[0], axis=-1)

    def features(self, x, deterministic: bool = True):
        """Mask-INDEPENDENT window features for the 15-mask sweep.

        The per-modality grouped encoder computes each modality's features
        from its own channels only, and the fusion decoder re-masks its
        inputs internally (PRM generators and RFM take `mask`), so
        `fuse_inference(features(x), m) == __call__(x, m)` for every mask m
        — the sweep encodes once and fuses 15x (vs 15 full forwards,
        reference train.py:589-604).

        x1 is stored in space-to-depth layout (dense TPU tiles vs 4x
        padding for a (80^3, 32) tail) and consumed directly by the
        decoder's polyphase scale-1 stage."""
        x1, x2, x3, x4 = self.encoder(x)
        if x1.shape[1] != x2.shape[1]:  # encoder returned conventional
            x1 = s2d.space_to_depth(x1)
        return {"x1s": x1, "rest": (x2, x3, x4)}

    def fuse_inference(self, fts, mask, deterministic: bool = True):
        """Fusion decode + softmax from precomputed `features`."""
        x2, x3, x4 = fts["rest"]
        logits, _, _ = self.decoder_fuse(fts["x1s"], x2, x3, x4, mask[None])
        return jax.nn.softmax(logits[0], axis=-1)

    def train_losses(self, x, mask, target, temp=1.0, use_passion=True,
                     deterministic: bool = True):
        """Training forward with in-graph per-sample losses (rfnet.py:246-379).

        `deterministic` is accepted for signature parity with the
        transformer backbones; RFNet has no dropout.

        Returns a dict with fuse_pred (softmax) and per-sample losses:
        prm (B,1), sep (B,4), kl (B,4), proto (B,4), dist (B,4).
        """
        sg = jax.lax.stop_gradient
        idt = self.mask_type != "pdt"
        b = x.shape[0]
        feats = self.encode(x, mask)
        x1, x2, x3, x4 = feats

        masks = _unimodal_mask_stack(mask) if use_passion else mask[None]
        fuse_logits, prms, de_feats = self.decoder_fuse(x1, x2, x3, x4, masks)

        # Shared sep decoder per modality (tied weights, rfnet.py:248-260).
        # x1 stays in S2D layout: the modality slice is contiguous there too
        # (modality-major original channels, each expanded by 8 phases), and
        # DecoderSep runs its scale-1 stage on the block grid directly.
        per_mod = [split_modalities(f) for f in feats]  # [scale][modality]
        sep_preds = [self.decoder_sep(*[per_mod[k][m] for k in range(4)])
                     for m in range(NUM_MODALS)]

        modal_gate = mask.astype(jnp.float32) if idt else jnp.ones(
            (b, NUM_MODALS), jnp.float32)
        if idt:  # mask sep predictions (rfnet.py:259-260)
            sep_preds = [p * modal_gate[:, m, None, None, None, None]
                         for m, p in enumerate(sep_preds)]

        # sep loss per modality (rfnet.py:292,336 etc.)
        sep_cols = [
            losses.softmax_weighted_loss_bs(sep_preds[m], target, self.num_cls)
            + losses.dice_loss_bs(sep_preds[m], target, self.num_cls)
            for m in range(NUM_MODALS)
        ]
        sep_loss = jnp.concatenate(sep_cols, axis=1) * modal_gate  # (B, 4)

        # prm deep supervision on the real-mask pass (rfnet.py:284-288)
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

        # PASSION distillation: unimodal passes 1..4 vs detached pass 0
        # (rfnet.py:336-377).
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


Model = RFNet
