"""Convert reference PyTorch checkpoints to passion_tpu flax params.

A user of the reference (code/models/rfnet.py etc.) can transplant a trained
`state_dict` into this framework and get numerically matching inference.
This is also the basis of the cross-framework parity tests: transplanted
weights must produce the same fused softmax prediction to ~1e-4, proving the
architectures (padding mode, norm placement, decoder wiring) agree.

Layout conventions translated here:
  * torch Conv3d weight (O, I, k, k, k)  ->  flax (k, k, k, I, O);
  * the 4 per-modality torch encoders    ->  ONE grouped conv per layer:
    kernels concatenated modality-major on the OUT axis (feature_group_count
    semantics: group g consumes input block g, produces output block g);
  * torch 1x1x1 convs used as per-region MLPs (modal_fusion.weight_layer)
    ->  flax Dense kernels (I, O);
  * InstanceNorm3d is parameter-free in the reference (affine=False), so
    norms carry no weights.

Only numpy is required here; `load_torch_checkpoint` gates the torch import.
"""

from __future__ import annotations

import numpy as np

# reference modality encoder attribute order (rfnet.py:178-186) — matches the
# canonical channel order FLAIR, T1ce, T1, T2 (masks.MODALITIES).
TORCH_MODALITIES = ("flair", "t1ce", "t1", "t2")

_ENC_LAYERS = tuple(f"e{i}_c{j}" for i in (1, 2, 3, 4) for j in (1, 2, 3))
_SEP_LAYERS = ("d3_c1", "d3_c2", "d3_out", "d2_c1", "d2_c2", "d2_out",
               "d1_c1", "d1_c2", "d1_out")


def load_torch_checkpoint(path):
    """Load a reference checkpoint (`torch.save({'state_dict': ...})`,
    train.py:359-364) into a {name: np.ndarray} dict, stripping the
    DataParallel 'module.' prefix."""
    import torch  # gated: only needed when importing torch checkpoints

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


def _set(tree, path, value):
    parts = path.split("/")
    for p in parts[:-1]:
        tree = tree.setdefault(p, {})
    tree[parts[-1]] = value


def _conv(sd, name):
    """torch conv '{name}.weight/.bias' -> flax {kernel, bias}."""
    w = np.asarray(sd[f"{name}.weight"], np.float32)
    out = {"kernel": np.transpose(w, (2, 3, 4, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"], np.float32)
    return out


def _grouped_conv(sd, names):
    """Stack per-modality torch convs into one grouped-conv kernel
    (kernels concatenated on the OUT axis, modality-major)."""
    ks, bs = [], []
    for n in names:
        w = np.asarray(sd[f"{n}.weight"], np.float32)
        ks.append(np.transpose(w, (2, 3, 4, 1, 0)))
        bs.append(np.asarray(sd[f"{n}.bias"], np.float32))
    return {"kernel": np.concatenate(ks, axis=-1),
            "bias": np.concatenate(bs, axis=0)}


def _dense(sd, name):
    """torch 1x1x1 conv '{name}' -> flax Dense {kernel (I,O), bias}."""
    w = np.asarray(sd[f"{name}.weight"], np.float32)  # (O, I, 1, 1, 1)
    return {"kernel": w.reshape(w.shape[0], w.shape[1]).T,
            "bias": np.asarray(sd[f"{name}.bias"], np.float32)}


def _linear(sd, name):
    """torch nn.Linear '{name}' -> flax Dense {kernel (I,O)[, bias]}."""
    w = np.asarray(sd[f"{name}.weight"], np.float32)  # (O, I)
    out = {"kernel": w.T}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"], np.float32)
    return out


def _layernorm(sd, name):
    """torch nn.LayerNorm '{name}' -> flax LayerNorm {scale, bias}."""
    return {"scale": np.asarray(sd[f"{name}.weight"], np.float32),
            "bias": np.asarray(sd[f"{name}.bias"], np.float32)}


def _transformer(sd, prefix, depth=1):
    """Reference Transformer (mmformer.py:280-311: per-layer
    Residual(PreNormDrop(LN, SelfAttention)) + Residual(PreNorm(LN, FFN)))
    -> flax models.layers.Transformer subtree."""
    t = {}
    for j in range(depth):
        att = f"{prefix}.cross_attention_list.{j}.fn"
        ffn = f"{prefix}.cross_ffn_list.{j}.fn"
        t[f"attn_norm_{j}"] = _layernorm(sd, f"{att}.norm")
        t[f"attn_{j}"] = {"qkv": _linear(sd, f"{att}.fn.qkv"),
                          "proj": _linear(sd, f"{att}.fn.proj")}
        t[f"ffn_norm_{j}"] = _layernorm(sd, f"{ffn}.norm")
        t[f"ffn_{j}"] = {"Dense_0": _linear(sd, f"{ffn}.fn.net.0"),
                         "Dense_1": _linear(sd, f"{ffn}.fn.net.3")}
    return t


def _stack_trees(trees):
    """Stack the leaves of structurally identical {str: ...} trees along a
    new leading axis (flax lifted-vmap variable_axes={'params': 0})."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: _stack_trees([t[k] for t in trees]) for k in first}
    return np.stack(trees, axis=0)


def mmformer_params_from_torch(sd, depth=1):
    """Reference mmformer.Model state_dict -> flax params for
    models.mmformer.MMFormer.

    Covers the full tree: grouped pre-norm encoder, per-modality IntraFormer
    (stacked under the lifted vmap's modality axis), shared InterFormer +
    decode conv inside FusePath, fusion decoder with RFM fusion_prenorm
    blocks and deep-supervision heads, shared sep decoder (reference
    mmformer.py:328-446, blocks.py:300-316,533-542).
    """
    p = {}
    # e1_c1 is a bare Conv3d (mmformer.py:28); the rest are prenorm convs.
    _set(p, "encoders/e1_c1/Conv_0", _grouped_conv(
        sd, [f"{m}_encoder.e1_c1" for m in TORCH_MODALITIES]))
    enc_layers = [f"e{i}_c{j}" for i in (1, 2, 3, 4, 5) for j in (1, 2, 3)
                  if (i, j) != (1, 1)]
    for layer in enc_layers:
        _set(p, f"encoders/{layer}/Conv3d_0/Conv_0", _grouped_conv(
            sd, [f"{m}_encoder.{layer}.conv" for m in TORCH_MODALITIES]))

    _set(p, "encode_convs/Conv_0", _grouped_conv(
        sd, [f"{m}_encode_conv" for m in TORCH_MODALITIES]))
    p["pos"] = np.stack(
        [np.asarray(sd[f"{m}_pos"], np.float32) for m in TORCH_MODALITIES],
        axis=0)
    p["intra_transformers"] = _stack_trees(
        [_transformer(sd, f"{m}_transformer", depth)
         for m in TORCH_MODALITIES])

    fp = {}
    fp["multimodal_transformer"] = _transformer(
        sd, "multimodal_transformer", depth)
    fp["multimodal_decode_conv"] = _conv(sd, "multimodal_decode_conv")
    df = {}
    sep_layers = [f"d{i}_{j}" for i in (4, 3, 2, 1) for j in ("c1", "c2", "out")]
    for layer in sep_layers:
        _set(df, f"{layer}/Conv3d_0/Conv_0",
             _conv(sd, f"decoder_fuse.{layer}.conv"))
    for head in ("seg_d4", "seg_d3", "seg_d2", "seg_d1", "seg_layer"):
        _set(df, f"{head}/Conv_0", _conv(sd, f"decoder_fuse.{head}"))
    for k in (1, 2, 3, 4, 5):
        for i in range(3):
            _set(df, f"RFM{k}/GeneralConv3dPreNorm_{i}/Conv3d_0/Conv_0",
                 _conv(sd, f"decoder_fuse.RFM{k}.fusion_layer.{i}.conv"))
    fp["decoder_fuse"] = df
    p["fuse_path"] = fp

    for layer in sep_layers:
        _set(p, f"decoder_sep/{layer}/Conv3d_0/Conv_0",
             _conv(sd, f"decoder_sep.{layer}.conv"))
    _set(p, "decoder_sep/seg_layer/Conv_0", _conv(sd, "decoder_sep.seg_layer"))

    return {"params": p}


def _dwconv_block(sd, name):
    """torch DepthWiseConvBlock (blocks.py:32-64) -> flax subtree."""
    return {
        "Conv_0": _conv(sd, f"{name}.conv1"),
        "LayerNorm_0": _layernorm(sd, f"{name}.norm1"),
        "Conv_1": _conv(sd, f"{name}.conv2"),
        "LayerNorm_1": _layernorm(sd, f"{name}.norm2"),
        "Conv_2": _conv(sd, f"{name}.conv3"),
        "LayerNorm_2": _layernorm(sd, f"{name}.norm3"),
    }


def _group_conv_block(sd, name):
    """torch GroupConvBlock (blocks.py:65-109) -> flax subtree."""
    return {
        "Conv_0": _conv(sd, f"{name}.pwconv1"),
        "LayerNorm_0": _layernorm(sd, f"{name}.norm1"),
        "Conv_1": _conv(sd, f"{name}.dwconv"),
        "LayerNorm_1": _layernorm(sd, f"{name}.norm2"),
        "Conv_2": _conv(sd, f"{name}.pwconv2"),
        "LayerNorm_2": _layernorm(sd, f"{name}.norm3"),
    }


def _multi_cross_token(sd, name, num_layers=2):
    """torch MultiCrossToken (m2ftrans.py:25-61) -> flax CT subtree."""
    mods = ("flair", "t1ce", "t1", "t2")
    out = {}
    for i in range(num_layers):
        ln = f"{name}.layers.{i}"
        layer = {"cross_attn": {
            "query_map": _dwconv_block(sd, f"{ln}.cross_attn.query_map"),
            "out_project": _dwconv_block(sd, f"{ln}.cross_attn.out_project"),
        }}
        for m in mods:
            layer["cross_attn"][f"key_map_{m}"] = _dwconv_block(
                sd, f"{ln}.cross_attn.key_map_{m}")
            layer["cross_attn"][f"value_map_{m}"] = _dwconv_block(
                sd, f"{ln}.cross_attn.value_map_{m}")
        layer["ffn1"] = _group_conv_block(sd, f"{ln}.ffn1")
        if f"{ln}.ffn2.pwconv1.weight" in sd:
            layer["ffn2"] = _group_conv_block(sd, f"{ln}.ffn2")
        out[f"layer_{i}"] = layer
    return out


def m2ftrans_params_from_torch(sd, depth=3):
    """Reference m2ftrans.Model state_dict -> flax params for
    models.m2ftrans.M2FTrans.

    Covers the grouped post-norm encoder, the masked Bottleneck transformer
    (fusion/pos parameters included), the MultiCrossToken fusion decoder
    with prm_fusion heads and fusion_postnorm RFM blocks, and the shared sep
    decoder (reference m2ftrans.py:63-241,399-566, blocks.py:32-109,206-297).
    """
    p = {}
    for layer in [f"e{i}_c{j}" for i in (1, 2, 3, 4, 5) for j in (1, 2, 3)]:
        _set(p, f"encoders/{layer}/Conv3d_0/Conv_0", _grouped_conv(
            sd, [f"{m}_encoder.{layer}.conv" for m in TORCH_MODALITIES]))

    p["pos"] = np.asarray(sd["pos"], np.float32)
    p["fusion"] = np.asarray(sd["fusion"], np.float32)

    fp = {"trans_bottle": _transformer(sd, "Bottleneck.trans_bottle", depth)}
    df = {}
    dec_layers = (["d5_c2", "d5_out"]
                  + [f"d{i}_{j}" for i in (4, 3, 2, 1)
                     for j in ("c1", "c2", "out")])
    for layer in dec_layers:
        _set(df, f"{layer}/Conv3d_0/Conv_0",
             _conv(sd, f"decoder_fusion.{layer}.conv"))
    _set(df, "seg_layer/Conv_0", _conv(sd, "decoder_fusion.seg_layer"))
    for k in (1, 2, 3):
        for i in range(3):
            _set(df, f"RFM{k}/GeneralConv3d_{i}/Conv3d_0/Conv_0",
                 _conv(sd, f"decoder_fusion.RFM{k}.fusion_layer.{i}.conv"))
    for k in (1, 2, 3, 4, 5):
        _set(df, f"prm_fusion{k}/GeneralConv3d_0/Conv3d_0/Conv_0",
             _conv(sd, f"decoder_fusion.prm_fusion{k}.prm_layer.0.conv"))
        _set(df, f"prm_fusion{k}/Conv3d_0/Conv_0",
             _conv(sd, f"decoder_fusion.prm_fusion{k}.prm_layer.1"))
    df["CT5"] = _multi_cross_token(sd, "decoder_fusion.CT5")
    df["CT4"] = _multi_cross_token(sd, "decoder_fusion.CT4")
    fp["decoder_fusion"] = df
    p["fuse_path"] = fp

    sep_layers = [f"d{i}_{j}" for i in (4, 3, 2, 1)
                  for j in ("c1", "c2", "out")]
    for layer in sep_layers:
        _set(p, f"decoder_sep/{layer}/Conv3d_0/Conv_0",
             _conv(sd, f"decoder_sep.{layer}.conv"))
    _set(p, "decoder_sep/seg_layer/Conv_0", _conv(sd, "decoder_sep.seg_layer"))

    return {"params": p}


def rfnet_params_from_torch(sd):
    """Reference rfnet.Model state_dict -> flax params for models.rfnet.RFNet.

    Covers the full tree: grouped encoder, shared sep decoder, fusion decoder
    with PRM generators and region-aware modal fusion (reference
    rfnet.py:176-244, blocks.py:372-626).
    """
    p = {}
    for layer in _ENC_LAYERS:
        _set(p, f"encoders/{layer}/Conv3d_0/Conv_0", _grouped_conv(
            sd, [f"{m}_encoder.{layer}.conv" for m in TORCH_MODALITIES]))

    for layer in _SEP_LAYERS:
        _set(p, f"decoder_sep/{layer}/Conv3d_0/Conv_0",
             _conv(sd, f"decoder_sep.{layer}.conv"))
    _set(p, "decoder_sep/seg_layer/Conv_0", _conv(sd, "decoder_sep.seg_layer"))

    for layer in _SEP_LAYERS:
        _set(p, f"decoder_fuse/{layer}/Conv3d_0/Conv_0",
             _conv(sd, f"decoder_fuse.{layer}.conv"))
    _set(p, "decoder_fuse/seg_layer/Conv_0",
         _conv(sd, "decoder_fuse.seg_layer"))

    for k in (1, 2, 3, 4):
        prm = f"decoder_fuse.prm_generator{k}"
        ours = f"decoder_fuse/prm_generator{k}"
        for i in range(3):
            _set(p, f"{ours}/embedding_layer/GeneralConv3d_{i}/Conv3d_0/Conv_0",
                 _conv(sd, f"{prm}.embedding_layer.{i}.conv"))
        _set(p, f"{ours}/GeneralConv3d_0/Conv3d_0/Conv_0",
             _conv(sd, f"{prm}.prm_layer.0.conv"))
        _set(p, f"{ours}/Conv3d_0/Conv_0", _conv(sd, f"{prm}.prm_layer.1"))

        rfm = f"decoder_fuse.RFM{k}"
        ours = f"decoder_fuse/RFM{k}"
        for r in range(4):
            _set(p, f"{ours}/modal_fusion_{r}/Dense_0",
                 _dense(sd, f"{rfm}.modal_fusion.{r}.weight_layer.0"))
            _set(p, f"{ours}/modal_fusion_{r}/Dense_1",
                 _dense(sd, f"{rfm}.modal_fusion.{r}.weight_layer.2"))
        for i, c in enumerate(("c1", "c2", "c3")):
            _set(p, f"{ours}/region_fusion_{c}/Conv3d_0/Conv_0",
                 _conv(sd, f"{rfm}.region_fusion.fusion_layer.{i}.conv"))
            _set(p, f"{ours}/GeneralConv3d_{i}/Conv3d_0/Conv_0",
                 _conv(sd, f"{rfm}.short_cut.{i}.conv"))

    return {"params": p}
