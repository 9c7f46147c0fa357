"""Space-to-depth (polyphase) execution of the 80-cube conv stages.

Why: the backbones' scale-1 stages run 3^3 convs at 80^3 spatial with 8-32
channels. On TPU, channels live in the 128-wide lane dimension, so a C=32
bf16 tensor pads 4x in HBM and the MXU runs nearly empty (measured <1% FLOP
utilization; the conv encoder is ~70% of inference time). Re-indexing each
2x2x2 spatial block into channels — (B, 80^3, C) -> (B, 40^3, C*8) — makes
every scale-1 tensor dense in the lane dimension and turns the convs into
full-tile MXU matmuls (measured 3.8x faster for the stage-1 block, including
the 3.4x FLOP inflation of the dense polyphase kernel).

This is EXACT, not an approximation: a k=3 stride-1 conv on the original
grid is a k=3 conv on the block grid whose weights are a fixed linear
re-indexing of the canonical kernel. Writing o = 2b + p (block b, phase p)
and the tap position o + d = 2(b + c) + q:

    d = 2c + q - p,  d in {-1,0,1}  =>  per-axis taps
    (p,q,c,d) in {(0,0,0,0), (0,1,-1,-1), (0,1,0,1),
                  (1,0,0,-1), (1,1,0,0), (1,0,1,1)}

so block offsets c span {-1,0,1}: a k=3 kernel on blocks, ~70% structurally
zero. A k=3 stride-2 conv (the stage-2 entry) becomes a k=2 block conv
(c in {-1,0}) producing the block-resolution output directly.

S2D channel layout: phase-minor within each original channel —
index = orig_channel * 8 + (px*4 + py*2 + pz) — so InstanceNorm reduces over
(space, phase) with one reshape, modality masking stays contiguous, and
channel concatenation is unchanged.

Reflect padding (reference pad_type, blocks.py:358-361) maps to one pad
block per side whose only-read phase is the reflected interior voxel:
coord -1 = x[1] (block 0, phase 1) on the left, coord H = x[H-2]
(last block, phase 0) on the right; all other pad phases have structurally
zero weights.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as _np

from passion_tpu.ops.fused_norm import instance_norm_lrelu

# Trace-time flag for the s2d_pad materialization barrier (see s2d_pad).
# Decoupled from the fused_norm toggle: the barrier is a training-trace
# optimization, the Pallas fusion an inference-trace one; inference engines
# disable the barrier with `no_pad_barrier()` alongside enabling fusion.
# Like fused_norm._ENABLED this is a process-global trace-time switch (not
# thread-safe; wrap the jitted function body, not the call).
_PAD_BARRIER = True


@contextmanager
def no_pad_barrier():
    """Disable the training-only pad materialization barrier for code traced
    inside this context (bf16 inference measures faster WITH the pad fused
    into the consuming conv)."""
    global _PAD_BARRIER
    prev = _PAD_BARRIER
    _PAD_BARRIER = False
    try:
        yield
    finally:
        _PAD_BARRIER = prev


# Trace-time flag: execute grouped convs NATIVELY (feature_group_count=G,
# per-group kernels) instead of dense block-diagonal. OFF by default after
# r4 measurement: the isolated forward microbench at the encode stage-1
# shape (75,40^3,256 -> 256, k=3, G=4, bf16, real v5e) measured native
# ~54 ms vs dense ~95 ms (the r2 "dense wins" result no longer holds for
# isolated forwards), but END-TO-END the 15-mask sweep was jitter-neutral
# (2.99 vs 3.03 mean mask-cases/s) AND peak HBM grew enough to OOM the
# double-feature-tree encode trace that fits under the dense form — the
# whole-program native rewrite loses its isolated advantage to layout
# changes around the grouped ops. Kept as an exactness-tested experiment
# switch (tests/test_s2d.py native-vs-dense goldens) for future chips;
# grouped-conv GRADIENTS still lower to non-MXU fusions, so the training
# path must keep the dense form regardless.
_NATIVE_GROUPS = False


@contextmanager
def native_groups(on: bool = True):
    """Trace grouped convs as native feature_group_count convs (forward-only
    inference traces; see _NATIVE_GROUPS)."""
    global _NATIVE_GROUPS
    prev = _NATIVE_GROUPS
    _NATIVE_GROUPS = on
    try:
        yield
    finally:
        _NATIVE_GROUPS = prev


def native_groups_enabled() -> bool:
    return _NATIVE_GROUPS

# per-axis taps (p, q, kernel_pos=c+1, tap_pos=d+1) for k=3 stride-1
_TAPS_K3S1 = (
    (0, 0, 1, 1),
    (0, 1, 0, 0),
    (0, 1, 1, 2),
    (1, 0, 1, 0),
    (1, 0, 2, 2),
    (1, 1, 1, 1),
)
# per-axis taps (q, kernel_pos=c'+1, tap_pos=d+1) for k=3 stride-2
# (output on the block grid; needs one LEFT pad block only)
_TAPS_K3S2 = (
    (0, 1, 1),
    (1, 0, 0),
    (1, 1, 2),
)


def _tap_tensor_s1() -> _np.ndarray:
    """Constant A[k, q, p, d] in {0,1}: the k=3 stride-1 per-axis tap map.

    The kernel builders below are LINEAR in the canonical weights, so they
    are einsums against these constant one-hot tensors — a handful of MXU/
    VPU contractions instead of hundreds of `.at[].set()` dynamic-update-
    slices per traced conv (profiled at ~20 ms/step of DUS + kernel-copy
    time in the r3 train-step trace)."""
    a = _np.zeros((3, 2, 2, 3), _np.float32)
    for p, q, k, d in _TAPS_K3S1:
        a[k, q, p, d] = 1.0
    return a


def _tap_tensor_s2() -> _np.ndarray:
    """Constant B[k2, q, d] for the k=3 stride-2 -> k=2 block map."""
    b = _np.zeros((2, 2, 3), _np.float32)
    for q, k, d in _TAPS_K3S2:
        b[k, q, d] = 1.0
    return b


_A_S1 = _tap_tensor_s1()
_B_S2 = _tap_tensor_s2()
_EYE2 = _np.eye(2, dtype=_np.float32)


def space_to_depth_reshape(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, Z, C) -> (B, H/2, W/2, Z/2, C*8), phase-minor channels.

    Reshape/transpose reference form (kept for tests); the default
    `space_to_depth` routes through a stride-2 identity conv instead — the
    transpose's 2x2x2-minor layout defeats the VPU and XLA materializes it
    as a pathological full-tensor copy (profiled: the single largest
    train-step cost class, ~100 ms/step across the 5-pass decoder)."""
    b, h, w, z, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, z // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, h // 2, w // 2, z // 2, c * 8)


def depth_to_space_reshape(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `space_to_depth_reshape` (reference form, see above)."""
    b, hb, wb, zb, c8 = x.shape
    c = c8 // 8
    x = x.reshape(b, hb, wb, zb, c, 2, 2, 2)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, hb * 2, wb * 2, zb * 2, c)


def _s2d_identity_kernel(c: int) -> _np.ndarray:
    """(2, 2, 2, C, C*8) one-hot conv kernel: output channel c*8 + phase
    reads input channel c at kernel tap (px, py, pz) = phase bits."""
    k = _np.zeros((2, 2, 2, c, c * 8), _np.float32)
    for px in (0, 1):
        for py in (0, 1):
            for pz in (0, 1):
                ph = px * 4 + py * 2 + pz
                for ch in range(c):
                    k[px, py, pz, ch, ch * 8 + ph] = 1.0
    return k


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, Z, C) -> (B, H/2, W/2, Z/2, C*8), phase-minor channels.

    Executed as a stride-2 conv with a constant one-hot kernel: the data
    movement rides the TPU convolution path (canonical layouts in and out)
    instead of a reshape/transpose chain whose 2x2x2-minor layout XLA
    materializes as slow full-tensor copies. Exact (the contraction has
    exactly one nonzero term per output). Forward AND backward are convs."""
    c = x.shape[-1]
    k = jnp.asarray(_s2d_identity_kernel(c), x.dtype)
    # HIGHEST keeps fp32 inputs exact; for bf16 inputs the one-hot
    # contraction is exact at any precision (single nonzero term).
    return jax.lax.conv_general_dilated(
        x, k, (2, 2, 2), "VALID",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        precision=jax.lax.Precision.HIGHEST)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `space_to_depth`, as a stride-2 transposed conv with the
    same constant one-hot kernel (see `space_to_depth` for why)."""
    c = x.shape[-1] // 8
    k = jnp.asarray(_s2d_identity_kernel(c), x.dtype)
    # transpose_kernel=True: exactly the transpose of the forward s2d conv
    # (same kernel, IO swapped + spatially mirrored), i.e. the true inverse.
    return jax.lax.conv_transpose(
        x, k, (2, 2, 2), "VALID",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        transpose_kernel=True,
        precision=jax.lax.Precision.HIGHEST)


def s2d_conv3_kernel(w: jnp.ndarray, groups: int = 1) -> jnp.ndarray:
    """Canonical k=3 stride-1 (grouped) kernel -> polyphase block kernel.

    w: (3, 3, 3, Ci, G*Co) with group-major out channels (XLA grouped-conv
    convention). Returns (3, 3, 3, G*Ci*8, G*Co*8), block-diagonal over
    groups, exact.
    """
    _, _, _, ci, gco = w.shape
    co = gco // groups
    wg = w.reshape(3, 3, 3, ci, groups, co)
    a = jnp.asarray(_A_S1, w.dtype)
    if _NATIVE_GROUPS and groups > 1:
        # per-group kernel (Ci/G-in, all-out, group-major out channels) for
        # feature_group_count execution — same taps, no structural zeros
        full = jnp.einsum("aqpd,brse,ctuf,defigo->abciqrtgopsu",
                          a, a, a, wg)
        return full.reshape(3, 3, 3, ci * 8, groups * co * 8)
    eye_g = jnp.asarray(_np.eye(groups, dtype=_np.float32), w.dtype)
    # out[a,b,c, g,i,qx,qy,qz, h,o,px,py,pz] =
    #   sum_{d,e,f} A[a,qx,px,d] A[b,qy,py,e] A[c,qz,pz,f] w[d,e,f,i,g,o]
    #   * delta(g,h)
    full = jnp.einsum("aqpd,brse,ctuf,defigo,gh->abcgiqrthopsu",
                      a, a, a, wg, eye_g)
    return full.reshape(3, 3, 3, groups * ci * 8, groups * co * 8)


def s2d_conv3_stride2_kernel(w: jnp.ndarray, groups: int = 1) -> jnp.ndarray:
    """Canonical k=3 STRIDE-2 (grouped) kernel -> k=2 block kernel.

    Output lands on the block grid (conventional layout, no phases).
    w: (3, 3, 3, Ci, G*Co) -> (2, 2, 2, G*Ci*8, G*Co). Apply after
    `s2d_pad(x, left=True, right=False)` with VALID padding.
    """
    _, _, _, ci, gco = w.shape
    co = gco // groups
    wg = w.reshape(3, 3, 3, ci, groups, co)
    b = jnp.asarray(_B_S2, w.dtype)
    if _NATIVE_GROUPS and groups > 1:
        full = jnp.einsum("aqd,bre,ctf,defigo->abciqrtgo", b, b, b, wg)
        return full.reshape(2, 2, 2, ci * 8, groups * co)
    eye_g = jnp.asarray(_np.eye(groups, dtype=_np.float32), w.dtype)
    full = jnp.einsum("aqd,bre,ctf,defigo,gh->abcgiqrtho",
                      b, b, b, wg, eye_g)
    return full.reshape(2, 2, 2, groups * ci * 8, groups * co)


def s2d_conv1_kernel(w: jnp.ndarray, groups: int = 1) -> jnp.ndarray:
    """Canonical 1x1x1 (grouped) kernel -> phase-diagonal S2D kernel.

    A pointwise conv mixes channels within each voxel, i.e. within each
    (block, phase): W[(ci,q),(co,p)] = w[ci,co] * delta(q,p).
    w: (1, 1, 1, Ci, G*Co) -> (1, 1, 1, G*Ci*8, G*Co*8).
    """
    _, _, _, ci, gco = w.shape
    co = gco // groups
    wg = w.reshape(ci, groups, co)
    eye2 = jnp.asarray(_EYE2, w.dtype)
    if _NATIVE_GROUPS and groups > 1:
        full = jnp.einsum("igo,qp,rs,tu->iqrtgopsu", wg, eye2, eye2, eye2)
        return full.reshape(1, 1, 1, ci * 8, groups * co * 8)
    eye_g = jnp.asarray(_np.eye(groups, dtype=_np.float32), w.dtype)
    full = jnp.einsum("igo,gh,qp,rs,tu->giqrthopsu",
                      wg, eye_g, eye2, eye2, eye2)
    return full.reshape(1, 1, 1, groups * ci * 8, groups * co * 8)


def s2d_bias(b: jnp.ndarray) -> jnp.ndarray:
    """Canonical per-channel bias -> phase-minor S2D bias (repeat 8x)."""
    return jnp.repeat(b, 8)


def s2d_pad(x: jnp.ndarray, left: bool = True, right: bool = True,
            mode: str = "reflect") -> jnp.ndarray:
    """Pad 1 original voxel per side, expressed on the block grid: one pad
    block per padded side and axis. mode='reflect' (reference pad_type,
    blocks.py:358-361): the only-read phase carries the reflected interior
    voxel. mode='zeros' (fusion_prenorm's default pad, blocks.py:301,538):
    the pad block is all-zero."""
    b, hb, wb, zb, c8 = x.shape
    if mode == "zeros":
        return jnp.pad(x, ((0, 0), (int(left), int(right)),
                           (int(left), int(right)), (int(left), int(right)),
                           (0, 0)))
    # Flat-channel form (no phase-split reshapes): with phase-minor channels
    # c8 = orig*8 + px*4 + py*2 + pz, the left pad block along an axis equals
    # the FIRST block with phases whose axis-bit is 0 zeroed (coord -1
    # reflects to +1 = block 0 phase 1, same channel index; coord -2 is
    # structurally unread), and the right pad block equals the LAST block
    # with axis-bit-1 phases zeroed. A per-channel 0/1 multiply replaces the
    # reshape->slice->concat phase shuffle, which forced XLA into transposed
    # layouts and full-tensor copies around every scale-1 conv (profiled).
    for ax, shift in ((1, 2), (2, 1), (3, 0)):
        bit = ((jnp.arange(c8) % 8) >> shift) & 1
        keep1 = bit.astype(x.dtype).reshape((1, 1, 1, 1, c8))
        pieces = []
        if left:
            pieces.append(jax.lax.slice_in_dim(x, 0, 1, axis=ax) * keep1)
        pieces.append(x)
        if right:
            last = jax.lax.slice_in_dim(x, x.shape[ax] - 1, x.shape[ax],
                                        axis=ax)
            pieces.append(last * (1 - keep1))
        x = jnp.concatenate(pieces, axis=ax)
    if _PAD_BARRIER:
        # Training path: force the padded tensor to materialize. Without the
        # barrier XLA fuses the concat/mask arithmetic INTO the consuming
        # convolution's input, demoting it from the optimized conv path
        # (measured: fwd conv 5x slower; train step 1.35 -> 0.36 steps/s).
        # The bf16 inference traces measure FASTER with the fusion, so the
        # engines disable the barrier via `no_pad_barrier()`.
        x = jax.lax.optimization_barrier(x)
    return x


def s2d_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias=None) -> jnp.ndarray:
    """VALID conv on the (already padded) block grid.

    Group count is inferred from the kernel's input-channel extent: the
    kernel builders emit per-group kernels (Ci/G input channels) under
    `native_groups()`, and full block-diagonal kernels otherwise — call
    sites stay identical either way."""
    groups = x.shape[-1] // kernel.shape[3]
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1, 1), "VALID",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        feature_group_count=groups)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def instance_norm_s2d(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm with torch semantics on an S2D tensor: statistics per
    original channel over (space, phases); biased variance, fp32 stats."""
    b, hb, wb, zb, c8 = x.shape
    v = x.reshape(b, hb, wb, zb, c8 // 8, 8).astype(jnp.float32)
    axes = (1, 2, 3, 5)
    mean = jnp.mean(v, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(v - mean), axis=axes, keepdims=True)
    y = (v - mean) * jax.lax.rsqrt(var + eps)
    return y.reshape(x.shape).astype(x.dtype)


def prenorm_conv_s2d(x, kernel, bias, k_size: int, groups: int = 1,
                     pad_mode: str = "reflect"):
    """GeneralConv3dPreNorm (IN -> LeakyReLU(0.2) -> conv) on S2D tensors."""
    y = instance_norm_lrelu(x, phase_group=8)
    if k_size == 3:
        return s2d_conv(s2d_pad(y, mode=pad_mode),
                        s2d_conv3_kernel(kernel, groups), s2d_bias(bias))
    return s2d_conv(y, s2d_conv1_kernel(kernel, groups), s2d_bias(bias))


def conv_postnorm_s2d(x, kernel, bias, k_size: int, groups: int = 1):
    """GeneralConv3d (conv -> IN -> LeakyReLU(0.2)) on S2D tensors."""
    if k_size == 3:
        y = s2d_conv(s2d_pad(x), s2d_conv3_kernel(kernel, groups),
                     s2d_bias(bias))
    else:
        y = s2d_conv(x, s2d_conv1_kernel(kernel, groups), s2d_bias(bias))
    return instance_norm_lrelu(y, phase_group=8)


def mask_channels_s2d(x: jnp.ndarray, mask: jnp.ndarray,
                      num_modals: int = 4) -> jnp.ndarray:
    """Zero absent modalities on an S2D flat channel axis (modality-major
    original channels, each expanded by 8 phases)."""
    b = x.shape[0]
    c = x.shape[-1] // num_modals
    m = jnp.repeat(mask.astype(x.dtype), c, axis=1)
    return x * m.reshape((b,) + (1,) * (x.ndim - 2) + (num_modals * c,))
