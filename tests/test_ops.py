"""Golden tests for core ops against PyTorch CPU reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from passion_tpu.ops import (
    instance_norm,
    resize_trilinear,
    upsample_trilinear,
    upsample_nearest,
    fusion_attention_bias,
    cross_key_bias,
)


def _to_torch_ncdhw(x_bhwzc):
    return torch.from_numpy(np.moveaxis(x_bhwzc, -1, 1).copy())


def _from_torch_ncdhw(t):
    return np.moveaxis(t.numpy(), 1, -1)


@pytest.mark.parametrize("scale", [2, 4, 8])
@pytest.mark.parametrize("shape", [(2, 5, 5, 5, 3), (1, 10, 8, 6, 2)])
def test_trilinear_align_corners_matches_torch(rng, scale, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    ours = np.asarray(upsample_trilinear(jnp.asarray(x), scale))
    theirs = _from_torch_ncdhw(
        F.interpolate(_to_torch_ncdhw(x), scale_factor=scale, mode="trilinear",
                      align_corners=True)
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_trilinear_arbitrary_size_matches_torch(rng):
    x = rng.standard_normal((1, 7, 9, 5, 4)).astype(np.float32)
    out = (13, 6, 11)
    ours = np.asarray(resize_trilinear(jnp.asarray(x), out))
    theirs = _from_torch_ncdhw(
        F.interpolate(_to_torch_ncdhw(x), size=out, mode="trilinear",
                      align_corners=True)
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_nearest_upsample_matches_torch(rng):
    x = rng.standard_normal((2, 5, 5, 5, 3)).astype(np.float32)
    ours = np.asarray(upsample_nearest(jnp.asarray(x), 2))
    theirs = _from_torch_ncdhw(
        F.interpolate(_to_torch_ncdhw(x), scale_factor=2, mode="nearest")
    )
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((2, 8, 7, 6, 5)).astype(np.float32) * 3 + 1
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    m = torch.nn.InstanceNorm3d(5)  # affine=False, eps=1e-5 defaults
    theirs = _from_torch_ncdhw(m(_to_torch_ncdhw(x)).detach())
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_instance_norm_custom_vjp_matches_autodiff(rng):
    """instance_norm's hand-written backward (ops/norm.py: no fp32
    full-size residuals) equals autodiff of the plain fp32-stats form."""
    x = rng.standard_normal((2, 6, 5, 4, 3)).astype(np.float32) * 3 + 1
    g = rng.standard_normal(x.shape).astype(np.float32)

    def plain(v):
        axes = tuple(range(1, v.ndim - 1))
        mean = jnp.mean(v, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(v - mean), axis=axes, keepdims=True)
        return (v - mean) * jax.lax.rsqrt(var + 1e-5)

    xj, gj = jnp.asarray(x), jnp.asarray(g)
    want = jax.vjp(plain, xj)[1](gj)[0]
    got = jax.vjp(instance_norm, xj)[1](gj)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)

    # vmapped use (the models vmap decoders over passes/modalities)
    got_v = jax.vmap(lambda v: jax.vjp(instance_norm, v)[1](
        jnp.ones_like(v))[0])(jnp.stack([xj, xj + 1]))
    want_v = jax.vmap(lambda v: jax.vjp(plain, v)[1](
        jnp.ones_like(v))[0])(jnp.stack([xj, xj + 1]))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=2e-5, atol=2e-6)


def test_fusion_attention_bias_structure():
    p = 2  # tokens per block
    mask = jnp.asarray([[True, False, True, False],
                        [True, True, True, True]])
    bias = np.asarray(fusion_attention_bias(mask, p))  # (2, 1, 10, 10)
    assert bias.shape == (2, 1, 10, 10)
    allow = bias[:, 0] == 0.0

    # modality tokens attend only within their own block
    for m in range(4):
        rows = slice(p * m, p * (m + 1))
        assert allow[0, rows, rows].all()
        other = np.ones(10, dtype=bool)
        other[p * m:p * (m + 1)] = False
        assert not allow[0, rows][:, other].any()

    # fusion rows: self + present modalities only
    frows = slice(4 * p, 5 * p)
    assert allow[0, frows, frows].all()
    assert allow[0, frows, 0 * p:1 * p].all()      # flair present
    assert not allow[0, frows, 1 * p:2 * p].any()  # t1ce absent
    assert allow[0, frows, 2 * p:3 * p].all()      # t1 present
    assert not allow[0, frows, 3 * p:4 * p].any()  # t2 absent
    # full-mask row sees everything from fusion rows
    assert allow[1, frows, :].all()


def test_cross_key_bias_structure():
    mask = jnp.asarray([[False, True, False, True]])
    bias = np.asarray(cross_key_bias(mask, 3))  # (1, 1, 12)
    allow = bias[0, 0] == 0.0
    expected = np.repeat(np.array([False, True, False, True]), 3)
    np.testing.assert_array_equal(allow, expected)


class TestFusedNorm:
    """Pallas fused InstanceNorm+LeakyReLU vs the jnp reference
    (interpret mode on CPU; the real kernel runs on TPU)."""

    def _check(self, x, phase_group, rng=None):
        import passion_tpu.ops.fused_norm as fn

        ref = fn.instance_norm_lrelu(x, phase_group=phase_group)
        prev = fn._MIN_PALLAS_ELEMS
        fn._MIN_PALLAS_ELEMS = 0
        try:
            with fn.enabled():
                got = fn.instance_norm_lrelu(x, phase_group=phase_group)
        finally:
            fn._MIN_PALLAS_ELEMS = prev
        assert got.dtype == x.dtype
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-2 if x.dtype == jnp.bfloat16
                                   else 2e-5, rtol=1e-2)

    def test_plain_narrow_channels(self, rng):
        # C=64 < 128: lane-packed layout
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 64)) * 3 + 1,
                        jnp.float32)
        self._check(x, 1)

    def test_plain_wide_channels(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 256)),
                        jnp.bfloat16)
        self._check(x, 1)

    def test_s2d_phase_group(self, rng):
        # S2D stats pool over groups of 8 phase channels
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 64)) - 0.5,
                        jnp.float32)
        self._check(x, 8)

    def test_mixed_mode_gates_on_lane_alignment(self, rng, monkeypatch):
        """enabled("mixed") takes the Pallas kernel ONLY at lane-aligned
        channel counts (c % 128 == 0, no-op (rows, lanes) view) and routes
        narrow-channel sites (whose lane-packed reinterpret pins a
        row-major layout) to the jnp/XLA path — the per-callsite policy
        PROFILE.md "Open items" motivates for the d1_c2/RFM1-mid norms."""
        import passion_tpu.ops.fused_norm as fn

        calls = []
        real = fn._pallas_norm_lrelu
        monkeypatch.setattr(fn, "_pallas_norm_lrelu",
                            lambda *a, **k: calls.append(a[0].shape)
                            or real(*a, **k))
        monkeypatch.setattr(fn, "_MIN_PALLAS_ELEMS", 0)
        wide = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 128)),
                           jnp.float32)
        narrow = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 64)),
                             jnp.float32)
        with fn.enabled("mixed"):
            got_wide = fn.instance_norm_lrelu(wide)
            got_narrow = fn.instance_norm_lrelu(narrow)
        assert len(calls) == 1  # wide went Pallas, narrow did not
        ref_wide = fn.instance_norm_lrelu(wide)
        ref_narrow = fn.instance_norm_lrelu(narrow)
        np.testing.assert_allclose(np.asarray(got_wide),
                                   np.asarray(ref_wide),
                                   atol=2e-5, rtol=1e-2)
        # the narrow site runs the IDENTICAL jnp program -> bitwise equal
        np.testing.assert_array_equal(np.asarray(got_narrow),
                                      np.asarray(ref_narrow))

    def test_grad_inside_enabled_uses_jnp_path(self, rng):
        """Differentiating through an enabled() context must not hit the
        VJP-less pallas_call: the custom-JVP rule reroutes autodiff through
        the jnp implementation (ADVICE r1 item 2)."""
        import passion_tpu.ops.fused_norm as fn

        x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 128)), jnp.float32)
        prev = fn._MIN_PALLAS_ELEMS
        fn._MIN_PALLAS_ELEMS = 0
        try:
            with fn.enabled():
                g = jax.grad(lambda v: jnp.sum(
                    fn.instance_norm_lrelu(v) ** 2))(x)
        finally:
            fn._MIN_PALLAS_ELEMS = prev
        g_ref = jax.grad(lambda v: jnp.sum(
            fn.instance_norm_lrelu(v) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-5, rtol=1e-5)

    def test_large_mean_cancellation(self, rng):
        """Statistics at a realistic worst case for activation scales
        (|mean| >> std, ~512k elems/channel, ADVICE r1 item 3): the kernel's
        pilot-shifted moments + Chan merge + (x-mean)*inv apply must stay
        within ~1e-5 of the float64 ground truth — tighter than the fp32 jnp
        fallback itself achieves at this scale (~1.4e-4), so the comparison
        is against f64, not the fallback. Shape (1, 40^3, 128) mirrors the
        S2D stage-1 tensors the kernel actually sees."""
        import passion_tpu.ops.fused_norm as fn

        x64 = rng.standard_normal((1, 40, 40, 40, 128)) * 0.5 + 50.0
        m = x64.mean(axis=(1, 2, 3), keepdims=True)
        v = ((x64 - m) ** 2).mean(axis=(1, 2, 3), keepdims=True)
        y64 = (x64 - m) / np.sqrt(v + 1e-5)
        y64 = np.where(y64 >= 0, y64, 0.2 * y64)

        x = jnp.asarray(x64, jnp.float32)
        prev = fn._MIN_PALLAS_ELEMS
        fn._MIN_PALLAS_ELEMS = 0
        try:
            with fn.enabled():
                got = np.asarray(fn.instance_norm_lrelu(x), np.float64)
        finally:
            fn._MIN_PALLAS_ELEMS = prev
        np.testing.assert_allclose(got, y64, atol=5e-5, rtol=1e-4)

    def test_disabled_matches_reference_norm(self, rng):
        from passion_tpu.ops.fused_norm import instance_norm_lrelu
        from passion_tpu.ops.norm import instance_norm

        x = jnp.asarray(rng.standard_normal((2, 5, 6, 7, 24)), jnp.float32)
        ref = jax.nn.leaky_relu(instance_norm(x), negative_slope=0.2)
        np.testing.assert_allclose(np.asarray(instance_norm_lrelu(x)),
                                   np.asarray(ref), atol=1e-6)

    def test_s2d_disabled_matches_reference_norm(self, rng):
        from passion_tpu.ops.fused_norm import instance_norm_lrelu
        from passion_tpu.ops.s2d import instance_norm_s2d

        x = jnp.asarray(rng.standard_normal((2, 5, 6, 7, 48)), jnp.float32)
        ref = jax.nn.leaky_relu(instance_norm_s2d(x), negative_slope=0.2)
        np.testing.assert_allclose(
            np.asarray(instance_norm_lrelu(x, phase_group=8)),
            np.asarray(ref), atol=1e-6)


class TestBlockdiagGroupedConv:
    """Conv3d(groups>1) executes grouped convs as dense block-diagonal
    convolutions (models/layers.py): XLA's feature_group_count rewrite runs
    the backward as non-MXU fusions at <1% utilization on TPU (PROFILE.md).
    The dense execution must match torch's grouped Conv3d exactly, values
    AND gradients, with the feature_group_count-compatible param tree."""

    def test_matches_torch_grouped_conv_and_grads(self, rng):
        from passion_tpu.models.layers import Conv3d

        B, S, G, CIG, COG = 2, 6, 4, 3, 5
        x = rng.standard_normal((B, S, S, S, G * CIG)).astype(np.float32)
        m = Conv3d(G * COG, k_size=3, groups=G, pad_type="zeros")
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        kernel = np.asarray(params["params"]["Conv_0"]["kernel"])
        bias = np.asarray(params["params"]["Conv_0"]["bias"])
        assert kernel.shape == (3, 3, 3, CIG, G * COG)

        def loss_fn(p):
            y = m.apply(p, jnp.asarray(x))
            return jnp.sum(jnp.square(y)), y

        (_, y), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        # torch grouped conv: weight (out, in/G, k, k, k)
        tw = torch.tensor(
            kernel.transpose(4, 3, 0, 1, 2), requires_grad=True)
        tb = torch.tensor(bias, requires_grad=True)
        tx = torch.tensor(x.transpose(0, 4, 1, 2, 3))
        ty = F.conv3d(tx, tw, tb, padding=1, groups=G)
        torch.sum(ty ** 2).backward()

        np.testing.assert_allclose(
            np.asarray(y), ty.detach().numpy().transpose(0, 2, 3, 4, 1),
            atol=2e-4)
        gk = np.asarray(grads["params"]["Conv_0"]["kernel"])
        np.testing.assert_allclose(
            gk, tw.grad.numpy().transpose(2, 3, 4, 1, 0),
            rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(grads["params"]["Conv_0"]["bias"]), tb.grad.numpy(),
            rtol=2e-3, atol=2e-2)
