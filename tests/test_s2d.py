"""Exactness of the space-to-depth (polyphase) conv execution.

Every op here must match its canonical counterpart bit-closely — S2D is a
re-indexing, not an approximation (ops/s2d.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passion_tpu.ops.norm import instance_norm
from passion_tpu.ops.s2d import (
    depth_to_space,
    instance_norm_s2d,
    mask_channels_s2d,
    s2d_bias,
    s2d_conv,
    s2d_conv3_kernel,
    s2d_conv3_stride2_kernel,
    s2d_pad,
    space_to_depth,
)


def _canon_conv(x, w, groups=1, stride=1):
    """Reference computation: reflect pad 1 + conv (our Conv3d semantics)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, w, (stride,) * 3, "VALID",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        feature_group_count=groups)


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.standard_normal((2, 8, 10, 12, 4)), jnp.float32)


def test_s2d_roundtrip(x):
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


def test_s2d_conv_form_matches_reshape_form(x):
    """The conv-executed s2d/d2s (MXU data movement) is bit-identical to the
    reshape/transpose reference form, fwd and as mutual inverses."""
    from passion_tpu.ops.s2d import depth_to_space_reshape, space_to_depth_reshape

    s = space_to_depth(x)
    np.testing.assert_array_equal(np.asarray(s),
                                  np.asarray(space_to_depth_reshape(x)))
    np.testing.assert_array_equal(np.asarray(depth_to_space(s)),
                                  np.asarray(depth_to_space_reshape(s)))


def test_s2d_conv_form_grads_exact(rng):
    """d/dx of the conv-form s2d/d2s equals the (trivial) permutation
    gradient of the reshape form — the training path differentiates
    through these."""
    import jax

    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 2)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((1, 2, 2, 2, 16)), jnp.float32)
    from passion_tpu.ops.s2d import space_to_depth_reshape

    g_conv = jax.vjp(space_to_depth, x)[1](ct)[0]
    g_ref = jax.vjp(space_to_depth_reshape, x)[1](ct)[0]
    np.testing.assert_array_equal(np.asarray(g_conv), np.asarray(g_ref))


@pytest.mark.parametrize("groups", [1, 4])
def test_s2d_conv3_exact(rng, x, groups):
    ci = 4 // groups if groups == 4 else 4
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4 // groups, 8)) * 0.3,
                    jnp.float32)
    ref = _canon_conv(x, w, groups=groups)
    xs = space_to_depth(x)
    ws = s2d_conv3_kernel(w, groups=groups)
    got = depth_to_space(s2d_conv(s2d_pad(xs), ws))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("groups", [1, 4])
def test_s2d_conv3_stride2_exact(rng, x, groups):
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4 // groups, 8)) * 0.3,
                    jnp.float32)
    ref = _canon_conv(x, w, groups=groups, stride=2)
    xs = space_to_depth(x)
    ws = s2d_conv3_stride2_kernel(w, groups=groups)
    got = s2d_conv(s2d_pad(xs, left=True, right=False), ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_bias_layout(rng, x):
    b = jnp.asarray(rng.standard_normal(8), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 8)) * 0.3, jnp.float32)
    ref = _canon_conv(x, w) + b
    got = depth_to_space(
        s2d_conv(s2d_pad(space_to_depth(x)), s2d_conv3_kernel(w), s2d_bias(b)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_instance_norm_s2d_exact(x):
    ref = instance_norm(x)
    got = depth_to_space(instance_norm_s2d(space_to_depth(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_conv1_exact(rng, x):
    from passion_tpu.ops.s2d import s2d_conv1_kernel

    w = jnp.asarray(rng.standard_normal((1, 1, 1, 4, 6)) * 0.3, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    got = depth_to_space(s2d_conv(space_to_depth(x), s2d_conv1_kernel(w)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_upsample2_s2d_exact(rng):
    from passion_tpu.ops.resize import upsample2_trilinear_s2d, upsample_trilinear

    x = jnp.asarray(rng.standard_normal((2, 5, 6, 7, 3)), jnp.float32)
    ref = space_to_depth(upsample_trilinear(x, 2))
    got = upsample2_trilinear_s2d(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_mask_channels_s2d(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 4 * 2 * 8)), jnp.float32)
    mask = jnp.asarray([[True, False, True, False],
                        [False, True, True, True]])
    y = np.asarray(mask_channels_s2d(x, mask))
    v = y.reshape(2, 4, 4, 4, 4, 2 * 8)
    assert np.all(v[0, ..., 1, :] == 0) and np.all(v[0, ..., 3, :] == 0)
    assert np.all(v[1, ..., 0, :] == 0)
    assert not np.all(v[0, ..., 0, :] == 0)


def test_native_grouped_kernels_match_dense(rng, x):
    # native_groups() emits per-group kernels for feature_group_count
    # execution; results must be IDENTICAL to the dense block-diagonal form
    # (same taps, no structural-zero terms). r4 forward-only inference path.
    from passion_tpu.ops import s2d as S

    g, ci, co = 4, 3, 5
    xs = S.space_to_depth(
        jnp.asarray(rng.standard_normal((2, 8, 8, 8, g * ci)), jnp.float32))
    w3 = jnp.asarray(rng.standard_normal((3, 3, 3, ci, g * co)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((1, 1, 1, ci, g * co)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((g * co,)), jnp.float32)

    dense3 = S.s2d_conv(S.s2d_pad(xs), S.s2d_conv3_kernel(w3, g), S.s2d_bias(b))
    dense2 = S.s2d_conv(S.s2d_pad(xs, right=False),
                        S.s2d_conv3_stride2_kernel(w3, g), b)
    dense1 = S.s2d_conv(xs, S.s2d_conv1_kernel(w1, g), S.s2d_bias(b))
    with S.native_groups():
        nat3 = S.s2d_conv(S.s2d_pad(xs), S.s2d_conv3_kernel(w3, g),
                          S.s2d_bias(b))
        nat2 = S.s2d_conv(S.s2d_pad(xs, right=False),
                          S.s2d_conv3_stride2_kernel(w3, g), b)
        nat1 = S.s2d_conv(xs, S.s2d_conv1_kernel(w1, g), S.s2d_bias(b))
    np.testing.assert_allclose(nat3, dense3, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(nat2, dense2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(nat1, dense1, rtol=1e-5, atol=1e-5)


def test_native_grouped_conv3d_layer_matches_dense(rng):
    from passion_tpu.models.layers import Conv3d
    from passion_tpu.ops import s2d as S

    x = jnp.asarray(rng.standard_normal((2, 6, 6, 6, 8)), jnp.float32)
    layer = Conv3d(12, k_size=3, padding=1, groups=4)
    params = layer.init(jax.random.PRNGKey(0), x)
    dense = layer.apply(params, x)
    with S.native_groups():
        nat = layer.apply(params, x)
    np.testing.assert_allclose(nat, dense, rtol=1e-5, atol=1e-5)
