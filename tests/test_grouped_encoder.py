"""Grouped-conv encoder == four independent per-modality encoders."""

import jax
import jax.numpy as jnp
import numpy as np

from passion_tpu.models.layers import Conv3d, mask_channels, split_modalities


def test_grouped_conv_equals_independent_convs(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 4)), jnp.float32)
    m = Conv3d(features=12, groups=4, k_size=3, padding=1)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)  # (2, 8, 8, 8, 12), modality-major blocks of 3

    kernel = params["params"]["Conv_0"]["kernel"]  # (3,3,3,1,12)
    bias = params["params"]["Conv_0"]["bias"]
    single = Conv3d(features=3, groups=1, k_size=3, padding=1)
    for g in range(4):
        sub = {"params": {"Conv_0": {
            "kernel": kernel[..., g * 3:(g + 1) * 3],
            "bias": bias[g * 3:(g + 1) * 3]}}}
        ref = single.apply(sub, x[..., g:g + 1])
        np.testing.assert_allclose(np.asarray(out[..., g * 3:(g + 1) * 3]),
                                   np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_mask_channels_and_split(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 12)), jnp.float32)
    mask = jnp.asarray([[True, False, True, False],
                        [True, True, True, True]])
    y = mask_channels(x, mask)
    parts = split_modalities(y)
    assert len(parts) == 4 and parts[0].shape == (2, 4, 4, 4, 3)
    assert (np.asarray(parts[1][0]) == 0).all()
    assert (np.asarray(parts[3][0]) == 0).all()
    np.testing.assert_array_equal(np.asarray(parts[0][0]),
                                  np.asarray(x[0, ..., :3]))
    np.testing.assert_array_equal(np.asarray(y[1]), np.asarray(x[1]))
