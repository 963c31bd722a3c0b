"""Fused LN->MLP Pallas kernel vs the unfused Flax formulation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spatially_aware_ai_tpu.models.pallas_mlp import fused_ln_mlp

RNG = np.random.default_rng(3)


def _ref(x, res, lns, lnb, w1, b1, w2, b2, gamma, act, eps):
    x = np.asarray(x, np.float64)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    lnx = (x - mu) / np.sqrt(var + eps) * lns + lnb
    h = lnx @ np.asarray(w1, np.float64) + b1
    if act == "gelu":
        from scipy.special import erf

        g = 0.5 * h * (1.0 + erf(h / np.sqrt(2.0)))
    else:
        g = h / (1.0 + np.exp(-1.702 * h))
    out = g @ np.asarray(w2, np.float64) + b2
    return np.asarray(res, np.float64) + out * gamma


@pytest.mark.parametrize("act,eps,with_gamma", [
    ("gelu", 1e-6, True),       # ConvNeXt block
    ("quick_gelu", 1e-5, False),  # CLIP MLP
])
def test_fused_ln_mlp_parity(act, eps, with_gamma):
    M, D, H = 100, 256, 1024  # M deliberately not a tile multiple
    x = RNG.normal(size=(M, D)).astype(np.float32)
    res = RNG.normal(size=(M, D)).astype(np.float32)
    lns = RNG.normal(1.0, 0.1, D).astype(np.float32)
    lnb = RNG.normal(0.0, 0.1, D).astype(np.float32)
    w1 = (RNG.normal(size=(D, H)) / np.sqrt(D)).astype(np.float32)
    b1 = RNG.normal(0.0, 0.1, H).astype(np.float32)
    w2 = (RNG.normal(size=(H, D)) / np.sqrt(H)).astype(np.float32)
    b2 = RNG.normal(0.0, 0.1, D).astype(np.float32)
    gamma = RNG.normal(0.5, 0.1, D).astype(np.float32) if with_gamma else None

    got = np.asarray(
        fused_ln_mlp(
            jnp.asarray(x), jnp.asarray(res), jnp.asarray(lns),
            jnp.asarray(lnb), jnp.asarray(w1), jnp.asarray(b1),
            jnp.asarray(w2), jnp.asarray(b2),
            None if gamma is None else jnp.asarray(gamma),
            act=act, eps=eps, tm=64, th=256, interpret=True,
        )
    )
    want = _ref(x, res, lns, lnb, w1, b1, w2, b2,
                1.0 if gamma is None else gamma, act, eps)
    assert got.shape == (M, D)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_convnext_block_fused_vs_unfused():
    """ConvNeXtBlock with the fused kernel (interpret on CPU) must match
    the plain Flax path on identical params."""
    from spatially_aware_ai_tpu.models.kmax.convnext import ConvNeXtBlock

    x = jnp.asarray(RNG.normal(size=(2, 6, 7, 128)).astype(np.float32))
    ref_blk = ConvNeXtBlock(128, 1e-2, fused_mlp=False)
    params = ref_blk.init(jax.random.PRNGKey(0), x)
    want = np.asarray(ref_blk.apply(params, x))
    got = np.asarray(
        ConvNeXtBlock(128, 1e-2, fused_mlp=True).apply(params, x)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_clip_residual_block_fused_vs_unfused():
    from spatially_aware_ai_tpu.models.clip.model import ResidualBlock

    x = jnp.asarray(RNG.normal(size=(3, 10, 128)).astype(np.float32))
    ref_blk = ResidualBlock(128, 4, quick=True, fused_mlp=False)
    params = ref_blk.init(jax.random.PRNGKey(1), x)
    want = np.asarray(ref_blk.apply(params, x))
    got = np.asarray(
        ResidualBlock(128, 4, quick=True, fused_mlp=True).apply(params, x)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_use_fused_mlp_gate():
    from spatially_aware_ai_tpu.models.pallas_mlp import use_fused_mlp

    assert not use_fused_mlp(100)          # not a 64 multiple
    assert use_fused_mlp(768, True)
    assert not use_fused_mlp(768, False)
    import os

    os.environ["SAI_FUSED_MLP"] = "0"
    try:
        assert not use_fused_mlp(768, True)
    finally:
        del os.environ["SAI_FUSED_MLP"]


def test_fused_ln_mlp_matches_convnext_block():
    """End-to-end vs the Flax ConvNeXtBlock math (minus the dwconv)."""
    import flax.linen as nn

    D, H = 128, 512
    M = 64

    class TailOnly(nn.Module):
        @nn.compact
        def __call__(self, xdw, xres):
            h = nn.LayerNorm(epsilon=1e-6, name="norm")(xdw)
            h = nn.Dense(H, name="pwconv1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(D, name="pwconv2")(h)
            gamma = self.param("gamma", nn.initializers.constant(0.3), (D,))
            return xres + h * gamma

    xdw = jnp.asarray(RNG.normal(size=(M, D)).astype(np.float32))
    xres = jnp.asarray(RNG.normal(size=(M, D)).astype(np.float32))
    mod = TailOnly()
    params = mod.init(jax.random.PRNGKey(0), xdw, xres)
    want = np.asarray(mod.apply(params, xdw, xres))

    p = params["params"]
    got = np.asarray(
        fused_ln_mlp(
            xdw, xres, p["norm"]["scale"], p["norm"]["bias"],
            p["pwconv1"]["kernel"], p["pwconv1"]["bias"],
            p["pwconv2"]["kernel"], p["pwconv2"]["bias"], p["gamma"],
            act="gelu", eps=1e-6, tm=32, th=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
