"""Fused Pallas MLP kernel vs the plain XLA path, in interpret mode so it
runs on the CPU test backend.  Covers both the direct-precision kernel and
the 3-pass-bf16 (Precision.HIGH) variant with pre-split weights."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from phnrec_tpu.io.weights import MLPParams
from phnrec_tpu.posteriors import mlp
from phnrec_tpu.ops.pallas_mlp import mlp_forward_fused


def _net(seed=0, n_inp=165, n_hid=200, n_out=138):
    rng = np.random.default_rng(seed)
    p = MLPParams(
        w1=rng.standard_normal((n_hid, n_inp)).astype(np.float32) * 0.1,
        b1=rng.standard_normal(n_hid).astype(np.float32) * 0.1,
        w2=rng.standard_normal((n_out, n_hid)).astype(np.float32) * 0.1,
        b2=rng.standard_normal(n_out).astype(np.float32) * 0.1,
        mean=rng.standard_normal(n_inp).astype(np.float32),
        dev=(rng.random(n_inp).astype(np.float32) + 0.5))
    return mlp.to_device(p)


@pytest.mark.parametrize("fast", [True, False])
@pytest.mark.parametrize("prec", [jax.lax.Precision.HIGHEST,
                                  jax.lax.Precision.HIGH])
def test_fused_kernel_matches_xla(fast, prec):
    net = _net()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((37, net.n_inp)).astype(np.float32))
    xp = jnp.pad(x, ((0, 0), (0, net.w1.shape[0] - net.n_inp)))
    got = mlp_forward_fused(
        xp, net.mean, net.dev, net.w1, net.b1, net.w2, net.b2,
        n_out=net.n_out, fast=fast, interpret=True,
        prec=prec)[:, : net.n_out]
    want = mlp.forward(net, x, fast=fast, use_pallas=False)
    # HIGH runs 3-pass bf16 in both paths but with different split/sum
    # orders; HIGHEST is the same f32 algorithm up to accumulation order
    atol = 1e-6 if prec == jax.lax.Precision.HIGHEST else 5e-4
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol)
    np.testing.assert_allclose(np.asarray(got).sum(-1), 1.0, atol=1e-5)


def test_fused_kernel_no_softmax_matches():
    net = _net(seed=3)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((16, net.n_inp)).astype(np.float32))
    xp = jnp.pad(x, ((0, 0), (0, net.w1.shape[0] - net.n_inp)))
    got = mlp_forward_fused(
        xp, net.mean, net.dev, net.w1, net.b1, net.w2, net.b2,
        n_out=net.n_out, fast=False, apply_softmax=False, interpret=True,
        prec=jax.lax.Precision.HIGHEST)[:, : net.n_out]
    want = mlp.forward(net, x, fast=False, apply_softmax=False,
                       use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
