"""Fused Pallas TPU kernel for the 2-layer MLP forward pass.

The posterior estimator runs three MLPs per frame (two band nets + merger,
traps.cpp:347-404,465; nn.cpp:872-899).  The unfused jnp path materializes
the [N, 1536] hidden activations in HBM between the two GEMMs — at the
shipped net sizes that hidden tensor is ~8x larger than either the input or
the output, so the forward pass is HBM-bandwidth-bound, not MXU-bound.

This kernel fuses the whole per-net pipeline into one VMEM-resident program:

    xn = (x - mean) * dev                 (input norm, nn.cpp:702-716)
    h  = sigmoid(xn @ W1 + b1)            (MXU, f32 accumulation)
    o  = h @ W2 + b2                      (MXU, f32 accumulation)
    p  = masked softmax over the first n_out columns   (fexp.h:49-78)

The grid tiles the flattened row axis; all weights stay resident in VMEM
across grid steps (weight blocks are invariant, so Mosaic hoists their
copy).  VMEM high-water mark at the largest shipped net (merger 384x1536 +
1536x256 padded) is ~6 MB with TILE_ROWS=256 — comfortably inside 16 MB.

The ``fast`` variant reproduces the ICSI fast-exp bit trick
(fexp.h:14-21) exactly as posteriors/fexp.py does — integer ops are plain
VPU work, so bit-parity with the reference's NN_FAST_EXP builds is free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phnrec_tpu.posteriors.fexp import FEXP_A, FEXP_K

TILE_ROWS = 256

# fexp/exp arguments below this are denormal-or-zero in f32 either way;
# used only to keep masked lanes out of int32-overflow territory.
_NEG_CLAMP = -100.0


def _fexp(y):
    """ICSI fast exp, deterministic low-word-0 form (fexp.py:33-42)."""
    t = (FEXP_A * y).astype(jnp.int32) + FEXP_K
    e = (t >> 20) - 1023
    m = (t & 0xFFFFF).astype(jnp.float32) * (1.0 / 1048576.0)
    return jnp.exp2(e.astype(jnp.float32)) * (1.0 + m)


def _split_bf16(a):
    """f32 -> (hi, lo) bf16 pair with hi + lo == a to ~16 mantissa bits."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b_hi, b_lo):
    """3-pass bf16 emulation of an f32 matmul (lax.Precision.HIGH):
    a·b ≈ a_hi·b_hi + a_hi·b_lo + a_lo·b_hi, f32 accumulation on the MXU.
    The activation split is per-tile VPU work; the weight split is done
    once by the caller so it never re-runs across grid steps."""
    a_hi, a_lo = _split_bf16(a)
    d = lambda u, v: jnp.dot(  # noqa: E731
        u, v, preferred_element_type=jnp.float32)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _sigmoid(a1, fast):
    if fast:
        return 1.0 / (1.0 + _fexp(-a1))         # fexp_sigmoid fexp.h:33-38
    return jax.nn.sigmoid(a1)


def _finish(o, out_ref, n_out, fast, apply_softmax):
    if not apply_softmax:
        out_ref[:] = o
        return
    # Masked softmax over the valid n_out columns (padded cols excluded,
    # matching the slice-then-softmax order of the unfused path).
    cols = jax.lax.broadcasted_iota(jnp.int32, o.shape, 1)
    valid = cols < n_out
    mx = jnp.max(jnp.where(valid, o, -jnp.inf), axis=-1, keepdims=True)
    shifted = jnp.where(valid, o - mx, _NEG_CLAMP)
    e = _fexp(shifted) if fast else jnp.exp(shifted)
    e = jnp.where(valid, e, 0.0)
    out_ref[:] = e / jnp.sum(e, axis=-1, keepdims=True)


def _kernel(x_ref, mean_ref, dev_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, *, n_out: int, fast: bool, apply_softmax: bool,
            prec: jax.lax.Precision):
    xn = (x_ref[:] - mean_ref[:]) * dev_ref[:]
    a1 = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32,
                 precision=prec)
    h = _sigmoid(a1 + b1_ref[:], fast)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
    o = o + b2_ref[:]
    _finish(o, out_ref, n_out, fast, apply_softmax)


def _kernel3(x_ref, mean_ref, dev_ref, w1h_ref, w1l_ref, b1_ref,
             w2h_ref, w2l_ref, b2_ref, out_ref, *, n_out: int, fast: bool,
             apply_softmax: bool):
    """3-pass-bf16 (Precision.HIGH) variant: weights arrive pre-split as
    bf16 hi/lo pairs (same VMEM bytes as one f32 copy)."""
    xn = (x_ref[:] - mean_ref[:]) * dev_ref[:]
    h = _sigmoid(_dot3(xn, w1h_ref[:], w1l_ref[:]) + b1_ref[:], fast)
    o = _dot3(h, w2h_ref[:], w2l_ref[:]) + b2_ref[:]
    _finish(o, out_ref, n_out, fast, apply_softmax)


@functools.partial(
    jax.jit,
    static_argnames=("n_out", "fast", "apply_softmax", "tile", "interpret",
                     "prec"))
def mlp_forward_fused(x, mean, dev, w1, b1, w2, b2, *, n_out: int,
                      fast: bool = True, apply_softmax: bool = True,
                      tile: int = TILE_ROWS, interpret: bool = False,
                      prec=None):
    """[..., i_pad] -> [..., o_pad] through the fused kernel.

    All operands must already be padded to 128 multiples (mlp.to_device).
    Returns the full padded output; the caller slices to n_out (padded
    columns are exactly 0 under softmax and exactly b2-pad=0 without).
    Precision.HIGH runs the 3-pass-bf16 kernel (weights pre-split once,
    outside the grid); DEFAULT/HIGHEST lower directly through Mosaic.
    """
    if prec is None:
        from phnrec_tpu import precision
        prec = precision.get()
    i_p = w1.shape[0]
    h_p, o_p = w2.shape
    lead = x.shape[:-1]
    n = 1
    for d in lead:
        n *= d
    # No explicit row padding: ragged final blocks are clipped by Pallas
    # (OOB reads yield don't-care rows whose writes are masked), avoiding
    # two full-tensor HBM copies per net.
    x2 = x.reshape(n, i_p)

    full = lambda r, c: pl.BlockSpec(  # noqa: E731 — weight block, invariant
        (r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((tile, i_p), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, o_p), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, o_p), jnp.float32)

    if prec == jax.lax.Precision.HIGH:
        w1h, w1l = _split_bf16(w1)
        w2h, w2l = _split_bf16(w2)
        out = pl.pallas_call(
            functools.partial(_kernel3, n_out=n_out, fast=fast,
                              apply_softmax=apply_softmax),
            grid=(pl.cdiv(n, tile),),
            in_specs=[
                row_spec,
                full(1, i_p), full(1, i_p),              # mean, dev
                full(i_p, h_p), full(i_p, h_p),          # w1 hi/lo
                full(1, h_p),                            # b1
                full(h_p, o_p), full(h_p, o_p),          # w2 hi/lo
                full(1, o_p),                            # b2
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(x2, mean.reshape(1, i_p), dev.reshape(1, i_p),
          w1h, w1l, b1.reshape(1, h_p), w2h, w2l, b2.reshape(1, o_p))
        return out.reshape(*lead, o_p)

    out = pl.pallas_call(
        functools.partial(_kernel, n_out=n_out, fast=fast,
                          apply_softmax=apply_softmax, prec=prec),
        grid=(pl.cdiv(n, tile),),
        in_specs=[
            row_spec,
            full(1, i_p), full(1, i_p),          # mean, dev
            full(i_p, h_p), full(1, h_p),        # w1, b1
            full(h_p, o_p), full(1, o_p),        # w2, b2
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(x2, mean.reshape(1, i_p), dev.reshape(1, i_p),
      w1, b1.reshape(1, h_p), w2, b2.reshape(1, o_p))

    return out.reshape(*lead, o_p)
