"""Global matmul-precision knob for the numeric pipeline.

The reference does all arithmetic in CPU float32 (STK FLOAT with
DOUBLEPRECISION=0, STKLib/common.h:92-103).  On TPU MXUs, float32 matmuls
are emulated by multiple bfloat16 passes; the pass count is the
speed/accuracy trade:

  * ``"highest"`` (default) — 6-pass bf16, indistinguishable from CPU f32
    for this pipeline; posteriors match the NumPy oracle to ~1e-5 and all
    golden phoneme strings bit-match.  This is the parity mode.
  * ``"high"`` — 3-pass bf16 (~2x faster matmuls), posteriors to ~1e-4.
    Golden strings still match on the shipped packages (verified in
    tests/test_parity.py-level checks on TPU), but this is a throughput
    mode, not a bit-parity guarantee.
  * ``"default"`` — single-pass bf16 inputs.  Fastest; for workloads where
    phoneme-boundary jitter of a frame is acceptable.

Set once before building pipelines (compiled programs bake the setting in
at trace time):

    from phnrec_tpu import precision
    precision.set_mode("high")

or via the PHNREC_TPU_PRECISION environment variable.
"""

from __future__ import annotations

import os

import jax

_MODES = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}

_mode = os.environ.get("PHNREC_TPU_PRECISION", "highest").lower()
if _mode not in _MODES:
    _mode = "highest"


def set_mode(mode: str) -> None:
    global _mode
    if mode not in _MODES:
        raise ValueError(f"precision mode must be one of {sorted(_MODES)}")
    _mode = mode


def get_mode() -> str:
    return _mode


def get() -> jax.lax.Precision:
    """The jax.lax.Precision for every GEMM in the pipeline."""
    return _MODES[_mode]
