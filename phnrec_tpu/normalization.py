"""Frame-, sentence- and (streaming) online normalization.

Reference: SpeechRec::FrameBasedNormalization (srec.cpp:1594-1620),
SpeechRec::SentenceBasedNormalization (srec.cpp:1492-1592), and the online
per-channel estimator in norm.{cpp,h} (streaming mode).

All functions are pure [T, D] -> [T, D]; the sentence ops take an optional
valid-frame count so batched/padded utterances normalize over real frames
only (padded rows replicate the last frame, which WOULD bias the mean).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

FRAME_NORM_NO_FLOOR = -9999.9  # framenorm/min_floor default (srec.cpp:68)


class SentenceNormSpec(NamedTuple):
    mean_norm: bool = False
    var_norm: bool = False
    std_thr: float = 0.01
    max_norm: bool = False
    chmax_norm: bool = False

    @property
    def enabled(self) -> bool:
        return (self.mean_norm or self.var_norm or self.max_norm
                or self.chmax_norm)


def spec_from_config(cfg) -> SentenceNormSpec:
    # NOTE: the reference reads the threshold from "melbanks/sent_std_thr"
    # (srec.cpp:1531) which was never registered and asserts when
    # sent_var_norm=true — a latent bug in a never-shipped path.  We read
    # the registered offlinenorm/sent_std_thr (srec.cpp:64) instead.
    return SentenceNormSpec(
        mean_norm=cfg.get_bool("offlinenorm", "sent_mean_norm"),
        var_norm=cfg.get_bool("offlinenorm", "sent_var_norm"),
        std_thr=cfg.get_float("offlinenorm", "sent_std_thr"),
        max_norm=cfg.get_bool("offlinenorm", "sent_max_norm"),
        chmax_norm=cfg.get_bool("offlinenorm", "sent_chmax_norm"),
    )


def frame_norm(x: jnp.ndarray, shift: float = 0.0,
               min_floor: float = FRAME_NORM_NO_FLOOR) -> jnp.ndarray:
    if shift != 0.0:
        x = x + jnp.float32(shift)
    if min_floor != FRAME_NORM_NO_FLOOR:
        x = jnp.maximum(x, jnp.float32(min_floor))
    return x


def sentence_norm(x: jnp.ndarray, spec: SentenceNormSpec,
                  n_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sentence mean/variance/maximum normalization (srec.cpp:1492-1592).

    With n_valid set, rows >= n_valid are assumed to replicate the last
    valid row, so statistics are computed over the first n_valid rows by
    masking.  (Normalizing padded rows too is harmless — they are dropped.)
    """
    if not spec.enabled:
        return x
    T = x.shape[0]
    if n_valid is None:
        inv_n = 1.0 / T
        mask = None
    else:
        inv_n = 1.0 / n_valid.astype(jnp.float32)
        mask = (jnp.arange(T) < n_valid)[:, None]

    def _sum(v):
        return jnp.sum(jnp.where(mask, v, 0.0) if mask is not None else v,
                       axis=0, keepdims=True)

    if spec.mean_norm or spec.var_norm:
        mean = _sum(x) * inv_n
        x = x - mean
        if spec.var_norm:
            std = jnp.sqrt(_sum(x * x) * inv_n)
            std = jnp.maximum(std, jnp.float32(spec.std_thr))
            x = x * (1.0 / std)
            if not spec.mean_norm:
                x = x + mean

    if spec.max_norm or spec.chmax_norm:
        big_neg = jnp.float32(-9999.9)
        xm = jnp.where(mask, x, big_neg) if mask is not None else x
        chmax = jnp.max(xm, axis=0, keepdims=True)
        if spec.max_norm:
            # The reference's global-max loop (srec.cpp:1571-1582)
            # self-clobbers its max row and effectively subtracts
            # channel 0's max everywhere; no shipped config uses it.
            # We implement the evident intent: the true global maximum.
            x = x - jnp.max(chmax)
        else:
            x = x - chmax
    return x
