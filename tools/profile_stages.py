"""Stage-level wall-clock profile of the batch pipeline on the real chip.

Times each stage of BatchPipeline._core separately (each stage jitted,
block_until_ready between) to locate the bottleneck.  Dev tool, not a test.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from phnrec_tpu import normalization, precision
from phnrec_tpu.decoder import phnloop
from phnrec_tpu.io.audio import convert_waveform
from phnrec_tpu.parallel.batch import BatchPipeline
from phnrec_tpu.pipeline import SpeechRec

CZ_PKG = "/root/reference/PHN_CZ_SPDAT_LCRC_N1500"
TEST_RAW = "/root/reference/test.raw"


_scalar = None


def timeit(name, fn, *args, iters=8):
    """Time iters dispatches with ONE trailing scalar fetch: on this
    backend block_until_ready returns before execution finishes, so
    per-call sync timing under-reports by orders of magnitude; a scalar
    read of the last output forces the whole dispatch stream."""
    global _scalar
    if _scalar is None:
        _scalar = jax.jit(
            lambda t: jax.tree_util.tree_leaves(t)[0].reshape(-1)[0]
            .astype(jnp.float32))
    out = fn(*args)
    float(_scalar(out))            # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(_scalar(out))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    import os
    precision.set_mode(os.environ.get("PHNREC_TPU_PRECISION", "high"))
    batch = 1024
    sr = SpeechRec(CZ_PKG)
    bp = BatchPipeline(sr)
    raw = open(TEST_RAW, "rb").read()
    wave, _ = convert_waveform(raw, "lin16")
    padded, n_samples = bp.pad_batch([wave] * batch)
    n_frames = bp.frame_counts(n_samples)
    max_frames = int(sr.frontend.frame_count(padded.shape[1]))
    print(f"batch={batch} T={max_frames}")

    w = jax.device_put(jnp.asarray(padded))
    nf = jax.device_put(jnp.asarray(n_frames))

    fe, est = sr.frontend, sr.estimator

    @jax.jit
    def s_front(w):
        frames = jax.vmap(lambda x: fe.frames_from_wave(x, max_frames))(w)
        par = fe.log_mel_from_frames(frames)
        par = normalization.frame_norm(par, sr.frame_shift, sr.frame_floor)
        return jax.vmap(lambda p, n: normalization.sentence_norm(
            p, sr.sent_norm, n_valid=n))(par, nf)

    @jax.jit
    def s_lcrc(par):
        return est.assembler.batched(par, nf)

    from phnrec_tpu.posteriors import mlp

    @jax.jit
    def s_mlp(lr):
        left, right = lr
        lo = mlp.forward(est.band[0], left, est.fast_exp)
        ro = mlp.forward(est.band[1], right, est.fast_exp)
        m = jnp.concatenate([lo, ro], axis=-1)
        m = jnp.where(m > 0.0, jnp.log(jnp.maximum(m, 1e-37)), 0.0)
        post = mlp.forward(est.merger, m, est.fast_exp)
        post = sr.post_soft(post)
        return sr.dec_soft(post)

    @jax.jit
    def s_viterbi(lp):
        return phnloop.viterbi_scan_batch(sr.loop_spec, lp)

    @jax.jit
    def s_backtrack(hist):
        return phnloop.backtrack_device(sr.loop_spec, hist, nf)

    par = timeit("frontend (mel+norms)", s_front, w)
    lr = timeit("LCRC conv", s_lcrc, par)
    lp = timeit("MLP x3 + log", s_mlp, lr)
    hist = timeit("viterbi scan", s_viterbi, lp)
    segs = timeit("device backtrack", s_backtrack, hist)
    timeit("full _core", lambda: bp._core(w, nf, max_frames))

    def fetch():
        s = phnloop.fetch_segments(segs)
        return phnloop.labels_from_segments(s, n_frames, sr.phonemes)
    t0 = time.perf_counter()
    fetch()
    print(f"{'fetch+labels (host)':34s} {(time.perf_counter()-t0)*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
