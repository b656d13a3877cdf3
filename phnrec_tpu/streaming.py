"""Streaming (online) recognition with carried state.

The TPU equivalent of ProcessOnline/ProcessTail (srec.cpp:793-927): audio
arrives in arbitrary-size chunks; mel frames are assembled from a carried
sample remainder; the STC context is a carried 30-frame mel tail (the
equivalent of Traps' sliding be_mat); the Viterbi carry and history extend
across chunks.  Frames run through the SAME jitted block functions as the
batch path, in fixed-size frame blocks so jit compiles once.

Semantics vs. the reference:
  * posterior rows start at mel frame trap_shift (=15), exactly like the
    reference's delay gate (srec.cpp:829).  The reference checks the gate
    once per bunch, which feeds the decoder up to bunch_size-1 unprimed
    rows when trap_shift is not a bunch multiple; shipped configs
    (bunch 5, shift 15) are exact multiples, where both behaviors agree.
    We gate per frame.
  * finish() repeats the last mel frame trap_shift times (ProcessTail,
    srec.cpp:877-927) and backtracks the full history (PhnDec::Done).
  * online (estim-interval) normalization applies; sentence norm does not
    (it needs the whole utterance — reference offline-only, srec.cpp:999).

Fixed-lag partial results: results(settled_only=True) replays the history
through the same backtrack and returns only segments that end at least
`time_pruning` frames before the newest frame — the information the
reference's TimePruning callback would have emitted (phndec.cpp:191-234).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from phnrec_tpu import precision

from phnrec_tpu import normalization
from phnrec_tpu.decoder import phnloop
from phnrec_tpu.io import audio
from phnrec_tpu.io.labels import Label
from phnrec_tpu.pipeline import SpeechRec


class StreamingRecognizer:
    def __init__(self, sr: SpeechRec, block_frames: int = 128):
        if sr.estimator is None:
            raise ValueError("streaming requires an enabled estimator")
        self.sr = sr
        self.block = block_frames
        spec = sr.frontend.spec
        self.vs, self.step = spec.vector_size, spec.step
        self.trap_shift = sr.estimator.trap_shift
        self.online_norm = normalization.OnlineNorm.from_config(
            sr.cfg, spec.nbanks)

        self._sample_buf = np.zeros(0, np.float32)
        self._byte_rem = b""
        self._first_frame_done = False
        self._mel_tail: Optional[np.ndarray] = None  # [trap_len-1, nbanks]
        self._mel_pending = np.zeros((0, spec.nbanks), np.float32)
        self._last_mel: Optional[np.ndarray] = None
        self._n_mel = 0          # mel frames fed to the STC window so far
        self._carry = phnloop.init_carry(sr.loop_spec, 1)
        self._hist: List[np.ndarray] = [[], [], []]
        self._n_decoded = 0
        self._post_fn = _make_posterior_block_fn(sr)

    # -- waveform -> mel frames -----------------------------------------
    def _take_frames(self, flush: bool = False) -> np.ndarray:
        """Consume whole frames from the sample buffer (streaming framing
        identical to offline framing of the concatenated signal)."""
        buf = self._sample_buf
        frames = []
        pos = 0
        # frames advance by `step`; the buffer always retains the vs-step
        # overlap
        while len(buf) - pos >= self.vs:
            frames.append(buf[pos : pos + self.vs])
            pos += self.step
            self._first_frame_done = True
        self._sample_buf = buf[pos:]
        if not frames:
            return np.zeros((0, self.vs), np.float32)
        return np.stack(frames)

    def process(self, raw: bytes) -> None:
        """Push a chunk of raw audio bytes (any size, including odd)."""
        sr = self.sr
        if sr.wave_format == "lin16":
            raw = self._byte_rem + raw
            cut = len(raw) - (len(raw) % 2)
            raw, self._byte_rem = raw[:cut], raw[cut:]
        wave = _convert_chunk(raw, sr)
        self._sample_buf = np.concatenate([self._sample_buf, wave])
        frames = self._take_frames()
        if frames.shape[0] == 0:
            return
        T = frames.shape[0]
        # pad the frame count to a multiple of 16 so jit compiles for a
        # few shapes only, not one per chunk size
        pad = (-T) % 16
        if pad:
            frames = np.concatenate(
                [frames, np.zeros((pad, self.vs), np.float32)])
        par = np.asarray(
            sr.frontend.log_mel_from_frames(jnp.asarray(frames)))[:T]
        par = np.asarray(normalization.frame_norm(
            jnp.asarray(par), sr.frame_shift, sr.frame_floor))
        par = self.online_norm.process_block(par)
        self._push_mel(par)

    # -- mel frames -> posteriors -> viterbi -----------------------------
    def _push_mel(self, par: np.ndarray) -> None:
        if par.shape[0] == 0:
            return
        self._last_mel = par[-1]
        if self._mel_tail is None:
            # replicate-first-frame window init (traps.cpp:186-199)
            self._mel_tail = np.repeat(par[:1], 2 * self.trap_shift, axis=0)
        self._mel_pending = np.concatenate([self._mel_pending, par])
        self._drain()

    def _drain(self) -> None:
        while self._mel_pending.shape[0] >= self.block:
            blk, self._mel_pending = (self._mel_pending[: self.block],
                                      self._mel_pending[self.block :])
            self._run_block(blk, blk.shape[0])

    def _run_block(self, blk: np.ndarray, n_valid: int) -> None:
        """blk: [F, nbanks] new mel frames; computes posterior rows for
        windows centered trap_shift back, then extends the Viterbi."""
        sr = self.sr
        est = sr.estimator
        ctx = np.concatenate([self._mel_tail, blk])   # [30 + F, nbanks]
        self._mel_tail = ctx[-2 * self.trap_shift :]
        lp = self._post_fn(jnp.asarray(ctx))
        # rows correspond to window centers (n_mel - 15 .. n_mel + F - 16);
        # drop rows whose center precedes frame 0 (unprimed gate)
        first_center = self._n_mel - self.trap_shift
        self._n_mel += n_valid
        # stay on device end-to-end: the host never blocks on this block's
        # result, so consecutive blocks pipeline through dispatch (the D2H
        # happens once, at results()/finish())
        lp = lp[:n_valid]
        if first_center < 0:
            skip = min(-first_center, int(lp.shape[0]))
            lp = lp[skip:]
        if lp.shape[0] == 0:
            return
        # pass the running frame offset so History.ent stays global
        self._carry, hist = phnloop.viterbi_block(
            sr.loop_spec, self._carry, lp[None], self._n_decoded)
        for i, a in enumerate(hist):
            self._hist[i].append(a[:, 0])
        self._n_decoded += int(lp.shape[0])

    def _flush_blocks(self) -> None:
        self._drain()
        if self._mel_pending.shape[0] > 0:
            blk = self._mel_pending
            self._mel_pending = np.zeros((0, blk.shape[1]), np.float32)
            pad = self.block - blk.shape[0]
            padded = np.concatenate([blk, np.repeat(blk[-1:], pad, axis=0)]) \
                if pad > 0 else blk
            self._run_block(padded, blk.shape[0])

    def finish(self) -> List[Label]:
        """ProcessTail + Done: flush STC latency and backtrack."""
        if self._last_mel is None:
            return []
        # repeat the last mel frame trap_shift times (srec.cpp:889-898)
        self._mel_pending = np.concatenate(
            [self._mel_pending,
             np.repeat(self._last_mel[None], self.trap_shift, axis=0)])
        self._flush_blocks()
        return self.results()

    def results(self, settled_only: bool = False) -> List[Label]:
        if not self._hist[0]:
            return []
        hist = phnloop.History(
            *(np.concatenate([np.asarray(a) for a in h])[: self._n_decoded]
              for h in self._hist))
        labels = phnloop.backtrack(hist, self.sr.phonemes)
        if settled_only:
            tp = self.sr.cfg.get_int("decoder", "time_pruning")
            horizon = self._n_decoded - tp
            labels = [l for l in labels if l.end_frames <= horizon]
        return labels


def _convert_chunk(raw: bytes, sr: SpeechRec) -> np.ndarray:
    """Chunk-safe waveform conversion (no 200-sample min padding — that is
    a whole-file concern handled by io.audio.convert_waveform)."""
    if sr.wave_format == "lin16":
        wave = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    else:
        wave = 8.0 * audio.ALAW_TABLE_D5[
            np.frombuffer(raw, dtype=np.uint8)].astype(np.float32)
    if sr.wave_dc_shift != 0.0:
        wave = wave + np.float32(sr.wave_dc_shift)
    if sr.wave_scale != 1.0:
        wave = wave * np.float32(sr.wave_scale)
    return wave


def _make_posterior_block_fn(sr: SpeechRec):
    """Build the jitted [30+F, nbanks] -> [F, n_out] log-posterior block
    function once per recognizer (compiled per distinct F)."""
    import jax

    est = sr.estimator

    if not hasattr(est, "assembler"):
        # 3BT/1BT/1BT_DCT: windows are static shifted slices of the
        # carried context buffer; _merger_input implements the system's
        # trap assembly (estimator.py)
        from phnrec_tpu.posteriors import mlp as _mlp

        @jax.jit
        def run_traps(ctx):
            F = ctx.shape[0] - 2 * est.trap_shift
            win = jnp.stack(
                [ctx[o : o + F] for o in range(2 * est.trap_shift + 1)],
                axis=1)                                 # [F, trap_len, nb]
            post = _mlp.forward(est.merger, est._merger_input(win),
                                est.fast_exp)
            return sr.dec_soft(sr.post_soft(post))

        return run_traps

    @jax.jit
    def run(ctx):
        F = ctx.shape[0] - 2 * est.trap_shift
        idx = (jnp.arange(F)[:, None] + jnp.arange(2 * est.trap_shift + 1)
               [None, :])
        win = ctx[idx]                                  # [F, 31, B]
        hc = est.assembler.half_context
        from phnrec_tpu.posteriors import mlp
        left = jnp.einsum("tjb,jc->tbc", win[:, :hc, :],
                          est.assembler.m_left,
                          precision=precision.get())
        right = jnp.einsum("tjb,jc->tbc", win[:, hc - 1 :, :],
                           est.assembler.m_right,
                           precision=precision.get())
        lo = mlp.forward(est.band[0], left.reshape(F, -1), est.fast_exp)
        ro = mlp.forward(est.band[1], right.reshape(F, -1), est.fast_exp)
        m = jnp.concatenate([lo, ro], axis=-1)
        m = jnp.where(m > 0.0, jnp.log(jnp.maximum(m, 1e-37)), 0.0)
        post = mlp.forward(est.merger, m, est.fast_exp)
        return sr.dec_soft(sr.post_soft(post))

    return run
