"""End-to-end throughput benchmark: audio-seconds decoded per second per chip.

Pipeline measured: padded waveform batch -> mel -> sentence norm -> LCRC ->
3 MLPs -> log -> Viterbi scan (device) + history backtrack (host), on the
flagship CZ SpeechDat LCRC_N1500 package (15 banks @ 8 kHz, 165->1500->138
band nets, 276->1500->138 merger, 46-phoneme loop x 3 states).

Baseline: the reference C++ phnrec (PHNREC_ONLY -O2 build, tools/
build_oracle.sh) decodes the same utterance at ~8.5 audio-sec/s on this
machine's CPU (single core, measured 2026-08-17; no published reference
numbers exist — SURVEY.md section 6).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_AUDIO_SEC_PER_S = 8.54  # reference C++ on this host, see docstring

CZ_PKG = "/root/reference/PHN_CZ_SPDAT_LCRC_N1500"
TEST_RAW = "/root/reference/test.raw"


GOLDEN_REC = "/root/reference/test.rec.org"


def _golden_segments():
    """(start_frame, end_frame, phoneme) triples from the reference's
    committed golden output for test.raw + the CZ package."""
    segs = []
    for line in open(GOLDEN_REC):
        parts = line.split()
        if len(parts) >= 3:
            segs.append((int(parts[0]) // 100000, int(parts[1]) // 100000,
                         parts[2]))
    return segs


def _run_companion(timeout_s: float = 540.0) -> dict:
    """Real-pipeline companion metric (mixed-length corpus from disk; see
    benchmarks/mixed_length.py), run as a KILLABLE SUBPROCESS before this
    process touches the TPU — a watchdog thread cannot be cancelled and
    would leave torn in-process TPU state on timeout, and the backend
    tolerates only one TPU process at a time, so the subprocess must
    finish (or die) before the hero benchmark initializes JAX."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.setdefault("PHNREC_TPU_PRECISION", "high")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "benchmarks", "mixed_length.py"),
             "1024"],
            capture_output=True, text=True, timeout=timeout_s, env=env)
        for line in reversed(proc.stdout.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {"metric": "mixed_corpus_error",
                "error": f"rc={proc.returncode}: "
                         f"{proc.stderr.strip()[-300:]}"}
    except subprocess.TimeoutExpired:
        return {"metric": "mixed_corpus_error", "error": "timeout"}
    except Exception as e:  # never sink the hero metric
        return {"metric": "mixed_corpus_error", "error": str(e)}


def _device_staged_mixed(sr, bp, n_utts: int = 1024,
                         iters: int = 5) -> dict:
    """Mixed-length corpus PRE-STAGED in HBM: the bucketed batch
    pipeline at device-bound rates, reporting padding-waste-adjusted
    audio-s/s — the number the link-bound from-disk companion cannot
    show (bucket efficiency at the production 2-s granularity).
    Audio seconds count TRUE lengths; ``bucket_efficiency`` is
    true/padded."""
    import gc

    import jax
    import jax.numpy as jnp

    from benchmarks.mixed_length import DURATIONS
    from phnrec_tpu.decoder import phnloop
    from phnrec_tpu.parallel.distributed import bucket_by_frames

    src = np.frombuffer(open(TEST_RAW, "rb").read(), np.int16)
    lengths = [len(src) if i == 0 else int(
        DURATIONS[i % len(DURATIONS)] * 8000) for i in range(n_utts)]
    gran = 2 * 8000
    plan = bucket_by_frames(lengths, 256, gran)
    batches = []
    golden_pos = None
    for bi, idxs in enumerate(plan):
        L = -(-max(lengths[i] for i in idxs) // gran) * gran
        wave = np.zeros((len(idxs), L), np.int16)
        ns = np.zeros(len(idxs), np.int32)
        for r, i in enumerate(idxs):
            n = lengths[i]
            reps = -(-n // len(src))
            wave[r, :n] = np.tile(src, reps)[:n]
            ns[r] = n
            if i == 0:
                golden_pos = (bi, r)
        nf = bp.frame_counts(ns)
        batches.append((jax.device_put(jnp.asarray(wave)),
                        jax.device_put(jnp.asarray(nf)), nf,
                        int(sr.frontend.frame_count(L)),
                        float(ns.sum()) / 8000.0,
                        len(idxs) * L / 8000.0))
    true_audio = sum(b[4] for b in batches)
    padded_audio = sum(b[5] for b in batches)

    def one_pass():
        out = []
        pending = None
        for w, nfd, nf, mx, _, _ in batches:
            fetched = phnloop.fetch_segments_start(bp._core(w, nfd, mx))
            if pending is not None:
                out.append(phnloop.labels_from_segments(
                    phnloop.fetch_segments_finish(pending[0]),
                    pending[1], sr.phonemes))
            pending = (fetched, nf)
        out.append(phnloop.labels_from_segments(
            phnloop.fetch_segments_finish(pending[0]), pending[1],
            sr.phonemes))
        return out

    labels = one_pass()                      # warm/compile per bucket
    bi, r = golden_pos
    got = [(l.start_frames, l.end_frames, l.name) for l in labels[bi][r]]
    assert got == _golden_segments(), "device-staged mixed decode lost " \
                                      "golden"
    gc.disable()
    try:
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            one_pass()
            times.append(time.perf_counter() - t0)
    finally:
        gc.enable()   # a raise here must not leave gc off for the hero
    dt = sorted(times)[len(times) // 2]
    return {
        "metric": "audio_sec_per_s_per_chip_mixed_device_staged",
        "value": round(true_audio / dt, 2),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(true_audio / dt / BASELINE_AUDIO_SEC_PER_S,
                             2),
        "padded_value": round(padded_audio / dt, 2),
        "bucket_efficiency": round(true_audio / padded_audio, 3),
        "n_buckets": len(batches),
    }


def main() -> None:
    import os

    # companion first: it owns the TPU for its lifetime, then exits
    mixed = _run_companion()

    import jax

    from phnrec_tpu import precision

    # throughput mode: fewer bf16 passes per f32 GEMM.  'highest' and
    # 'high' keep golden strings + boundaries identical (asserted below);
    # 'default' (single-pass bf16) does NOT and would fail the assert.
    precision.set_mode(os.environ.get("PHNREC_TPU_PRECISION", "high"))

    from phnrec_tpu.io.audio import convert_waveform
    from phnrec_tpu.parallel.batch import BatchPipeline
    from phnrec_tpu.pipeline import SpeechRec

    import jax.numpy as jnp

    from phnrec_tpu.decoder import phnloop

    batch = 1024
    sr = SpeechRec(CZ_PKG)
    bp = BatchPipeline(sr)

    raw = open(TEST_RAW, "rb").read()
    wave, _ = convert_waveform(raw, "lin16")
    audio_seconds_per_utt = len(raw) / 2 / 8000.0
    waves = [wave] * batch
    padded, n_samples = bp.pad_batch(waves)
    n_frames = bp.frame_counts(n_samples)
    max_frames = int(sr.frontend.frame_count(padded.shape[1]))

    # inputs staged in HBM once (production decoders overlap input DMA
    # with compute; this dev harness reaches the chip through a slow
    # tunnel, which would otherwise dominate)
    w_dev = jax.device_put(jnp.asarray(padded))
    nf_dev = jax.device_put(jnp.asarray(n_frames))

    def one_iter():
        segs = bp._core(w_dev, nf_dev, max_frames)  # incl. device backtrack
        segs = phnloop.fetch_segments(segs)         # one batched transfer
        return phnloop.labels_from_segments(segs, n_frames, sr.phonemes)

    labels = one_iter()  # warm up / compile
    golden = _golden_segments()
    got = [(l.start_frames, l.end_frames, l.name) for l in labels[0]]
    assert got == golden, (
        f"decode does not match golden {GOLDEN_REC}: got {got[:5]}... "
        f"want {golden[:5]}...")

    # Pipelined stream, the production shape (srec.cpp:1246-1291 is a
    # serial file-list loop; here each batch's D2H is started right after
    # its compute is dispatched, and batch i+1's compute is dispatched
    # before batch i's results are consumed, so the transfer + host label
    # formatting ride under the device compute).  Median of per-finished-
    # batch times: the dev tunnel to the chip has multi-second stalls on
    # some round trips; the median is the honest sustained rate.
    import gc

    iters = 11
    times = []
    pending = phnloop.fetch_segments_start(
        bp._core(w_dev, nf_dev, max_frames))
    gc.disable()   # 50k Label objects/iter; collect after the loop
    t_prev = time.perf_counter()
    for _ in range(iters):
        nxt = phnloop.fetch_segments_start(
            bp._core(w_dev, nf_dev, max_frames))
        labels = phnloop.labels_from_segments(
            phnloop.fetch_segments_finish(pending), n_frames, sr.phonemes)
        pending = nxt
        t_now = time.perf_counter()
        times.append(t_now - t_prev)
        t_prev = t_now
    gc.enable()
    phnloop.fetch_segments_finish(pending)
    got = [(l.start_frames, l.end_frames, l.name) for l in labels[0]]
    assert got == golden, "pipelined decode diverged from golden"
    dt = sorted(times)[len(times) // 2]

    total_audio = batch * audio_seconds_per_utt
    value = total_audio / dt

    # companion metric measured up front (subprocess, see _run_companion);
    # printed here so the hero line stays LAST for the driver's parser
    print(json.dumps(mixed))

    try:
        print(json.dumps(_device_staged_mixed(sr, bp)))
    except Exception as e:  # never sink the hero metric
        print(json.dumps({"metric": "mixed_device_staged_error",
                          "error": str(e)[:300]}))

    print(json.dumps({
        "metric": "audio_sec_per_s_per_chip_e2e_wav_to_rec",
        "value": round(value, 2),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(value / BASELINE_AUDIO_SEC_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
