"""Real-pipeline throughput: mixed-length corpus -> PrefetchLoader ->
bucketed batches -> batch decode -> MLF, including host I/O, padding
waste, and label formatting.

The hero bench (bench.py) measures one uniform pre-staged batch; this one
measures the production path the reference models as its serial file-list
loop (ProcessFileList, srec.cpp:1246-1291): N utterances of varied
durations read from disk, decoded with the CZ package, written to a
Master Label File.  Audio seconds are counted at TRUE lengths, so bucket
padding waste lowers the reported rate — the gap to the hero number is
the loader/bucketing overhead.

Usage: python benchmarks/mixed_length.py [n_utts]
Prints one JSON line; also importable (run()) from bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CZ_PKG = "/root/reference/PHN_CZ_SPDAT_LCRC_N1500"
TEST_RAW = "/root/reference/test.raw"
GOLDEN_REC = "/root/reference/test.rec.org"

# deterministic mixed durations (seconds); cycled over the corpus.  Mix of
# short commands, typical utterances, and long-form clips around the 7.49 s
# source (longer ones tile it).
DURATIONS = [1.1, 7.49, 2.3, 4.7, 0.9, 9.8, 3.1, 6.2, 1.7, 12.4, 5.3, 2.9]


def build_corpus(root: str, n_utts: int) -> list[str]:
    """Slice/tile test.raw into n_utts lin16 raw files (idempotent)."""
    os.makedirs(root, exist_ok=True)
    src = np.frombuffer(open(TEST_RAW, "rb").read(), np.int16)
    paths = []
    for i in range(n_utts):
        # index 0 is the intact source utterance: its decode is asserted
        # against the committed golden below
        dur = 7.49 if i == 0 else DURATIONS[i % len(DURATIONS)]
        n = int(dur * 8000)
        reps = -(-n // len(src))
        sig = np.tile(src, reps)[:n] if i else src
        p = os.path.join(root, f"utt_{i:05d}.raw")
        if not os.path.exists(p) or os.path.getsize(p) != sig.nbytes:
            sig.tofile(p)
        paths.append(p)
    return paths


def _golden_segments():
    segs = []
    for line in open(GOLDEN_REC):
        parts = line.split()
        if len(parts) >= 3:
            segs.append((int(parts[0]) // 100000, int(parts[1]) // 100000,
                         parts[2]))
    return segs


def run(n_utts: int = 1024, iters: int = 3) -> dict:
    import gc

    import jax
    import jax.numpy as jnp

    from phnrec_tpu.decoder import phnloop
    from phnrec_tpu.io.labels import MLFWriter
    from phnrec_tpu.parallel.batch import BatchPipeline
    from phnrec_tpu.parallel.loader import PrefetchLoader
    from phnrec_tpu.pipeline import SpeechRec

    corpus = build_corpus("/tmp/phnrec_mixed_corpus", n_utts)
    sr = SpeechRec(CZ_PKG)
    bp = BatchPipeline(sr)

    # coarse bucket granularity (2 s of samples) keeps the number of
    # compiled shapes small; padding waste is charged to the metric
    def loader():
        # raw_int16: samples cross the host->device link as int16 and are
        # converted in the jitted pipeline — the link, not the chip, is
        # the bottleneck for real file-list workloads
        return PrefetchLoader(corpus, fmt="lin16", sample_freq=8000,
                              max_batch=256, granularity=16000,
                              prefetch=3, n_workers=8, raw_int16=True)

    def one_pass(mlf_path: str) -> float:
        """Decode the whole corpus once; returns true audio seconds."""
        total_audio = 0.0
        golden_labels = None
        with MLFWriter(mlf_path) as mlf:
            pending = None  # (batch, fetch-in-flight, n_frames)

            def finish(p):
                nonlocal golden_labels
                batch, fetched, n_frames = p
                segs = phnloop.fetch_segments_finish(fetched)
                labels = phnloop.labels_from_segments(
                    segs, n_frames, sr.phonemes)
                for src, labs in zip(batch.sources, labels):
                    name = os.path.splitext(os.path.basename(src))[0]
                    mlf.add(name + ".rec", labs)
                    if name == "utt_00000":
                        golden_labels = labs

            for batch in loader():
                n_frames = bp.frame_counts(batch.n_samples)
                max_frames = int(sr.frontend.frame_count(batch.wave.shape[1]))
                segs = bp._core(jnp.asarray(batch.wave),
                                jnp.asarray(n_frames), max_frames)
                fetched = phnloop.fetch_segments_start(segs)
                if pending is not None:
                    finish(pending)
                pending = (batch, fetched, n_frames)
                total_audio += batch.audio_seconds
            if pending is not None:
                finish(pending)
        got = [(l.start_frames, l.end_frames, l.name) for l in golden_labels]
        assert got == _golden_segments(), "mixed-length decode lost golden"
        return total_audio

    audio_s = one_pass("/tmp/phnrec_mixed_warm.mlf")   # compile all shapes
    gc.disable()
    times = []
    for it in range(iters):
        t0 = time.perf_counter()
        one_pass(f"/tmp/phnrec_mixed_{it}.mlf")
        times.append(time.perf_counter() - t0)
    gc.enable()
    dt = sorted(times)[len(times) // 2]
    value = audio_s / dt
    from bench import BASELINE_AUDIO_SEC_PER_S
    return {
        "metric": "audio_sec_per_s_per_chip_mixed_corpus_to_mlf",
        "value": round(value, 2),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(value / BASELINE_AUDIO_SEC_PER_S, 2),
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print(json.dumps(run(n)))
