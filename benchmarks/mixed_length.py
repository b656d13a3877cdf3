"""Real-pipeline throughput: mixed-length corpus -> the CLI file-list
path (SpeechRec.process_file_list -> PrefetchLoader -> bucketed batches
-> device decode -> MLF), including host I/O, padding waste, and label
formatting.

The hero bench (bench.py) measures one uniform pre-staged batch; this one
measures the production path the reference models as its serial file-list
loop (ProcessFileList, srec.cpp:1246-1291): N utterances of varied
durations read from disk, decoded with the CZ package, written to a
Master Label File.  Audio seconds are counted at TRUE lengths, so bucket
padding waste lowers the reported rate — the gap to the hero number is
the loader/bucketing overhead.

Through the dev tunnel this metric is host->device-bandwidth-bound
(~30 MB/s): lin16 ships 16 kB per audio-second (int16 on the link, cast
on device), bounding it near ~1.9k au-s/s.  The alaw companion ships raw
uint8 codes (8 kB/au-s, decoded by a device table gather exactly as
srec.cpp:769) — half the bytes, so ~2x the corpus rate, demonstrating
that the link, not the chip, is the limit and that H2D (next batch)
overlaps device compute (the loader prefetches and the decode loop keeps
one batch in flight).

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


def _alaw_encode(sig: np.ndarray) -> np.ndarray:
    """Nearest-code A-law encoder (the optimal quantizer against the
    reference's decode table 8*ALawTableD5, srec.cpp:769)."""
    from phnrec_tpu.io.audio import ALAW_TABLE_D5

    dec = 8.0 * ALAW_TABLE_D5.astype(np.float64)
    order = np.argsort(dec)
    sd = dec[order]
    pos = np.searchsorted(sd, sig.astype(np.float64))
    pos = np.clip(pos, 1, 255)
    left, right = sd[pos - 1], sd[pos]
    take_left = (sig - left) <= (right - sig)
    idx = np.where(take_left, pos - 1, pos)
    return order[idx].astype(np.uint8)


def build_corpus(root: str, n_utts: int, fmt: str = "lin16") -> list[str]:
    """Slice/tile test.raw into n_utts raw files (idempotent)."""
    os.makedirs(root, exist_ok=True)
    src = np.frombuffer(open(TEST_RAW, "rb").read(), np.int16)
    ext = "raw" if fmt == "lin16" else "alaw"
    paths = []
    for i in range(n_utts):
        # index 0 is the intact source utterance: its decode is asserted
        # against a golden below
        dur = 7.49 if i == 0 else DURATIONS[i % len(DURATIONS)]
        n = int(dur * 8000)
        reps = -(-n // len(src))
        sig = np.tile(src, reps)[:n] if i else src
        p = os.path.join(root, f"utt_{i:05d}.{ext}")
        data = (sig.astype("<i2").tobytes() if fmt == "lin16"
                else _alaw_encode(sig).tobytes())
        if not os.path.exists(p) or os.path.getsize(p) != len(data):
            with open(p, "wb") as f:
                f.write(data)
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


def _alaw_package(root: str) -> str:
    """CZ package clone with source/format=alaw (idempotent)."""
    pkg = os.path.join(root, "pkg_alaw")
    if not os.path.isdir(pkg):
        os.makedirs(pkg)
        for entry in os.listdir(CZ_PKG):
            if entry != "config":
                os.symlink(os.path.join(CZ_PKG, entry),
                           os.path.join(pkg, entry))
        cfg = open(os.path.join(CZ_PKG, "config")).read()
        with open(os.path.join(pkg, "config"), "w") as f:
            f.write(cfg.replace("format=lin16", "format=alaw"))
    return pkg


def _mlf_labels(mlf_path: str, stem: str):
    from phnrec_tpu.io.labels import read_mlf

    mlf = read_mlf(mlf_path)
    for name, labels in mlf.items():
        if stem in name:
            return labels
    raise KeyError(stem)


def _time_filelist(sr, corpus, tag: str, iters: int,
                   golden_fn) -> tuple[float, float]:
    """Warm + median-time process_file_list over the corpus; returns
    (audio_seconds, median_seconds)."""
    import gc

    lst = f"/tmp/phnrec_mixed_{tag}.list"
    with open(lst, "w") as f:
        f.write("\n".join(corpus) + "\n")
    audio_s = sum(os.path.getsize(p) for p in corpus) / 8000.0
    if tag == "lin16":
        audio_s /= 2.0
    sr.process_file_list("wf", "str", lst,
                         mlf_path=f"/tmp/phnrec_mixed_{tag}_warm.mlf")
    golden_fn(f"/tmp/phnrec_mixed_{tag}_warm.mlf")
    gc.disable()
    times = []
    for it in range(iters):
        t0 = time.perf_counter()
        sr.process_file_list("wf", "str", lst,
                             mlf_path=f"/tmp/phnrec_mixed_{tag}_{it}.mlf")
        times.append(time.perf_counter() - t0)
    gc.enable()
    golden_fn(f"/tmp/phnrec_mixed_{tag}_{iters - 1}.mlf")
    # report the median; the caller also surfaces best-of — this metric
    # is host->device-link-bound and the dev tunnel's bandwidth swings
    # 2-4x between minutes (measured 1.2k..3.2k au-s/s across runs on
    # identical code), so a single median can misrepresent the pipeline
    return audio_s, sorted(times)[len(times) // 2], min(times)


def run(n_utts: int = 1024, iters: int = 3) -> dict:
    from phnrec_tpu.pipeline import SpeechRec

    # -- lin16 corpus through the CLI file-list path
    corpus = build_corpus("/tmp/phnrec_mixed_corpus", n_utts)
    sr = SpeechRec(CZ_PKG)
    golden = _golden_segments()

    def check_lin16(mlf_path):
        got = [(l.start_frames, l.end_frames, l.name)
               for l in _mlf_labels(mlf_path, "utt_00000")]
        assert got == golden, "mixed-length decode lost golden"

    audio_s, dt, dt_best = _time_filelist(sr, corpus, "lin16", iters,
                                          check_lin16)
    value = audio_s / dt

    # -- alaw corpus: half the link bytes -> ~2x through the tunnel
    corpus_a = build_corpus("/tmp/phnrec_mixed_corpus_alaw", n_utts,
                            fmt="alaw")
    sr_a = SpeechRec(_alaw_package("/tmp/phnrec_mixed_corpus_alaw"))
    # anchor: the batched path must equal the serial path on the SAME
    # alaw bytes (alaw encoding is lossy, so the lin16 golden does not
    # transfer; path equivalence is the invariant)
    want_a = [(l.start_frames, l.end_frames, l.name)
              for l in sr_a.process_offline(
                  "wf", "str", open(corpus_a[0], "rb").read()).labels]

    def check_alaw(mlf_path):
        got = [(l.start_frames, l.end_frames, l.name)
               for l in _mlf_labels(mlf_path, "utt_00000")]
        assert got == want_a, "alaw batched decode diverged from serial"

    audio_a, dt_a, dt_a_best = _time_filelist(sr_a, corpus_a, "alaw",
                                              iters, check_alaw)
    value_a = audio_a / dt_a

    from bench import BASELINE_AUDIO_SEC_PER_S
    return {
        "metric": "audio_sec_per_s_per_chip_mixed_corpus_to_mlf",
        "value": round(value, 2),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(value / BASELINE_AUDIO_SEC_PER_S, 2),
        "value_best": round(audio_s / dt_best, 2),
        "alaw_value": round(value_a, 2),
        "alaw_value_best": round(audio_a / dt_a_best, 2),
        "alaw_vs_lin16": round(value_a / value, 2),
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print(json.dumps(run(n)))
