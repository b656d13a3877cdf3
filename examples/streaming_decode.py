"""Streaming decode: feed audio in chunks, get phonemes with fixed lag.

The online path of the reference (ProcessOnline, srec.cpp:793-849) as a
chunked device pipeline: any chunk size works, settled phonemes are
available mid-stream (fixed-lag, decoder/time_pruning frames), and the
final flush reproduces the offline decode exactly on packages without
sentence normalization.

    python examples/streaming_decode.py PKG_DIR audio.raw [chunk_ms]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    pkg, path = sys.argv[1], sys.argv[2]
    chunk_ms = int(sys.argv[3]) if len(sys.argv) > 3 else 250

    from phnrec_tpu.pipeline import SpeechRec
    from phnrec_tpu.streaming import StreamingRecognizer

    sr = SpeechRec(pkg)
    rate = sr.cfg.get_int("source", "sample_freq")
    bps = 2 if sr.wave_format == "lin16" else 1
    chunk = rate * chunk_ms // 1000 * bps

    rec = StreamingRecognizer(sr)
    emitted = 0
    with open(path, "rb") as f:
        while True:
            data = f.read(chunk)
            if not data:
                break
            rec.process(data)
            settled = rec.results(settled_only=True)
            for lab in settled[emitted:]:
                print(f"  [settled] {lab.name:6s} "
                      f"{lab.start_frames * 10:6d}..{lab.end_frames * 10}ms")
            emitted = len(settled)
    final = rec.finish()
    print(f"final: {' '.join(l.name for l in final)}")


if __name__ == "__main__":
    main()
