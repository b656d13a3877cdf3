"""Live audio recognition (reference: RunLive srec.cpp:1438-1490 +
LWFSource OSS capture lwfsource.{cpp,h}).

The reference reads 125 ms chunks from /dev/dsp on a capture thread.
Modern Linux rarely exposes OSS; this frontend accepts, in order:

  1. an explicit source: a file path, "-"/"stdin" for a raw sample pipe
     (e.g. ``arecord -f S16_LE -r 8000 -t raw | phnrec -a``), or
  2. /dev/dsp if present (OSS compat),

and feeds 1/8-second chunks into a StreamingRecognizer, emitting settled
words through a callback in the reference's three live output formats
(str / strlen / lab, phnrec.cpp:71-110).
"""

from __future__ import annotations

import sys
from typing import Callable, Optional

from phnrec_tpu.io.labels import Label
from phnrec_tpu.pipeline import SpeechRec
from phnrec_tpu.streaming import StreamingRecognizer


def format_live(label: Label, fmt: str) -> str:
    if fmt == "lab":
        return f"{label.start_htk} {label.end_htk} {label.name} " \
               f"{label.score:f}"
    if fmt == "str":
        return f" {label.name}"
    if fmt == "strlen":
        length = (label.end_htk - label.start_htk) // 100000 + 1
        return f" {label.name}({length})"
    raise ValueError(
        f"Invalid output format: {fmt}. (can be 'lab', 'str', 'strlen')")


def run_live(sr: SpeechRec, out_format: str = "str",
             source: Optional[str] = None,
             emit: Optional[Callable[[str], None]] = None,
             max_chunks: Optional[int] = None) -> list:
    """Read raw samples from `source` and print phonemes as they settle."""
    emit = emit or (lambda s: print(s, flush=True))
    bytes_per_sample = 2 if sr.wave_format == "lin16" else 1
    chunk = sr.cfg.get_int("source", "sample_freq") // 8 * bytes_per_sample

    if source in (None, "-", "stdin"):
        stream = sys.stdin.buffer
    else:
        stream = open(source, "rb")

    rec = StreamingRecognizer(sr)
    # live KWS drops detections below the per-keyword threshold — the
    # callback filter in phnrec.cpp:81-83; label files keep every candidate
    thr = None
    if sr.stk_decoder is not None and sr.stk_decoder.mode == "kws":
        thr = sr.stk_decoder.keyword_thresholds
    emitted = 0
    n = 0
    try:
        while True:
            data = stream.read(chunk)
            if not data:
                break
            rec.process(data)
            settled = rec.results(settled_only=True)
            for lab in settled[emitted:]:
                if thr is not None and lab.score < thr.get(lab.name):
                    continue
                emit(format_live(lab, out_format))
            emitted = len(settled)
            n += 1
            if max_chunks is not None and n >= max_chunks:
                break
    finally:
        if stream is not sys.stdin.buffer:
            stream.close()
    final = rec.finish()
    for lab in final[emitted:]:
        emit(format_live(lab, out_format))
    return final
