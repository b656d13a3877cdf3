"""Keyword spotting: build a KWS network for a keyword list and score an
utterance by keyword/filler likelihood ratio.

The reference's KWS mode (stkinterface.cpp:240-289): a background phoneme
loop (filler) runs in parallel with one branch per keyword pronunciation;
per frame, LR = keyword-end score - filler-end score; candidates above
the per-keyword threshold are reported.

    python examples/keyword_spotting.py PKG_DIR audio.raw "kw1=p h n" [...]

Keywords are `name=phone phone ...` (phones from the package's
dicts/phonemes list).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(1)
    pkg = sys.argv[1]
    path = sys.argv[2]
    keywords = {}
    for a in sys.argv[3:]:
        name, pron = a.split("=", 1)
        keywords[name] = pron.strip()

    import numpy as np

    from phnrec_tpu.io import audio
    from phnrec_tpu.io.mmf import parse_mmf
    from phnrec_tpu.io.stknet import parse_stk_network
    from phnrec_tpu.kws import KWSNetGenerator
    from phnrec_tpu.lexicon import Lexicon
    from phnrec_tpu.phntrans import PhnTranscriber
    from phnrec_tpu.decoder.stknet import StkNetworkDecoder
    from phnrec_tpu import netgen
    from phnrec_tpu.pipeline import SpeechRec

    sr = SpeechRec(pkg)
    phn_list = os.path.join(pkg, "dicts", "phonemes")

    lex = Lexicon()
    for w, pron in keywords.items():
        lex.add_word(w, pron)
    gen = KWSNetGenerator(PhnTranscriber(lexicon=lex, mode="lexicon"))
    gen.load_phn_list(phn_list)

    with tempfile.TemporaryDirectory() as d:
        mmf_path = os.path.join(d, "models")
        net_path = os.path.join(d, "kwsnet")
        netgen.phn_list_to_hmm_defs(phn_list, mmf_path, 3)
        gen.generate(sorted(keywords), net_path)
        ms = parse_mmf(mmf_path)
        net = parse_stk_network(net_path)
    dec = StkNetworkDecoder(ms, net, wpenalty=sr.loop_spec.w_penalty,
                            lm_scale=1.0, mode="kws")

    post = sr.process_offline("wf", "post",
                              audio.load_waveform_bytes(path))
    hits = dec.decode(np.log(np.maximum(np.asarray(post), 1e-37)))
    if not hits:
        print("no keyword candidates")
    for h in hits:
        print(f"{h.name:12s} {h.start_frames * 10:6d}.."
              f"{h.end_frames * 10}ms  LR={h.score:.2f}")


if __name__ == "__main__":
    main()
