"""Batched STK-network decode throughput: B utterances through the
vmapped dense network scan + device traceback in two dispatches.

The round-2 network decoder walked each utterance's traceback on the
host, frame by frame; this measures the batched formulation end to end
(posteriors precomputed — the metric isolates the network-decode stage).

Usage: python benchmarks/stkint_batch.py [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CZ = "/root/reference/PHN_CZ_SPDAT_LCRC_N1500"
TEST_RAW = "/root/reference/test.raw"


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    import jax.numpy as jnp

    from phnrec_tpu.pipeline import SpeechRec
    from phnrec_tpu.io.mmf import parse_mmf
    from phnrec_tpu.io.stknet import parse_stk_network
    from phnrec_tpu.netgen import phn_list_to_hmm_defs, phn_list_to_phn_loop
    from phnrec_tpu.decoder.stknet import StkNetworkDecoder

    import tempfile

    sr = SpeechRec(CZ)
    with tempfile.TemporaryDirectory() as d:
        phn_list_to_hmm_defs(os.path.join(CZ, "dicts", "phonemes"),
                             os.path.join(d, "models"), 3)
        phn_list_to_phn_loop(os.path.join(CZ, "dicts", "phonemes"),
                             os.path.join(d, "network"), "oth")
        dec = StkNetworkDecoder(parse_mmf(os.path.join(d, "models")),
                                parse_stk_network(os.path.join(d, "network")),
                                wpenalty=-4.6875, lm_scale=1.0)

    raw = open(TEST_RAW, "rb").read()
    audio_s = len(raw) / 2 / 8000.0
    par = sr.params_from_waveform(raw)
    post = sr.posteriors_from_params(par)
    lp = np.asarray(sr.dec_soft(jnp.asarray(post)))
    T = lp.shape[0]
    batch_lp = np.broadcast_to(lp, (batch, T, lp.shape[1]))
    n_frames = np.full(batch, T, np.int32)

    labels = dec.decode_batch(batch_lp, n_frames)       # compile
    want = dec.decode(lp)
    assert [(l.start_frames, l.end_frames, l.name) for l in labels[0]] == \
        [(w.start_frames, w.end_frames, w.name) for w in want]

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        labels = dec.decode_batch(batch_lp, n_frames)
    dt = (time.perf_counter() - t0) / iters
    value = batch * audio_s / dt
    print(json.dumps({
        "metric": "stkint_batch_decode_audio_sec_per_s",
        "batch": batch,
        "value": round(value, 2),
        "unit": "audio-seconds/s/chip (network decode stage only)",
    }))


if __name__ == "__main__":
    main()
