"""Device-side backtrack (phnloop.backtrack_device) must reproduce the
host history replay (PhnDec::Done semantics) exactly, including ragged
n_frames, like scores, and the -1-predecessor termination."""

import numpy as np
import jax.numpy as jnp

from phnrec_tpu.decoder import phnloop


def _random_case(seed, B=5, T=64, P=7, S=3):
    rng = np.random.default_rng(seed)
    spec = phnloop.PhnLoopSpec(n_phonemes=P, n_states=S, w_penalty=-2.5)
    lp = jnp.asarray(np.log(rng.dirichlet(np.ones(P * S), size=(B, T))
                            ).astype(np.float32))
    n_frames = rng.integers(S, T + 1, size=B).astype(np.int32)
    n_frames[0] = T  # always one full-length row
    return spec, lp, n_frames


def test_matches_host_backtrack():
    for seed in range(4):
        spec, lp, n_frames = _random_case(seed)
        hist = phnloop.viterbi_scan_batch(spec, lp)
        want = phnloop.backtrack_batch(hist, n_frames, [f"p{i}" for i in
                                                        range(spec.n_phonemes)])
        segs = phnloop.backtrack_device(spec, hist, jnp.asarray(n_frames))
        got = phnloop.labels_from_segments(
            phnloop.Segments(*(np.asarray(a) for a in segs)), n_frames,
            [f"p{i}" for i in range(spec.n_phonemes)])
        assert len(got) == len(want)
        for gl, wl in zip(got, want):
            assert [(l.start_frames, l.end_frames, l.name) for l in gl] == \
                   [(l.start_frames, l.end_frames, l.name) for l in wl]
            np.testing.assert_allclose([l.score for l in gl],
                                       [l.score for l in wl], rtol=0,
                                       atol=1e-4)


def test_segment_capacity_never_overflows():
    # count must stay within max_segments even for pathological inputs
    spec, lp, n_frames = _random_case(99, B=3, T=33, P=2, S=3)
    hist = phnloop.viterbi_scan_batch(spec, lp)
    segs = phnloop.backtrack_device(spec, hist, jnp.asarray(n_frames))
    assert int(np.max(np.asarray(segs.count))) <= phnloop.max_segments(
        spec, lp.shape[1])
