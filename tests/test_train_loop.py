"""Bucketed/batched re-estimation loop: padded-graph vmap accumulation
must match the per-utterance reference path exactly."""

import numpy as np
import pytest

from phnrec_tpu.io.mmf import parse_mmf
from phnrec_tpu.train import (accumulate_utterance, apply_update,
                              compile_transcription, make_accumulators,
                              merge_accumulators, update_ml)
from phnrec_tpu.train.graph import build_model_index, pad_graph
from phnrec_tpu.train.loop import Reestimator
from tests.test_train import MMF_GMM


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    p = tmp_path_factory.mktemp("loop") / "m.mmf"
    p.write_text(MMF_GMM)
    return parse_mmf(str(p))


def test_pad_graph_zero_influence(models):
    """Padded states/edges contribute exactly nothing."""
    g = compile_transcription(models, ["a", "b"])
    gp = pad_graph(g, g.n_states + 5, len(g.e_src) + 7,
                   len(g.en_state) + 3, len(g.ex_state) + 3)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(9, 2)).astype(np.float32)
    a1 = accumulate_utterance(g, make_accumulators(g.index), x, 9)
    a2 = accumulate_utterance(gp, make_accumulators(g.index), x, 9)
    assert np.allclose(np.asarray(a1.occ), np.asarray(a2.occ), atol=1e-4)
    assert np.allclose(np.asarray(a1.trans), np.asarray(a2.trans),
                       atol=1e-4)
    assert np.isclose(float(a1.total_log_like), float(a2.total_log_like),
                      atol=1e-4)


def test_pad_graph_guard(models):
    g = compile_transcription(models, ["a"])
    with pytest.raises(ValueError):
        pad_graph(g, g.n_states, len(g.e_src) + 1)     # no pad state


@pytest.mark.parametrize("mode", ["baum_welch", "viterbi"])
def test_batched_loop_matches_sequential(models, mode):
    rng = np.random.default_rng(1)
    utts = []
    for i in range(5):
        T = 6 + 3 * i
        trans = ["a", "b"] if i % 2 == 0 else ["b", "a", "b"]
        utts.append((rng.normal(size=(T, 2)).astype(np.float32), trans))

    index = build_model_index(models)
    ref = make_accumulators(index)
    for x, trans in utts:
        g = compile_transcription(models, trans, index)
        ref = accumulate_utterance(g, ref, x, x.shape[0], mode=mode)

    re = Reestimator(models, mode=mode, batch_size=3)
    for x, trans in utts:
        re.add_utterance(x, trans)
    got = re.finish()

    assert np.allclose(np.asarray(got.occ), np.asarray(ref.occ),
                       rtol=2e-3, atol=1e-4)
    assert np.allclose(np.asarray(got.trans), np.asarray(ref.trans),
                       rtol=2e-3, atol=1e-4)
    if got.sum_x is not None:
        assert np.allclose(np.asarray(got.sum_x), np.asarray(ref.sum_x),
                           rtol=2e-3, atol=1e-4)
    assert np.isclose(float(np.asarray(got.total_log_like)),
                      float(np.asarray(ref.total_log_like)), rtol=1e-4)
    assert float(np.asarray(got.n_utts)) == 5.0
    # the whole loop feeds the standard update path
    upd = update_ml(index, got,
                    [models.hmms[n].log_transp for n in index.names])
    m2 = apply_update(models, index, upd)
    assert set(m2.hmms) == set(models.hmms)
