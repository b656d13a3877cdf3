"""Training/re-estimation tests: forward-backward exactness (brute force),
Baum-Welch likelihood ascent, Viterbi alignment, accumulator consistency,
MMI/EBW sanity, MCE weighting (STKLib/Viterbi.cc:1124-2330 semantics)."""

import itertools

import numpy as np
import pytest

from phnrec_tpu.io.mmf import parse_mmf
from phnrec_tpu.train import (accumulate_utterance, apply_update,
                              compile_transcription, forward_backward,
                              make_accumulators, mce_weight,
                              merge_accumulators, update_ml, update_mmi,
                              viterbi_align)
from phnrec_tpu.train.fb import log_obs, make_obs_tables
from phnrec_tpu.train.graph import build_model_index

MMF_GMM = """~o <VecSize> 2 <DIAGC>
~h "a"
<BeginHMM>
<NumStates> 4
<State> 2 <NumMixes> 2
<Mixture> 1 0.6 <Mean> 2 0.0 0.0 <Variance> 2 1.0 1.0
<Mixture> 2 0.4 <Mean> 2 1.5 1.5 <Variance> 2 1.0 1.0
<State> 3
<Mean> 2 3.0 3.0 <Variance> 2 1.0 1.0
<TransP> 4
0.0 1.0 0.0 0.0
0.0 0.6 0.4 0.0
0.0 0.0 0.7 0.3
0.0 0.0 0.0 0.0
<EndHMM>
~h "b"
<BeginHMM>
<NumStates> 3
<State> 2
<Mean> 2 -2.0 -2.0 <Variance> 2 1.0 1.0
<TransP> 3
0.0 1.0 0.0
0.0 0.5 0.5
0.0 0.0 0.0
<EndHMM>
"""


@pytest.fixture(scope="module")
def gmm_models(tmp_path_factory):
    p = tmp_path_factory.mktemp("mmf") / "models.mmf"
    p.write_text(MMF_GMM)
    return parse_mmf(str(p))


def brute_force_loglike(graph, log_b):
    """Enumerate every state path (tiny graphs only)."""
    T, S = log_b.shape
    A = graph.log_A
    total = -np.inf
    for path in itertools.product(range(S), repeat=T):
        sc = graph.log_entry[path[0]] + log_b[0, path[0]]
        for t in range(1, T):
            sc += A[path[t - 1], path[t]] + log_b[t, path[t]]
        sc += graph.log_exit[path[-1]]
        total = np.logaddexp(total, sc)
    return total


def test_graph_shapes(gmm_models):
    g = compile_transcription(gmm_models, ["a", "b", "a"])
    assert g.n_states == 2 + 1 + 2
    # entry only into first instance's first state; exit only from last
    assert (g.log_entry > -1e9).sum() == 1
    assert (g.log_exit > -1e9).sum() == 1
    # cross-HMM edge a->b exists: state 1 (exit of a) -> state 2 (b)
    assert g.log_A[1, 2] > -1e9


def test_forward_backward_matches_brute_force(gmm_models):
    g = compile_transcription(gmm_models, ["a", "b"])
    rng = np.random.default_rng(0)
    T = 5
    x = rng.normal(size=(T, 2)).astype(np.float32)
    tables = make_obs_tables(g)
    log_b, _ = log_obs(tables, x)
    fb = forward_backward(g.log_A, g.log_entry, g.log_exit, log_b, T)
    ref = brute_force_loglike(g, np.asarray(log_b))
    assert np.isclose(float(fb.log_like), ref, atol=1e-4)
    # gamma rows sum to 1 on valid frames
    gamma = np.exp(np.asarray(fb.log_alpha + fb.log_beta - fb.log_like))
    assert np.allclose(gamma.sum(axis=1), 1.0, atol=1e-4)


def test_forward_backward_padding_invariance(gmm_models):
    g = compile_transcription(gmm_models, ["a"])
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 2)).astype(np.float32)
    tables = make_obs_tables(g)
    log_b, _ = log_obs(tables, x)
    fb4 = forward_backward(g.log_A, g.log_entry, g.log_exit, log_b, 4)
    xp = np.concatenate([x, np.zeros((3, 2), np.float32)])
    log_bp, _ = log_obs(tables, xp)
    fbp = forward_backward(g.log_A, g.log_entry, g.log_exit, log_bp, 4)
    assert np.isclose(float(fb4.log_like), float(fbp.log_like), atol=1e-5)
    assert np.allclose(np.asarray(fb4.log_alpha),
                       np.asarray(fbp.log_alpha)[:4], atol=1e-5)


def test_viterbi_align_monotone_and_bounded(gmm_models):
    g = compile_transcription(gmm_models, ["a", "b"])
    rng = np.random.default_rng(2)
    T = 8
    x = rng.normal(size=(T, 2)).astype(np.float32)
    tables = make_obs_tables(g)
    log_b, _ = log_obs(tables, x)
    al = viterbi_align(g.log_A, g.log_entry, g.log_exit, log_b, T)
    fb = forward_backward(g.log_A, g.log_entry, g.log_exit, log_b, T)
    states = np.asarray(al.states)
    assert states[0] == 0                       # must start in a's state 1
    assert states[-1] == 2                      # must end in b's only state
    assert np.all(np.diff(states) >= 0)         # left-to-right
    assert float(al.log_like) <= float(fb.log_like) + 1e-5
    # path score is attainable -> brute-force max equals it
    best = -np.inf
    A = g.log_A
    lb = np.asarray(log_b)
    for path in itertools.product(range(g.n_states), repeat=T):
        sc = g.log_entry[path[0]] + lb[0, path[0]]
        for t in range(1, T):
            sc += A[path[t - 1], path[t]] + lb[t, path[t]]
        sc += g.log_exit[path[-1]]
        best = max(best, sc)
    assert np.isclose(float(al.log_like), best, atol=1e-4)


def sample_data(rng, n_utts, T):
    """Draw from HMM 'a' then 'b' roughly (just separated clusters)."""
    xs = []
    for _ in range(n_utts):
        t1 = T // 2
        a = rng.normal(size=(t1, 2)) + np.array([0.5, 0.5])
        b = rng.normal(size=(T - t1, 2)) + np.array([-2.0, -2.0])
        xs.append(np.concatenate([a, b]).astype(np.float32))
    return xs


def bw_iteration(models, index, xs, transcription, mode="baum_welch"):
    acc = make_accumulators(index)
    for x in xs:
        g = compile_transcription(models, transcription, index)
        acc = accumulate_utterance(g, acc, x, x.shape[0], mode=mode)
    old_transp = [models.hmms[n].log_transp for n in index.names]
    upd = update_ml(index, acc, old_transp)
    return apply_update(models, index, upd), float(
        np.asarray(acc.total_log_like))


def test_baum_welch_likelihood_ascends(gmm_models):
    rng = np.random.default_rng(3)
    xs = sample_data(rng, 4, 12)
    models = gmm_models
    index = build_model_index(models)
    lls = []
    for _ in range(4):
        models, ll = bw_iteration(models, index, xs, ["a", "b"])
        index = build_model_index(models)
        lls.append(ll)
    assert all(b >= a - 1e-3 for a, b in zip(lls, lls[1:])), lls
    assert lls[-1] > lls[0]


def test_viterbi_reest_runs_and_improves(gmm_models):
    rng = np.random.default_rng(4)
    xs = sample_data(rng, 4, 12)
    models = gmm_models
    index = build_model_index(models)
    m1, ll1 = bw_iteration(models, index, xs, ["a", "b"], mode="viterbi")
    index1 = build_model_index(m1)
    _, ll2 = bw_iteration(m1, index1, xs, ["a", "b"], mode="viterbi")
    assert ll2 >= ll1 - 1e-3


def test_accumulator_consistency(gmm_models):
    """State occupancies = sum over frames; trans counts of a row ~ state
    occupancy of that state (each visit exits somewhere)."""
    g = compile_transcription(gmm_models, ["a", "b"])
    index = g.index
    rng = np.random.default_rng(5)
    T = 10
    x = rng.normal(size=(T, 2)).astype(np.float32)
    acc = accumulate_utterance(g, make_accumulators(index), x, T)
    occ = np.asarray(acc.occ)
    assert np.isclose(occ.sum(), T, atol=1e-3)          # gammas sum to 1
    assert float(np.asarray(acc.n_frames)) == T
    trans = np.asarray(acc.trans)
    # every HMM's entry row sums to the times the HMM was entered >= ~1
    assert trans[0, 0].sum() > 0.99                     # 'a' entered once
    # row sums of emitting states equal their occupancy (every occupied
    # frame transitions somewhere, including the final exit).  The xi
    # single-GEMM formulation carries ~1e-3 relative f32 error vs the
    # per-frame log-domain sum, which is immaterial for the M-step ratios.
    a_state1_occ = occ[0].sum()
    assert np.isclose(trans[0, 1].sum(), a_state1_occ, rtol=3e-3)


def test_merge_and_weight(gmm_models):
    g = compile_transcription(gmm_models, ["a"])
    index = g.index
    rng = np.random.default_rng(6)
    x = rng.normal(size=(6, 2)).astype(np.float32)
    a1 = accumulate_utterance(g, make_accumulators(index), x, 6)
    a2 = accumulate_utterance(g, make_accumulators(index), x, 6,
                              weight=2.0)
    assert np.allclose(np.asarray(a2.occ), 2 * np.asarray(a1.occ),
                       atol=1e-4)
    m = merge_accumulators(a1, a1)
    assert np.allclose(np.asarray(m.occ), 2 * np.asarray(a1.occ),
                       atol=1e-6)


def test_mmi_update_sane(gmm_models):
    g = compile_transcription(gmm_models, ["a", "b"])
    index = g.index
    rng = np.random.default_rng(7)
    x = rng.normal(size=(10, 2)).astype(np.float32)
    num = accumulate_utterance(g, make_accumulators(index), x, 10)
    den = accumulate_utterance(g, make_accumulators(index), x, 10,
                               weight=0.5)
    old_transp = [gmm_models.hmms[n].log_transp for n in index.names]
    upd = update_mmi(index, num, den, old_transp)
    assert np.all(upd.variances > 0)
    assert np.all(np.isfinite(upd.means))
    w = upd.weights
    valid = index.gmm_weights > 0
    assert np.allclose(np.where(valid, w, 0).sum(axis=1), 1.0, atol=1e-4)


def test_mce_weight():
    # equal likes -> huge distance in favor of competitors -> weight ~ s/4
    s = 1.0
    w_close = mce_weight(-100.0, -99.9, s)      # competitors dominate? no:
    # TP=-100, P=-99.9 -> competitor mass ~ P - small; F small positive
    assert w_close > 0
    w_easy = mce_weight(-100.0, -99.999999, s)  # almost no competitors
    assert w_easy < w_close or w_easy == 0.0
    assert mce_weight(-50.0, -50.0, s) == 0.0   # no competing mass


def test_pdfobsvec_training_graph():
    """<PDFObsVec> model sets train too: log_obs is a posterior lookup."""
    mmf = """~o <VecSize> 6 <PDFObsVec>
~h "p0"
<BeginHMM>
<NumStates> 3
<State> 2 <ObsCoef> 1
<TransP> 3
0.0 1.0 0.0
0.0 0.5 0.5
0.0 0.0 0.0
<EndHMM>
~h "p1"
<BeginHMM>
<NumStates> 3
<State> 2 <ObsCoef> 2
<TransP> 3
0.0 1.0 0.0
0.0 0.5 0.5
0.0 0.0 0.0
<EndHMM>
"""
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.mmf")
        open(p, "w").write(mmf)
        models = parse_mmf(p)
    g = compile_transcription(models, ["p0", "p1"])
    T = 6
    lp = np.log(np.full((T, 6), 0.1, np.float32))
    lp[:3, 0] = np.log(0.9)
    lp[3:, 1] = np.log(0.9)
    tables = make_obs_tables(g)
    log_b, log_bm = log_obs(tables, lp)
    assert log_bm is None
    al = viterbi_align(g.log_A, g.log_entry, g.log_exit,
                       np.asarray(log_b), T)
    assert list(np.asarray(al.states)) == [0, 0, 0, 1, 1, 1]
    acc = accumulate_utterance(g, make_accumulators(g.index), lp, T)
    assert np.isclose(float(np.asarray(acc.occ).sum()), T, atol=1e-3)
    assert acc.sum_x is None
