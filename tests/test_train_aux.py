"""Auxiliary training machinery: MMF writer roundtrip, accumulator
persistence/merging, sMBR (MPE-type) accumulation, pipe/filter I/O."""

import os

import numpy as np
import pytest

from phnrec_tpu.io.mmf import parse_mmf, write_mmf
from phnrec_tpu.train import (accumulate_utterance, accumulate_utterance_mbr,
                              apply_update, compile_transcription,
                              load_accumulators, make_accumulators,
                              merge_accumulators, reference_hmm_ids,
                              save_accumulators, update_mmi, viterbi_align)
from phnrec_tpu.train.fb import log_obs, make_obs_tables
from phnrec_tpu.utils.stkio import expand_filter_command, open_stream
from tests.test_train import MMF_GMM


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    p = tmp_path_factory.mktemp("aux") / "m.mmf"
    p.write_text(MMF_GMM)
    return parse_mmf(str(p))


def test_mmf_writer_roundtrip(models, tmp_path):
    p = str(tmp_path / "rt.mmf")
    write_mmf(models, p)
    back = parse_mmf(p)
    for name in models.hmms:
        a, b = models.hmms[name], back.hmms[name]
        assert a.n_states == b.n_states
        assert np.allclose(a.log_transp, b.log_transp, atol=1e-5)
        for ga, gb in zip(a.gmm_states, b.gmm_states):
            if ga is None:
                assert gb is None
                continue
            assert np.allclose(ga.means, gb.means, atol=1e-5)
            assert np.allclose(ga.variances, gb.variances, atol=1e-5)
            assert np.allclose(ga.weights, gb.weights, atol=1e-5)


def test_mmf_writer_pdfobsvec_roundtrip(tmp_path):
    from tests.test_train import test_pdfobsvec_training_graph  # noqa: F401
    text = """~o <VecSize> 6 <PDFObsVec>
~h "p0"
<BeginHMM>
<NumStates> 3
<State> 2 <ObsCoef> 1
<TransP> 3
0.0 1.0 0.0
0.0 0.5 0.5
0.0 0.0 0.0
<EndHMM>
"""
    p = str(tmp_path / "p.mmf")
    open(p, "w").write(text)
    ms = parse_mmf(p)
    p2 = str(tmp_path / "p2.mmf")
    write_mmf(ms, p2)
    back = parse_mmf(p2)
    assert back.pdf_obs_vec
    assert back.hmms["p0"].obs_coefs[0] == 0


def test_accumulator_save_load_merge(models, tmp_path):
    g = compile_transcription(models, ["a", "b"])
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 2)).astype(np.float32)
    acc = accumulate_utterance(g, make_accumulators(g.index), x, 8)
    p = str(tmp_path / "acc.npz")
    save_accumulators(acc, p)
    back = load_accumulators(p)
    for a, b in zip(acc, back):
        if a is None:
            assert b is None
        else:
            assert np.allclose(np.asarray(a), np.asarray(b))
    merged = merge_accumulators(back, back)
    assert np.isclose(float(np.asarray(merged.n_frames)), 16.0)


def test_smbr_accumulation_and_ebw(models):
    """sMBR stats: kappa sums to ~0 per frame, num/den split feeds EBW."""
    den = compile_transcription(models, ["a", "b"])     # stand-in lattice
    num = compile_transcription(models, ["a", "b"])
    rng = np.random.default_rng(1)
    x = rng.normal(size=(10, 2)).astype(np.float32)
    tables = make_obs_tables(num)
    log_b, _ = log_obs(tables, x)
    al = viterbi_align(num.log_A, num.log_entry, num.log_exit,
                       np.asarray(log_b), 10)
    ref = reference_hmm_ids(num, al.states)
    assert ref.shape == (10,) and set(ref.tolist()) <= {0, 1}

    acc_n, acc_d = accumulate_utterance_mbr(
        den, make_accumulators(den.index), make_accumulators(den.index),
        x, ref, 10)
    occ_n = np.asarray(acc_n.occ)
    occ_d = np.asarray(acc_d.occ)
    # positive and negative kappa mass balance (sum_s kappa_t(s) = 0)
    assert np.isclose(occ_n.sum(), occ_d.sum(), atol=1e-3)
    assert occ_n.sum() > 0                      # nonzero gradient signal
    old_transp = [models.hmms[n].log_transp for n in den.index.names]
    upd = update_mmi(den.index, acc_n, acc_d, old_transp, E=2.0)
    assert np.all(upd.variances > 0)
    m2 = apply_update(models, den.index, upd, min_occ=0.0,
                      update=frozenset("mv"))
    assert not np.allclose(m2.hmms["a"].gmm_states[0].means,
                           models.hmms["a"].gmm_states[0].means)


def test_stkio_pipe_and_filter(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("hello\n")
    assert expand_filter_command("gunzip -c $", "f.gz") == "gunzip -c f.gz"
    with open_stream(f"|cat {p}", "r") as f:
        assert f.read() == "hello\n"
    with open_stream(str(p), "r", filter_cmd="cat $") as f:
        assert f.read() == "hello\n"
    out = tmp_path / "y.txt"
    with open_stream(f"|cat > {out}", "w") as f:
        f.write("world\n")
    assert out.read_text() == "world\n"
    with open_stream(str(p), "r") as f:          # plain file fallback
        assert f.read() == "hello\n"
