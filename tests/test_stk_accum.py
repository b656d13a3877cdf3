"""STK binary accumulator interchange: write -> read must round-trip the
training statistics (Models.cc WriteAccums/ReadAccums layout) and an
update from re-read accumulators must equal the in-memory update."""

import numpy as np
import pytest

from phnrec_tpu.io.mmf import parse_mmf
from phnrec_tpu.train import (accumulate_utterance, compile_transcription,
                              make_accumulators, update_ml)
from phnrec_tpu.train.graph import build_model_index
from phnrec_tpu.train.stk_accum import read_stk_accums, write_stk_accums

from tests.test_train import MMF_GMM


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    p = tmp_path_factory.mktemp("mmf") / "models.mmf"
    p.write_text(MMF_GMM)
    models = parse_mmf(str(p))
    g = compile_transcription(models, ["a", "b"])
    rng = np.random.default_rng(0)
    acc = make_accumulators(g.index)
    for _ in range(3):
        T = int(rng.integers(6, 12))
        x = rng.normal(0, 1.5, (T, 2)).astype(np.float32)
        acc = accumulate_utterance(g, acc, x, T)
    return models, g.index, acc


def _np_acc(acc):
    return {k: (None if v is None else np.asarray(v))
            for k, v in zip(acc._fields, acc)}


def test_roundtrip(tmp_path, setup):
    models, index, acc = setup
    p = str(tmp_path / "a.acc")
    write_stk_accums(p, models, index, acc)
    back, tot_frames, tot_ll = read_stk_accums(p, models, index)
    a, b = _np_acc(acc), _np_acc(back)
    assert tot_frames == int(round(float(a["n_frames"])))
    assert tot_ll == pytest.approx(float(a["total_log_like"]), rel=1e-6)
    np.testing.assert_allclose(b["occ"], a["occ"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b["sum_x"], a["sum_x"], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(b["sum_xx"], a["sum_xx"], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(b["trans"], a["trans"], rtol=1e-4,
                               atol=1e-6)


def test_update_from_file_equals_in_memory(tmp_path, setup):
    models, index, acc = setup
    p = str(tmp_path / "a.acc")
    write_stk_accums(p, models, index, acc)
    back, _, _ = read_stk_accums(p, models, index)
    old_transp = [models.hmms[n].log_transp for n in index.names]
    u_mem = update_ml(index, acc, old_transp)
    u_file = update_ml(index, back, old_transp)
    for fld in ("weights", "means", "variances", "occ"):
        np.testing.assert_allclose(
            np.asarray(getattr(u_file, fld)),
            np.asarray(getattr(u_mem, fld)), rtol=1e-4, atol=1e-5,
            err_msg=fld)
    for tm, tf in zip(u_mem.log_transp, u_file.log_transp):
        np.testing.assert_allclose(np.asarray(tf), np.asarray(tm),
                                   rtol=1e-4, atol=1e-4)


def test_weight_scaling_and_merge(tmp_path, setup):
    """Reading with weight w scales statistics (ReadAccums' faddfloat
    mul_const); reading the same file twice sums (parallel-job merge)."""
    models, index, acc = setup
    p = str(tmp_path / "a.acc")
    write_stk_accums(p, models, index, acc)
    half, _, _ = read_stk_accums(p, models, index, weight=0.5)
    full, _, _ = read_stk_accums(p, models, index, weight=1.0)
    np.testing.assert_allclose(2.0 * np.asarray(half.occ),
                               np.asarray(full.occ), rtol=1e-6)
    np.testing.assert_allclose(2.0 * np.asarray(half.trans),
                               np.asarray(full.trans), rtol=1e-5)


def test_skips_unknown_macro_blocks(tmp_path, setup):
    """Blocks for macros missing from the model set are skipped, exactly
    as ReadAccums scans to the next header."""
    models, index, acc = setup
    p = str(tmp_path / "a.acc")
    write_stk_accums(p, models, index, acc)
    data = open(p, "rb").read()
    # splice an unknown ~t macro block between header and first ~h
    splice = b'~t "ghost"' + (0).to_bytes(4, "little") + b"\x00" * 8
    head, rest = data[:8], data[8:]
    p2 = str(tmp_path / "b.acc")
    open(p2, "wb").write(head + splice + rest)
    back, _, _ = read_stk_accums(p2, models, index)
    np.testing.assert_allclose(np.asarray(back.occ), np.asarray(acc.occ),
                               rtol=1e-5, atol=1e-6)
