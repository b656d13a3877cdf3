import os
import re

import numpy as np
import pytest

from phnrec_tpu.io import htk
from phnrec_tpu.io.audio import ALAW_TABLE_D5, convert_waveform
from phnrec_tpu.io.labels import Label, MLFWriter, format_rec_line, read_mlf, read_rec
from phnrec_tpu.io.weights import (MLPParams, load_nbin, load_net, save_nbin,
                                   load_phoneme_list)
from phnrec_tpu.utils.filename import (change_file_path, change_file_suffix,
                                       cut_off_file_suffix)

from conftest import golden, package_dir


def test_htk_roundtrip(tmp_path):
    mat = np.random.default_rng(0).normal(size=(17, 15)).astype(np.float32)
    p = str(tmp_path / "x.fea")
    htk.write_htk(p, mat)
    back, period, kind = htk.read_htk(p)
    np.testing.assert_array_equal(mat, back)
    assert period == 100000


def test_golden_par_header():
    mat, period, kind = htk.read_htk(golden("fix_cz.par"))
    assert mat.shape == (747, 15)
    assert period == 100000


def test_alaw_table_matches_reference_source(reference_dir):
    """Our derivation of the A-law decode table must equal the hardcoded
    table in alaw.cpp:14-48."""
    src = open(os.path.join(reference_dir, "alaw.cpp")).read()
    start = src.index("{", src.index("ALawTableD5"))
    body = src[start + 1 : src.index("}", start)]
    vals = [int(v) for v in re.findall(r"-?\d+", body)]
    assert len(vals) == 256
    np.testing.assert_array_equal(ALAW_TABLE_D5, np.array(vals, np.int16))


def test_convert_waveform_lin16_short_pads_to_200():
    raw = np.arange(10, dtype="<i2").tobytes()
    wave, n = convert_waveform(raw, "lin16")
    assert n == 10 and len(wave) == 200
    assert wave[9] == 9.0 and wave[10:].sum() == 0


def test_convert_waveform_alaw_scale():
    raw = bytes([0x55, 0xD5])  # +-1 codes
    wave, n = convert_waveform(raw, "alaw")
    assert n == 2
    assert wave[0] == 8.0 * ALAW_TABLE_D5[0x55]


def test_nbin_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    p = MLPParams(
        w1=rng.normal(size=(7, 5)).astype(np.float32),
        b1=rng.normal(size=7).astype(np.float32),
        w2=rng.normal(size=(3, 7)).astype(np.float32),
        b2=rng.normal(size=3).astype(np.float32),
        mean=rng.normal(size=5).astype(np.float32),
        dev=rng.normal(size=5).astype(np.float32),
    )
    path = str(tmp_path / "net.nbin")
    save_nbin(path, p)
    q = load_nbin(path)
    for a, b in zip(
        (p.w1, p.b1, p.w2, p.b2, p.mean, p.dev),
        (q.w1, q.b1, q.w2, q.b2, q.mean, q.dev),
    ):
        np.testing.assert_array_equal(a, b)


def test_load_package_nbin():
    p = load_net(os.path.join(package_dir("cz"), "weights", "band0.weights"))
    assert (p.n_inp, p.n_hid, p.n_out) == (165, 1500, 138)
    m = load_net(os.path.join(package_dir("ru"), "weights", "merger.weights"))
    assert (m.n_inp, m.n_hid, m.n_out) == (318, 1400, 159)


def test_phoneme_lists():
    for lang, n in (("en", 39), ("cz", 45), ("hu", 61), ("ru", 52)):
        phns = load_phoneme_list(
            os.path.join(package_dir(lang), "dicts", "phonemes"))
        assert len(phns) == n, lang


def test_label_formatting():
    assert format_rec_line(Label(0, 69, "spk", -71.2)) == \
        "000000 6900000 spk -71.200000"
    assert format_rec_line(Label(0, 69, "spk", -71.2), mlf_style=True) == \
        "0 6900000 spk -71.200000"


def test_mlf_roundtrip(tmp_path):
    p = str(tmp_path / "out.mlf")
    with MLFWriter(p) as w:
        w.add("*/a.rec", [Label(0, 5, "x", 1.0), Label(5, 9, "y", -2.0)])
    d = read_mlf(p)
    assert list(d) == ["*/a.rec"]
    assert [l.name for l in d["*/a.rec"]] == ["x", "y"]


def test_read_rec_golden():
    labs = read_rec(golden("fix_cz.rec"))
    assert labs[0].name == "spk" and labs[0].start_frames == 0
    assert labs[-1].end_frames == 747


def test_filename_munging():
    assert change_file_suffix("a/b.wav", "rec") == "a/b.rec"
    assert change_file_suffix("a.d/b", "rec") == "a.d/b.rec"
    assert change_file_path("x/y/z.rec", "*") == "*/z.rec"
    assert cut_off_file_suffix("a/b.wav") == "a/b"
