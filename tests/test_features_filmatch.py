"""HTK feature toolbox (fileio.C equivalents: compression, ranges,
derivatives, CMN/CVN sidecars, param-kind codec) + filmatch patterns."""

import numpy as np
import pytest

from phnrec_tpu.io.features import (PARAMKIND_A, PARAMKIND_C, PARAMKIND_D,
                                    PARAMKIND_Z, parse_param_kind,
                                    param_kind_to_str, read_ceps_norm_file,
                                    read_features, write_ceps_norm_file,
                                    write_features)
from phnrec_tpu.utils.filmatch import fnmatch, is_pattern, match


def test_param_kind_codec_roundtrip():
    # emission follows STK's fixed qualifier bit order (ParmKind2Str,
    # common.C: E N D A C Z K 0 V T), so roundtrip via the code
    for s in ("MFCC", "MFCC_0_D_A", "FBANK_Z", "PLP_E_D_A_T", "USER_C"):
        code = parse_param_kind(s)
        assert parse_param_kind(param_kind_to_str(code)) == code
    assert param_kind_to_str(parse_param_kind("MFCC_0_D_A")) == "MFCC_D_A_0"
    assert parse_param_kind("MFCC_D") == 6 | PARAMKIND_D
    with pytest.raises(ValueError):
        parse_param_kind("BOGUS")
    with pytest.raises(ValueError):
        parse_param_kind("MFCC_X")


def test_compressed_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    mat = rng.normal(size=(50, 13)).astype(np.float32) * 7.0
    p = str(tmp_path / "c.fea")
    write_features(p, mat, param_kind=parse_param_kind("MFCC"),
                   compress=True)
    got, period, kind = read_features(p)
    assert period == 100000
    assert not (kind & PARAMKIND_C)          # stripped on read
    # int16 quantization: range/65534 resolution
    res = (mat.max(0) - mat.min(0)) / 65534.0
    assert np.all(np.abs(got - mat) <= res[None, :] + 1e-6)


def test_crc_qualifier_roundtrip(tmp_path):
    mat = np.arange(20, dtype=np.float32).reshape(5, 4)
    p = str(tmp_path / "k.fea")
    write_features(p, mat, compress=True, add_crc=True)
    got, _, kind = read_features(p)
    assert np.allclose(got, mat, atol=1e-3)


def test_frame_range_and_extension(tmp_path):
    mat = np.arange(40, dtype=np.float32).reshape(10, 4)
    p = str(tmp_path / "r.fea")
    write_features(p, mat)
    got, _, _ = read_features(p + "[2,5]")
    assert np.allclose(got, mat[2:6])
    # boundary extension replicates edge frames
    got, _, _ = read_features(p + "[0,2]", ext_left=2, ext_right=1)
    assert got.shape[0] == 6
    assert np.allclose(got[0], mat[0]) and np.allclose(got[1], mat[0])
    assert np.allclose(got[-1], mat[3])


def test_derivatives_match_regression_formula(tmp_path):
    rng = np.random.default_rng(1)
    mat = rng.normal(size=(12, 3)).astype(np.float32)
    p = str(tmp_path / "d.fea")
    write_features(p, mat)
    got, _, kind = read_features(p, deriv_order=2)
    assert got.shape == (12, 9)
    assert kind & PARAMKIND_D and kind & PARAMKIND_A
    # middle-frame delta: sum_k k*(x[t+k]-x[t-k]) / (2*sum k^2), win=2
    t = 5
    norm = 2 * (1 + 4)
    expect = (1 * (mat[t + 1] - mat[t - 1]) + 2 * (mat[t + 2] - mat[t - 2])
              ) / norm
    assert np.allclose(got[t, 3:6], expect, atol=1e-5)
    # boundary clamping at t=0: x[-k] -> x[0]
    expect0 = (1 * (mat[1] - mat[0]) + 2 * (mat[2] - mat[0])) / norm
    assert np.allclose(got[0, 3:6], expect0, atol=1e-5)


def test_sentence_cmn_and_sidecars(tmp_path):
    rng = np.random.default_rng(2)
    mat = rng.normal(size=(20, 4)).astype(np.float32) + 3.0
    p = str(tmp_path / "z.fea")
    write_features(p, mat, param_kind=parse_param_kind("FBANK"))
    got, _, kind = read_features(
        p, target_kind=parse_param_kind("FBANK_Z"))
    assert kind & PARAMKIND_Z
    assert np.allclose(got.mean(axis=0), 0.0, atol=1e-5)

    cmn = str(tmp_path / "cmn")
    write_ceps_norm_file(cmn, "mean", parse_param_kind("FBANK"),
                         [1.0, 2.0, 3.0, 4.0])
    got, _, _ = read_features(p, cmn_file=cmn)
    assert np.allclose(got, mat - np.array([1, 2, 3, 4]), atol=1e-5)

    cvn = str(tmp_path / "cvn")
    write_ceps_norm_file(cvn, "variance", parse_param_kind("FBANK_Z"),
                         [4.0, 4.0, 4.0, 4.0])
    got, _, _ = read_features(p, cmn_file=cmn, cvn_file=cvn)
    assert np.allclose(got, (mat - np.array([1, 2, 3, 4])) * 0.5, atol=1e-5)


def test_ceps_norm_kind_mismatch(tmp_path):
    cmn = str(tmp_path / "cmn")
    write_ceps_norm_file(cmn, "mean", parse_param_kind("MFCC"), [0.0])
    with pytest.raises(ValueError):
        read_ceps_norm_file(cmn, "mean", parse_param_kind("FBANK"), 1)


def test_filmatch_basics():
    assert fnmatch("*/abc.lab", "dir/sub/abc.lab")
    assert fnmatch("*.wav", "x.wav") and not fnmatch("*.wav", "x.rec")
    assert fnmatch("a?c", "abc") and not fnmatch("a?c", "abcd")
    assert is_pattern("a*b") and not is_pattern("plain.txt")


def test_filmatch_percent_extraction():
    # '%' matches one char each and the captures concatenate (HTK masks)
    assert match("%%%*", "spk1_utt7") == "spk"
    assert match("*_%%.lab", "a/b_42.lab") == "42"
    assert match("abc", "abc") == ""
    assert match("abc", "abd") is None


def test_filmatch_classes_non_htk():
    assert fnmatch("[a-c]x", "bx", htk_compatible=False)
    assert not fnmatch("[!a-c]x", "bx", htk_compatible=False)
    # HTK-compatible mode treats [ literally
    assert fnmatch("[a]", "[a]", htk_compatible=True)


def test_mlf_index_wildcard_entries(tmp_path):
    mlf = tmp_path / "x.mlf"
    mlf.write_text('#!MLF!#\n"*/utt%%.rec"\n0 100000 a -1.0\n.\n')
    from phnrec_tpu.io.labels import MLFIndex
    idx = MLFIndex(str(mlf))
    labels = idx.get("data/utt42.rec")
    assert len(labels) == 1 and labels[0].name == "a"
