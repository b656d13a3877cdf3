import pytest

from phnrec_tpu.config import ConfigError, PhnRecConfig

from conftest import package_dir


def test_defaults():
    cfg = PhnRecConfig()
    assert cfg.get_str("source", "format") == "lin16"
    assert cfg.get_int("source", "sample_freq") == 8000
    assert cfg.get_int("decoder", "time_pruning") == 40
    assert cfg.get_float("decoder", "wpenalty") == -2.0
    assert cfg.get_bool("posteriors", "add_c0") is True
    # declared string, read as int (reference quirk, srec.cpp:74,620)
    assert cfg.get_int("posteriors", "bunch_size") == 1


def test_load_all_packages():
    for lang in ("en", "cz", "hu", "ru", "es"):
        cfg = PhnRecConfig.load_package(package_dir(lang))
        assert cfg.get_str("posteriors", "system") == "LCRC"
        assert cfg.get_str("decoder", "type") == "phndec"
        # $C macro expanded
        assert cfg.get_str("dicts", "phoneme_list").startswith(
            package_dir(lang))


def test_cz_values():
    cfg = PhnRecConfig.load_package(package_dir("cz"))
    assert cfg.get_int("melbanks", "nbanks") == 15
    assert cfg.get_float("melbanks", "lower_freq") == 64
    assert cfg.get_float("decoder", "wpenalty") == -4.6875
    assert cfg.get_bool("offlinenorm", "sent_mean_norm") is True
    assert cfg.get_int("posteriors", "bunch_size") == 5


def test_unknown_variable_rejected(tmp_path):
    p = tmp_path / "config"
    p.write_text("[source]\nbogus=1\n")
    cfg = PhnRecConfig()
    with pytest.raises(ConfigError):
        cfg.load(str(p))


def test_bad_value_rejected(tmp_path):
    p = tmp_path / "config"
    p.write_text("[source]\nsample_freq=abc\n")
    cfg = PhnRecConfig()
    with pytest.raises(ConfigError):
        cfg.load(str(p))


def test_inline_comment_and_no_trim(tmp_path):
    p = tmp_path / "config"
    p.write_text("[source]\nformat=alaw#comment\n")
    cfg = PhnRecConfig()
    cfg.load(str(p))
    assert cfg.get_str("source", "format") == "alaw"
