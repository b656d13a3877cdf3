"""Tests for auxiliary subsystems: prefetch loader, indexed MLF reader,
imagesc debug dumper, stage profiler."""

import os

import numpy as np
import pytest

from phnrec_tpu.io.labels import Label, MLFIndex, MLFWriter, read_mlf
from phnrec_tpu.parallel.loader import PrefetchLoader
from phnrec_tpu.utils.imagesc import imagesc
from phnrec_tpu.utils.profiling import StageTimer


def _write_raw(path, n_samples, seed):
    rng = np.random.default_rng(seed)
    sig = (rng.standard_normal(n_samples) * 1000).astype("<i2")
    with open(path, "wb") as f:
        f.write(sig.tobytes())
    return sig


class TestPrefetchLoader:
    def test_batches_cover_all_sources_in_order_buckets(self, tmp_path):
        sizes = [300, 5000, 310, 4900, 9000, 250]
        paths = []
        for i, n in enumerate(sizes):
            p = tmp_path / f"u{i}.raw"
            _write_raw(p, n, i)
            paths.append(str(p))
        loader = PrefetchLoader(paths, max_batch=2, granularity=512,
                                n_workers=3, prefetch=1)
        seen = {}
        for batch in loader:
            assert batch.wave.shape[0] == len(batch.indices) <= 2
            assert batch.wave.shape[1] % 512 == 0
            for k, i in enumerate(batch.indices):
                seen[i] = (batch.sources[k],
                           batch.wave[k], int(batch.n_samples[k]))
        assert sorted(seen) == list(range(len(sizes)))
        # content parity with a direct load
        from phnrec_tpu.io.audio import convert_waveform
        for i, p in enumerate(paths):
            w, n = convert_waveform(open(p, "rb").read(), "lin16")
            src, wave_row, n_samp = seen[i]
            assert src == p
            assert n_samp == w.shape[0]
            np.testing.assert_array_equal(wave_row[: w.shape[0]], w)
            assert np.all(wave_row[w.shape[0]:] == 0.0)

    def test_error_propagates(self, tmp_path):
        p = tmp_path / "ok.raw"
        _write_raw(p, 400, 0)
        loader = PrefetchLoader([str(p), str(tmp_path / "missing.raw")],
                                n_workers=2)
        with pytest.raises(FileNotFoundError):
            list(loader)


class TestMLFIndex:
    def test_random_access_matches_full_read(self, tmp_path):
        mlf = str(tmp_path / "x.mlf")
        with MLFWriter(mlf) as w:
            w.add("*/utt1.rec", [Label(0, 10, "a", -1.0),
                                 Label(10, 20, "b", -2.0)])
            w.add("*/utt2.rec", [Label(0, 5, "c", -0.5)])
            w.add("dir/utt3.rec", [Label(0, 7, "d", -0.25)])
        idx = MLFIndex(mlf)
        full = read_mlf(mlf)
        assert len(idx) == 3
        for name in idx.names():
            assert idx.get(name) == full[name]
        # wildcard + stem resolution
        assert idx.get("any/path/utt1.rec") == full["*/utt1.rec"]
        assert "utt2" in idx
        assert idx.get("utt3.rec") == full["dir/utt3.rec"]
        with pytest.raises(KeyError):
            idx.get("nope.rec")


class TestImagesc:
    def test_shapes_and_range(self):
        a = np.outer(np.arange(10), np.arange(20)).astype(float)
        s = imagesc(a, title="t")
        lines = s.splitlines()
        assert lines[0].startswith("-- t")
        assert len(lines) == 11 and all(len(l) == 20 for l in lines[1:])
        assert lines[1][0] == " " and lines[-1][-1] == "@"

    def test_pooling_caps_size(self):
        a = np.random.default_rng(0).random((400, 600))
        s = imagesc(a, max_rows=30, max_cols=80)
        lines = s.splitlines()
        assert len(lines) <= 30 and max(len(l) for l in lines) <= 80

    def test_transform_and_color(self):
        a = np.abs(np.random.default_rng(1).random((4, 4))) + 1e-3
        s = imagesc(a, transform=np.log, color=True)
        assert "\x1b[48;5;" in s and s.endswith("\x1b[0m")


class TestStageTimer:
    def test_accumulates_and_summarizes(self):
        t = StageTimer(enabled=True)
        with t.stage("mel"):
            pass
        with t.stage("mel"):
            pass
        with t.stage("viterbi"):
            pass
        assert t.stats["mel"].calls == 2
        assert t.stats["viterbi"].calls == 1
        summary = t.summary()
        assert "mel" in summary and "viterbi" in summary
        t.reset()
        assert not t.stats

    def test_disabled_is_noop(self):
        t = StageTimer(enabled=False)
        with t.stage("x"):
            pass
        assert not t.stats
