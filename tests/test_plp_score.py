"""PLP frontend parity (vs. the standalone reference dump) and the
HResults-style scorer."""

import numpy as np
import jax.numpy as jnp
import pytest

from phnrec_tpu.frontend.melbanks import MelSpec
from phnrec_tpu.frontend.plp import PLPFrontend
from phnrec_tpu.io.audio import convert_waveform
from phnrec_tpu.score import Scorer, align, score_mlf

from conftest import golden


@pytest.mark.parametrize("name,spec,fixture", [
    ("8k", MelSpec(8000, 200, 80, 15, -1, 64.0, 4000.0), "fix_plp_8k.txt"),
    ("16k", MelSpec(16000, 400, 160, 23, -1, 0.0, 8000.0),
     "fix_plp_16k.txt"),
])
def test_plp_parity(name, spec, fixture):
    fe = PLPFrontend(spec, add_c0=True)
    raw = open("/root/reference/test.raw", "rb").read()
    wave, _ = convert_waveform(raw, "lin16")
    T = fe.frame_count(len(wave))
    out = np.asarray(fe(jnp.asarray(wave), T))
    gold = np.loadtxt(golden(fixture), dtype=np.float32)
    assert out.shape == gold.shape
    # Durbin's divisions amplify f32 noise on near-zero coefficients;
    # absolute agreement is what matters at the x10 cepstral scale.
    np.testing.assert_allclose(out, gold, atol=2e-3)


def test_align_counts():
    counts, pairs = align(list("abcd"), list("abxd"))
    assert (counts.hits, counts.subs, counts.dels, counts.ins) == (3, 1, 0, 0)
    counts, _ = align(list("abcd"), list("abd"))
    assert counts.dels == 1 and counts.hits == 3
    counts, _ = align(list("abd"), list("abcd"))
    assert counts.ins == 1
    assert counts.accuracy == pytest.approx(100.0 * 2 / 3)


def test_scorer_summary():
    s = Scorer()
    s.add(list("abc"), list("abc"))
    s.add(list("abc"), list("axc"))
    out = s.summary()
    assert "SENT: %Correct=50.00" in out
    assert "H=5, D=0, S=1, I=0, N=6" in out


def test_score_mlf(tmp_path):
    ref = tmp_path / "ref.mlf"
    hyp = tmp_path / "hyp.mlf"
    ref.write_text('#!MLF!#\n"*/u1.rec"\n0 100000 a 0\n100000 200000 b 0\n.\n')
    hyp.write_text('#!MLF!#\n"*/u1.rec"\n0 100000 a 0\n100000 200000 c 0\n.\n')
    s = score_mlf(str(ref), str(hyp))
    assert s.total.hits == 1 and s.total.subs == 1
