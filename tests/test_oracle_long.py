"""Long / adverse-audio accuracy against the reference C++ binary.

The golden fixtures cover one 7.5 s utterance per package; this builds
the reference decoder (tools/build_oracle.sh, lean PHNREC_ONLY build,
NN_FAST_EXP) and compares whole decodes of a ~70 s adverse concatenation
— speech, silence, attenuated speech, reversed speech, loud speech —
through the CZ package (sentence mean norm active over the whole
utterance, the hardest case for accumulated float drift).
"""

import os
import subprocess

import numpy as np
import pytest

ORACLE_DIR = "/tmp/phnrec_oracle"
CZ = "/root/reference/PHN_CZ_SPDAT_LCRC_N1500"


@pytest.fixture(scope="module")
def oracle_bin():
    exe = os.path.join(ORACLE_DIR, "phnrec")
    if not os.path.exists(exe):
        script = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "build_oracle.sh")
        try:
            subprocess.run(["bash", script, ORACLE_DIR], check=True,
                           capture_output=True, timeout=300)
        except Exception:
            pytest.skip("reference oracle build failed")
    if not os.path.exists(exe):
        pytest.skip("reference oracle unavailable")
    return exe


def _adverse_audio() -> np.ndarray:
    src = np.frombuffer(open("/root/reference/test.raw", "rb").read(),
                        np.int16)
    silence = np.zeros(2 * 8000, np.int16)
    quiet = (src.astype(np.int32) * 3 // 10).astype(np.int16)
    loud = np.clip(src.astype(np.int32) * 3, -32768, 32767).astype(np.int16)
    return np.concatenate([
        src, silence, quiet, src[::-1].copy(), silence, loud,
        src, quiet[::-1].copy(), src,
    ])


def test_long_adverse_decode_matches_oracle(oracle_bin, tmp_path):
    sig = _adverse_audio()
    raw = tmp_path / "adverse.raw"
    sig.tofile(raw)

    out = tmp_path / "oracle.rec"
    subprocess.run([oracle_bin, "-c", CZ, "-i", str(raw), "-o", str(out)],
                   check=True, capture_output=True, timeout=300)
    from phnrec_tpu.io.labels import read_rec
    want = read_rec(str(out))
    assert len(want) > 50, "oracle produced implausibly few segments"

    from phnrec_tpu.pipeline import SpeechRec
    sr = SpeechRec(CZ)
    got = sr.process_offline("wf", "str", open(raw, "rb").read())

    assert [(l.start_frames, l.end_frames, l.name) for l in got.labels] == \
        [(w.start_frames, w.end_frames, w.name) for w in want]
    np.testing.assert_allclose([l.score for l in got.labels],
                               [w.score for w in want], atol=2e-2)
