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


@pytest.fixture(scope="module")
def vadalize_bin(oracle_bin):
    """Build the vadalize variant (phndecalize.o in place of phndec.o,
    makefile.lin:64-84)."""
    exe = os.path.join(ORACLE_DIR, "vadalize")
    if not os.path.exists(exe):
        src = os.path.join(ORACLE_DIR, "vadalize_fixed.cpp")
        if not os.path.exists(src):
            with open(os.path.join(ORACLE_DIR, "vadalize.cpp")) as f:
                code = f.read()
            with open(src, "w") as f:
                f.write(code.replace('#include "getopt.h"',
                                     "#include <unistd.h>"))
        srcs = ("melbanks.cpp dspc.cpp traps.cpp nn.cpp configz.cpp "
                "alaw.cpp lwfsource.cpp srec.cpp filename.cpp norm.cpp "
                "decoder.cpp phndecalize.cpp vadalize_fixed.cpp "
                "sxmlparser.cpp").split()
        try:
            subprocess.run(
                ["g++", "-o", exe, "-I", ".", "-fpermissive",
                 "-Wno-narrowing", "-D", "NN_FAST_EXP", "-D", "PHNREC_ONLY",
                 "-O2", *srcs, "-lpthread"],
                cwd=ORACLE_DIR, check=True, capture_output=True, timeout=300)
        except Exception:
            pytest.skip("vadalize oracle build failed")
    return exe


def test_vadalize_matches_oracle(vadalize_bin, tmp_path):
    """Our ALIZE VAD lines must byte-match the reference vadalize."""
    out = tmp_path / "oracle_vad.txt"
    subprocess.run([vadalize_bin, "-c", CZ, "-i",
                    "/root/reference/test.raw", "-o", str(out)],
                   check=True, capture_output=True, timeout=300)
    want = out.read_text().splitlines()

    from phnrec_tpu.pipeline import SpeechRec
    from phnrec_tpu.vad import labels_to_alize
    sr = SpeechRec(CZ)
    res = sr.process_offline(
        "wf", "str", open("/root/reference/test.raw", "rb").read())
    got = labels_to_alize(res.labels)
    assert got == want
