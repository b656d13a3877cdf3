"""phnrec_tpu — a TPU-native phoneme recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the BUT PhnRec phoneme recognizer
(reference: /root/reference, C++). The numeric pipeline

    waveform -> log mel-filterbank energies -> split-temporal-context (LCRC)
    feature assembly -> band MLPs + merger MLP -> per-frame phoneme-state
    posteriors -> phoneme-loop Viterbi -> time-stamped phoneme labels

is implemented as pure functions over [B, T, ...] tensors compiled with jit,
batched across utterances, and sharded data-parallel over a device mesh.
Model packages (config + dicts + weights + windows) shipped with the
reference load unchanged.

Layer map (mirrors SURVEY.md section 1):
  config.py              typed INI config        (ref configz.{cpp,h}, srec.cpp:34-110)
  io/                    HTK/label/weights I/O   (ref matrix.h, nn.cpp, traps.cpp)
  frontend/              mel-bank + PLP frontend (ref melbanks.cpp, dspc.cpp, plp.cpp)
  posteriors/            STC assembly + MLPs     (ref traps.cpp, nn.cpp, fexp.h)
  decoder/               Viterbi decoders        (ref phndec.cpp, stkinterface.cpp)
  pipeline.py            orchestration           (ref srec.cpp)
  parallel/              mesh/data-parallel runs (new; no reference analogue)
  cli.py                 phnrec CLI              (ref phnrec.cpp)
"""

__version__ = "0.2.0"

import os as _os

# Persistent XLA compilation cache: first-time jit of the pipeline takes
# tens of seconds on TPU (minutes for some precision modes); every later
# process reuses the compiled binaries.  The reference has the same idea
# at a smaller scale — the .nbin weight cache written beside ASCII weights
# (nn.cpp:533-592).  Opt out with PHNREC_TPU_NO_COMPILE_CACHE=1.
import jax as _jax

if not _os.environ.get("PHNREC_TPU_NO_COMPILE_CACHE"):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.path.join(
            _os.path.expanduser("~"), ".cache", "phnrec_tpu", "xla"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Backend override that actually works even when a site plugin hijacks
# platform selection programmatically (JAX_PLATFORMS alone can be
# ignored): PHNREC_TPU_PLATFORM=cpu forces the CPU backend, etc.
if _os.environ.get("PHNREC_TPU_PLATFORM"):
    _jax.config.update("jax_platforms",
                       _os.environ["PHNREC_TPU_PLATFORM"])

from phnrec_tpu.config import PhnRecConfig
from phnrec_tpu.pipeline import SpeechRec

__all__ = ["PhnRecConfig", "SpeechRec", "__version__"]
