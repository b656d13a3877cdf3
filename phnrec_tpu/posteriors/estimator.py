"""LCRC posterior estimator: STC assembly + band nets + merger.

The TPU equivalent of Traps (traps.cpp): mel params [T, nbanks] ->
phoneme-state posteriors [T, n_out] as one jitted tensor program:

    L, R   = LCRC assembly (stc.py)                      2 small GEMMs
    lo, ro = band MLPs (mlp.py)                          4 MXU GEMMs
    m      = ln(concat(lo, ro))  (traps.cpp:435-461, sLn guard dspc.h:155-160)
    post   = merger MLP                                  2 MXU GEMMs

Model-package file naming follows the reference conventions (config.h:30-39):
<dir>/weights/band{0,1}.weights(.nbin), <dir>/norms/band{0,1}.norms,
<dir>/windows/band{0,1}.window, <dir>/weights/merger.weights(.nbin).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from phnrec_tpu.io.weights import load_net, load_window
from phnrec_tpu.posteriors import mlp
from phnrec_tpu.posteriors.stc import LCRCAssembler, LCRCSpec


class LCRCEstimator:
    """Loads one model package's nets and exposes a jitted forward."""

    def __init__(self, model_dir: str, nbanks: int, trap_len: int = 31,
                 add_c0: bool = True, fast_exp: bool = True):
        w = os.path.join(model_dir, "weights")
        n = os.path.join(model_dir, "norms")
        win = os.path.join(model_dir, "windows")
        half_context = (trap_len - 1) // 2 + 1

        self.band = [
            mlp.to_device(load_net(os.path.join(w, f"band{i}.weights"),
                                   os.path.join(n, f"band{i}.norms")))
            for i in range(2)
        ]
        self.merger = mlp.to_device(
            load_net(os.path.join(w, "merger.weights"),
                     os.path.join(n, "merger.norms")))

        if self.band[0].n_inp % nbanks != 0:
            raise ValueError(
                f"band net input {self.band[0].n_inp} not divisible by "
                f"nbanks {nbanks}")
        n_coefs = self.band[0].n_inp // nbanks
        spec = LCRCSpec(nbanks=nbanks, trap_len=trap_len, n_coefs=n_coefs,
                        add_c0=add_c0)
        self.assembler = LCRCAssembler(
            spec,
            load_window(os.path.join(win, "band0.window"), half_context),
            load_window(os.path.join(win, "band1.window"), half_context),
        )
        self.fast_exp = fast_exp
        self.trap_shift = (trap_len - 1) // 2
        self.n_outs = self.merger.n_out

    @partial(jax.jit, static_argnums=0)
    def posteriors(self, params: jnp.ndarray) -> jnp.ndarray:
        """[T, nbanks] normalized mel params -> [T, n_out] posteriors."""
        left, right = self.assembler(params)
        lo = mlp.forward(self.band[0], left, self.fast_exp)
        ro = mlp.forward(self.band[1], right, self.fast_exp)
        m = jnp.concatenate([lo, ro], axis=-1)
        # sLn guard: ln(x) for x > 0 else 0 (traps.cpp:459, dspc.h:155-160)
        m = jnp.where(m > 0.0, jnp.log(jnp.maximum(m, 1e-37)), 0.0)
        return mlp.forward(self.merger, m, self.fast_exp)
