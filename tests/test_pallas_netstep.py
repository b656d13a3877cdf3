"""Direct parity of the fused Pallas network-block kernel
(ops/pallas_netstep.py, interpreter mode on CPU) against the XLA dense
scan (DenseKWSScan.step) — records, carry, ragged validity, word-time
resets, and beam pruning; plus the build-time structure gate (irregular
topologies must be rejected so callers fall back to XLA)."""

import numpy as np
import numpy.testing as npt
import pytest

from phnrec_tpu.pipeline import SpeechRec
from phnrec_tpu.decoder.stknet import NEG, DenseKWSScan, OFF_BEAM
from phnrec_tpu.ops.pallas_netstep import (build_net_block_fn,
                                           extract_structure)

from tests.test_stk_streaming import _stkint_package


@pytest.fixture(scope="module")
def dense(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("kwspkg")
    kws = tmp / "kwlist"
    kws.write_text("greasy\nwash\n")
    lex = tmp / "kwlex"
    lex.write_text("greasy\tg r iy s iy\nwash\tw aa sh\n")
    extra = (
        "\n[decoder]\nmode=kws\n"
        "[networks]\ngen_kws_net=true\ndefault=$T/kwsnet\n"
        f"[dicts]\nkeyword_list={kws}\nlexicon1={lex}\n"
    )
    sr = SpeechRec(_stkint_package(tmp, extra))
    return DenseKWSScan(sr.stk_decoder.decoder)


def _compare(dense, beam_width):
    import jax
    import jax.numpy as jnp

    n, F = 8, 16
    rng = np.random.default_rng(0)
    obs = jnp.asarray(rng.normal(-3, 2, (F, n, dense.E))
                      .astype(np.float32))
    nv = jnp.asarray(np.array([16, 12, 16, 3, 0, 16, 7, 16], np.int32))
    nd = jnp.asarray(rng.integers(0, 50, n).astype(np.int32))
    beam = jnp.full((n,), beam_width, jnp.float32)
    car0 = dense.init_carry(n)

    def step(c, x):
        o, i = x
        c2, (sv, sw) = dense.step(c, o, nd + 1 + i, i < nv, beam)
        return c2, (sv, sw)

    carr, (sv_r, sw_r) = jax.lax.scan(
        step, car0, (obs, jnp.arange(F, dtype=jnp.int32)))

    run = build_net_block_fn(dense, n, interpret=True)
    assert run is not None, "structure extraction rejected a kwsnetg net"
    carp, (sv_p, sw_p) = run(car0, obs, nv, nd, beam)

    live = np.asarray(sv_r) > NEG / 2
    npt.assert_allclose(np.where(live, sv_p, 0), np.where(live, sv_r, 0),
                        atol=1e-5)
    npt.assert_array_equal(np.where(live, np.asarray(sw_p), 0),
                           np.where(live, np.asarray(sw_r), 0))
    a_live = np.asarray(carr[0]) > NEG / 2
    e_live = np.asarray(carr[2]) > NEG / 2
    for k, m in ((0, a_live), (1, a_live), (2, e_live), (3, e_live)):
        a, b = np.asarray(carp[k]), np.asarray(carr[k])
        if a.dtype == np.float32:
            npt.assert_allclose(np.where(m, a, 0), np.where(m, b, 0),
                                atol=1e-5, err_msg=f"carry leaf {k}")
        else:
            npt.assert_array_equal(np.where(m, a, 0), np.where(m, b, 0),
                                   err_msg=f"carry leaf {k}")


def test_kernel_matches_dense_scan(dense):
    _compare(dense, OFF_BEAM)


def test_kernel_matches_dense_scan_with_beam(dense):
    # a finite beam prunes real tokens; the kernel's thresholding must
    # track the XLA step exactly (Viterbi.cc:1359-1360 semantics)
    _compare(dense, 8.0)


def test_structure_gate_rejects_irregular(dense):
    """A skip transition outside the left-to-right pattern must make
    extract_structure (and thus the kernel build) refuse."""

    class Irregular:
        M, E, n_sinks = dense.M, dense.E, dense.n_sinks
        A_in = np.array(dense.A_in)
        A_ex = dense.A_ex
        A_cm = dense.A_cm
        R_cm = dense.R_cm
        A_cs = dense.A_cs
        _entry0 = dense._entry0
        _entry_edge0 = dense._entry_edge0

    irr = Irregular()
    # add a skip edge: state 0 -> state 2 of model 0
    irr.A_in[irr.M + 0, 2] = np.float32(-0.5)
    assert extract_structure(irr) is None
    assert build_net_block_fn(irr, 4, interpret=True) is None
