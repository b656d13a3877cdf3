"""Forward-backward over the phoneme loop: invariants + brute-force parity.

The sum-semiring analogue of the phndec Viterbi (STKLib PassTokenSum,
Viterbi.cc:603-646; Network::ForwardBackward, Viterbi.cc:2115+)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from phnrec_tpu.decoder.forward_backward import forward_backward, occupancies
from phnrec_tpu.decoder.phnloop import (PhnLoopSpec, viterbi_scan, backtrack,
                                        NEG_INF)


def _rand_logpost(T, P, S, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((T, P * S)).astype(np.float32)
    x = np.log(np.exp(x) / np.exp(x).sum(-1, keepdims=True))
    return x


def _brute_force_loglike(spec, log_post):
    """Enumerate alpha with plain numpy float64 (same recurrence)."""
    P, S = spec.n_phonemes, spec.n_states
    T = log_post.shape[0]
    obs = log_post[:, : P * S].reshape(T, P, S).astype(np.float64)
    alpha = np.full((P, S), -np.inf)
    entry = spec.w_penalty

    def lse(a, b):
        return np.logaddexp(a, b)

    for t in range(T):
        new = np.full((P, S), -np.inf)
        for p in range(P):
            for s in range(S):
                acc = alpha[p, s] + spec.log_tr_curr
                if s > 0:
                    acc = lse(acc, alpha[p, s - 1] + spec.log_tr_next)
                else:
                    acc = lse(acc, entry)
                new[p, s] = acc + obs[t, p, s]
        alpha = new
        entry = np.logaddexp.reduce(alpha[:, -1] + spec.log_tr_next) \
            + spec.w_penalty
    return np.logaddexp.reduce(alpha[:, -1])


@pytest.fixture(scope="module")
def spec():
    return PhnLoopSpec(n_phonemes=5, n_states=3, w_penalty=-2.0)


class TestForwardBackward:
    def test_loglike_matches_brute_force(self, spec):
        lp = _rand_logpost(12, spec.n_phonemes, spec.n_states, seed=1)
        r = forward_backward(spec, jnp.asarray(lp))
        want = _brute_force_loglike(spec, lp)
        np.testing.assert_allclose(float(r.log_like), want, rtol=1e-5)

    def test_gamma_rows_sum_to_one(self, spec):
        lp = _rand_logpost(20, spec.n_phonemes, spec.n_states, seed=2)
        g = occupancies(spec, lp, per_phoneme=True)
        # f32 logaddexp chains accumulate ~1e-5/step absolute error
        np.testing.assert_allclose(g.sum(axis=1), 1.0, atol=1e-3)
        assert np.all(g >= 0)

    def test_alpha_beta_consistency(self, spec):
        """sum_s alpha_t * beta_t is the total likelihood at every t."""
        lp = _rand_logpost(15, spec.n_phonemes, spec.n_states, seed=3)
        r = forward_backward(spec, jnp.asarray(lp))
        la = np.asarray(r.log_alpha, np.float64)
        lb = np.asarray(r.log_beta, np.float64)
        per_t = np.array([np.logaddexp.reduce((la[t] + lb[t]).ravel())
                          for t in range(la.shape[0])])
        np.testing.assert_allclose(per_t, float(r.log_like), atol=2e-4)

    def test_occupancy_tracks_viterbi_on_peaked_input(self, spec):
        """With near-one-hot posteriors, gamma argmax == Viterbi path."""
        P, S = spec.n_phonemes, spec.n_states
        T = 18
        rng = np.random.default_rng(4)
        path = np.repeat(rng.integers(0, P, 3), 6)
        lp = np.full((T, P * S), np.log(1e-4), np.float32)
        for t in range(T):
            for s in range(S):
                lp[t, path[t] * S + s] = np.log(0.3)
        g = occupancies(spec, lp, per_phoneme=True)
        hist = viterbi_scan(spec, jnp.asarray(lp))
        labels = backtrack(hist, [f"p{i}" for i in range(P)])
        vit_path = np.zeros(T, int)
        for lab in labels:
            vit_path[lab.start_frames:lab.end_frames] = int(lab.name[1:])
        np.testing.assert_array_equal(g.argmax(1), vit_path)
