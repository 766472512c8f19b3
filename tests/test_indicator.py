"""Indicator sliding-window schedule vs the std::queue oracle."""

import functools

import jax
import numpy as np
import pytest

from unified_cvo_tpu.ops import indicator as ind_ops

from oracle import OracleIndicator


@functools.lru_cache(maxsize=None)
def _jit_update():
    # eager lax.cond dispatch is very slow on CPU; compile once per shape
    return jax.jit(ind_ops.update)


@pytest.mark.parametrize("window,thr", [(5, 0.2), (15, 0.2), (10, 0.001)])
@pytest.mark.parametrize("seed", range(3))
def test_indicator_matches_reference_queues(window, thr, seed):
    rng = np.random.default_rng(seed)
    # indicator sequence that drifts then stabilizes (like nonzeros/sqrt(NM))
    seq = np.concatenate(
        [
            np.linspace(0.1, 1.0, 40) + rng.normal(scale=0.02, size=40),
            1.0 + rng.normal(scale=0.005, size=60),
        ]
    ).astype(np.float32)

    oracle = OracleIndicator(window)
    oracle.thr = thr
    st = ind_ops.init_state(window)
    upd = _jit_update()
    for t, x in enumerate(seq):
        st, dec = upd(st, float(x), thr)
        dec_ref = oracle.update(float(np.float32(x)))
        assert bool(dec) == dec_ref, f"step {t}: got {bool(dec)} want {dec_ref}"
        assert np.isclose(float(st.ssum), oracle.ssum, rtol=1e-4, atol=1e-5)
        assert np.isclose(float(st.esum), oracle.esum, rtol=1e-4, atol=1e-5)
        assert int(st.scnt) == len(oracle.start)
        assert int(st.ecnt) == len(oracle.end)


def test_indicator_eventually_decreases_on_stable_signal():
    W, thr = 8, 0.2
    st = ind_ops.init_state(W)
    upd = _jit_update()
    fired = False
    for _ in range(3 * W):
        st, dec = upd(st, 0.5, thr)
        fired |= bool(dec)
    assert fired
