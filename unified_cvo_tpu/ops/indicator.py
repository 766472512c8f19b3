"""Sliding-window sparsity indicator driving the lengthscale schedule.

Exact functional transcription of A_sparsity_indicator_ell_update
(reference src/cvo/CvoGPU.cu:1167-1285): two FIFO windows of the indicator
(nonzeros / sqrt(|X||Y|)); when the two window sums agree within
indicator_stable_threshold the lengthscale is allowed to decay and both
windows reset. Queue quirks are preserved bit-for-bit, including the
boundary iteration where one indicator lands in both windows (the start
queue fills and the immediately-following `if` pushes the same value into
the end queue) and the double-push into the just-filled end queue.

The C++ std::queues become fixed [W] circular buffers carried through the
jitted while-loop; all branches are lax.cond-selected so the whole schedule
lives on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class IndicatorState(NamedTuple):
    sbuf: jax.Array   # [W] start-window circular buffer
    shead: jax.Array  # i32
    scnt: jax.Array   # i32
    ssum: jax.Array   # f32
    ebuf: jax.Array   # [W] end-window circular buffer
    ehead: jax.Array
    ecnt: jax.Array
    esum: jax.Array


def init_state(window: int) -> IndicatorState:
    z32 = jnp.zeros((), jnp.int32)
    zf = jnp.zeros((), jnp.float32)
    buf = jnp.zeros((window,), jnp.float32)
    return IndicatorState(buf, z32, z32, zf, buf, z32, z32, zf)


def update(state: IndicatorState, indicator, stable_threshold: float):
    """One indicator observation -> (new_state, decrease_ell: bool)."""
    W = state.sbuf.shape[0]
    ind = jnp.asarray(indicator, jnp.float32)

    # cond 1: start window not yet full -> push (CvoGPU.cu:1177-1181)
    def push_start(st: IndicatorState) -> IndicatorState:
        pos = jnp.mod(st.shead + st.scnt, W)
        return st._replace(
            sbuf=st.sbuf.at[pos].set(ind), scnt=st.scnt + 1, ssum=st.ssum + ind
        )

    state = jax.lax.cond(state.scnt < W, push_start, lambda st: st, state)

    # cond 2: start full, end not full -> push same value into end
    # (CvoGPU.cu:1182-1186; evaluated with the updated start count)
    def push_end(st: IndicatorState) -> IndicatorState:
        pos = jnp.mod(st.ehead + st.ecnt, W)
        return st._replace(
            ebuf=st.ebuf.at[pos].set(ind), ecnt=st.ecnt + 1, esum=st.esum + ind
        )

    state = jax.lax.cond(
        (state.scnt >= W) & (state.ecnt < W), push_end, lambda st: st, state
    )

    # cond 3: both full -> ratio test (CvoGPU.cu:1192-1238)
    both_full = (state.scnt >= W) & (state.ecnt >= W)
    ratio = state.esum / jnp.where(state.ssum == 0, 1e-30, state.ssum)
    stable = (ratio > 1.0 - stable_threshold) & (ratio < 1.0 + stable_threshold)
    decrease = both_full & stable

    def reset(st: IndicatorState) -> IndicatorState:
        return init_state(W)

    def shift(st: IndicatorState) -> IndicatorState:
        # move end.front into start (dropping start.front), append ind to end
        f = st.ebuf[st.ehead]
        sf = st.sbuf[st.shead]
        sbuf = st.sbuf.at[st.shead].set(f)       # overwrite dropped front
        shead = jnp.mod(st.shead + 1, W)
        ebuf = st.ebuf.at[st.ehead].set(ind)
        ehead = jnp.mod(st.ehead + 1, W)
        return st._replace(
            sbuf=sbuf,
            shead=shead,
            ssum=st.ssum + f - sf,
            ebuf=ebuf,
            ehead=ehead,
            esum=st.esum + ind - f,
        )

    state = jax.lax.cond(
        both_full,
        lambda st: jax.lax.cond(stable, reset, shift, st),
        lambda st: st,
        state,
    )
    return state, decrease
