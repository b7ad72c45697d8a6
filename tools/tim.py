"""Honest timing harness for the axon-tunneled TPU.

Rules learned the hard way (probes 1-11):
- same-args repeated calls can be memoized/elided by the tunnel -> thread state
  so every call differs and depends on the previous one;
- np.asarray sync forces host re-upload of inputs -> keep buffers device-side,
  sync with block_until_ready on the FINAL state only;
- per-call dispatch overhead is ~ms -> chain K reps inside one jit when timing
  small ops, and verify linearity in n.
"""
import time
import jax


def bench_threaded(make_step, state0, n=6, warmup=2):
    """make_step: jitted fn state -> state (must consume+produce device arrays).
    Returns seconds per step."""
    s = state0
    for _ in range(warmup):
        s = make_step(s)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = make_step(s)
    jax.block_until_ready(s)
    return (time.perf_counter() - t0) / n
