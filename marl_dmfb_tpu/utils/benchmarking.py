"""Trustworthy timing over the tunneled TPU.

``jax.block_until_ready`` over the axon IFRT tunnel can return before the
remote execution actually finishes (measured: a chain of 10 TD updates
"completed" in 8 ms whose true device time is 36 ms), and every
host<->device round trip costs ~40 ms.  The only sync that cannot lie is a
value transfer: a host read of data produced by the computation.

Benchmarks therefore (a) chain enough iterations to amortize the RTT and
(b) end the timed region with :func:`hostread`, never ``block_until_ready``.
"""

import time

import jax
import jax.numpy as jnp


def hostread(tree) -> float:
    """Force completion by reading one element of the result on the host.

    The element is sliced on device (one tiny cached program) so only a
    scalar crosses the tunnel regardless of the result's size."""
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def measure_rtt(iters: int = 5) -> float:
    """Median host<->device round-trip of a scalar read (seconds)."""
    x = jnp.float32(1.0) + jnp.float32(1.0)
    _ = float(x)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = float(x + jnp.float32(0.0))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def timeit_dispatch(fn, *args, iters: int = 50, warmup: int = 2,
                    subtract_rtt: bool = True):
    """Per-call seconds of ``fn(*args)`` dispatched ``iters`` times
    back-to-back, returned as ``(seconds, last_result)``.

    The device executes dispatches in order, so a single host read of the
    final result syncs the whole chain; one tunnel round trip is
    subtracted.  This is THE timing recipe for same-args benchmark calls —
    use it instead of re-implementing the warmup/hostread/RTT dance."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    hostread(out)
    rtt = measure_rtt() if subtract_rtt else 0.0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    hostread(out)
    return max(1e-9, time.perf_counter() - t0 - rtt) / iters, out


def timeit_chained(step, init, iters: int, warmup: int = 1,
                   subtract_rtt: bool = True) -> float:
    """Per-iteration seconds of ``state = step(i, state)`` chained ``iters``
    times from ``init``, synced by a host read of the final state.

    ``i`` is a monotone call counter (warmup calls included) so the step can
    derive a fresh PRNG key per iteration without host-side state.  One
    tunnel round trip is subtracted and the result clamped positive — the
    chained recipe for iteration-dependent benchmark calls; use it instead
    of re-implementing the warmup/hostread/RTT dance."""
    state = init
    for i in range(warmup):
        state = step(i, state)
    hostread(state)
    rtt = measure_rtt() if subtract_rtt else 0.0
    t0 = time.perf_counter()
    for i in range(iters):
        state = step(warmup + i, state)
    hostread(state)
    return max(1e-9, time.perf_counter() - t0 - rtt) / iters
