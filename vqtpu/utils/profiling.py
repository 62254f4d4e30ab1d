"""Tracing / profiling helpers (SURVEY.md §5.1: the reference has no
profiling subsystem; on TPU the right tools are the JAX profiler plus a
dispatch-overhead-immune timing method).

- `trace(logdir)` / `annotate(name)` — thin wrappers over jax.profiler for
  xprof/tensorboard traces.
- `timeit_chained(fn, *args)` — robust per-iteration wall time for a jitted
  op on remote/tunneled TPU runtimes, where per-call dispatch overhead is
  hundreds of ms and `block_until_ready` under-reports device time. The op
  runs inside ONE jitted lax.fori_loop with a data dependency chaining
  iterations (so XLA can neither elide nor overlap iterations beyond the
  hardware's real pipelining), and the per-iter time is the slope between
  two iteration counts — fixed overhead cancels. This is the methodology
  behind bench.py and all numbers in BASELINE.md.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a JAX profiler trace (view with xprof / tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Context manager labelling a region inside a profiler trace."""
    return jax.profiler.TraceAnnotation(name)


def timeit_chained(
    fn: Callable,
    *args,
    lo: int = 2,
    hi: int = 18,
    perturb_arg: int = 0,
) -> float:
    """Seconds per iteration of `fn(*args)` via chained-slope timing.

    `fn` must accept jax arrays and return a pytree of arrays. The argument
    at `perturb_arg` is nudged by a negligible function of the running carry
    so no iteration can be CSE'd or hoisted, and every output leaf feeds the
    carry so nothing can be sliced away or dead-code-eliminated.
    """

    @functools.partial(jax.jit, static_argnums=0)
    def chained(iters, *a):
        def body(i, acc):
            perturbed = list(a)
            perturbed[perturb_arg] = (
                perturbed[perturb_arg]
                + (acc * 1e-20).astype(perturbed[perturb_arg].dtype)
            )
            out = fn(*perturbed)
            leaves = jax.tree.leaves(out)
            contrib = sum(l.sum().astype(jnp.float32) for l in leaves)
            return acc + contrib * 1e-12

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(chained(lo, *args))        # compile both variants
    float(chained(hi, *args))
    t0 = time.perf_counter()
    float(chained(lo, *args))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chained(hi, *args))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (hi - lo)
