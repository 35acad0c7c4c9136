"""Honest device timing on backends where block_until_ready is unreliable.

The axon (tunneled TPU) backend completes `block_until_ready` immediately
and host<->device transfers ride a slow relay, so naive timing measures
dispatch or transfer, not compute. `device_time` runs `iters` *dependent*
iterations of the function inside one jitted fori_loop (a tiny data
perturbation threads the carry into the inputs so XLA cannot hoist the
body), fetches a single scalar, and subtracts the measured dispatch+fetch
baseline.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _scalarize(out) -> jnp.ndarray:
    leaves = jax.tree.leaves(out)
    acc = jnp.float32(0.0)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf).astype(jnp.float32) * 1e-12
    return acc


def device_time(fn, *args, iters: int = 8, perturb_index: int = 0) -> float:
    """Median-free simple estimate: seconds per call of fn(*args).

    `perturb_index`: which positional arg gets the carry-dependent epsilon
    (a float array or a pytree containing at least one floating leaf,
    whose values tolerate +-1e-30 noise). Non-float leaves pass through
    unperturbed; an all-integer pytree would let XLA hoist `fn` out of
    the loop and under-report, so it is rejected up front.
    """
    has_float = any(
        jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        for x in jax.tree.leaves(args[perturb_index]))
    if not has_float:
        raise ValueError(
            "device_time: the perturbed arg has no floating leaves — the "
            "carry dependency would be dropped and XLA could hoist fn out "
            "of the timing loop. Pick a perturb_index with a float leaf.")

    @jax.jit
    def loop(args):
        def body(_, carry):
            acc, args = carry
            a = list(args)
            eps = acc * 1e-30
            # the perturbed arg may be a pytree (SoA channel tuples) —
            # nudge every float leaf
            a[perturb_index] = jax.tree.map(
                lambda x: x + eps.astype(x.dtype)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
                a[perturb_index])
            out = fn(*a)
            return acc + _scalarize(out), args

        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), args))
        return acc

    @jax.jit
    def baseline(args):
        return _scalarize(args)

    # Warm both programs (compile + one run)
    float(loop(args))
    float(baseline(args))

    t0 = time.perf_counter()
    float(baseline(args))
    base = time.perf_counter() - t0

    t0 = time.perf_counter()
    float(loop(args))
    total = time.perf_counter() - t0
    return max(total - base, 0.0) / iters


def report(name: str, fn, *args, iters: int = 8, perturb_index: int = 0) -> float:
    dt = device_time(fn, *args, iters=iters, perturb_index=perturb_index)
    print(f"{name}: {dt * 1000:.3f} ms/call", flush=True)
    return dt
