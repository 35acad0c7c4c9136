#!/usr/bin/env python
"""Device microbench of the sparse wavefront-sort machinery.

The sparse scheme sorts every bounce/shadow cast: key build, stable
argsort, inverse permutation, and the packed row-gather applies. At
dragon 1080p that is ~10 sorted casts per frame, and none of the sweep
stages attribute the sort cost separately — this does. Also A/Bs the two
inverse-permutation constructions (argsort(perm) = a second full sort,
vs scatter of iota) to pick the cheaper one.

Usage: python scripts/bench_sort.py [n_rays]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

import jax
import jax.numpy as jnp

from flexlight_tpu.utils.devtime import device_time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2 * 1024 * 1024
    rng = np.random.default_rng(7)
    key32 = jnp.asarray(rng.integers(0, 1 << 21, n, dtype=np.int32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    rays = jnp.asarray(rng.normal(size=(n, 7)).astype(np.float32))

    def t(name, fn, *args):
        dt = device_time(fn, *args, iters=8)
        print(f"{name:42s} {dt * 1000.0:8.3f} ms", flush=True)
        return dt

    t("argsort int32", lambda k: jnp.argsort(k), key32)
    t("argsort int32 stable", lambda k: jnp.argsort(k, stable=True), key32)
    t("inverse perm: argsort(perm)", lambda p: jnp.argsort(p), perm)
    t("inverse perm: scatter iota",
      lambda p: jnp.zeros(n, jnp.int32).at[p].set(
          jnp.arange(n, dtype=jnp.int32), unique_indices=True,
          indices_are_sorted=False), perm)
    t("apply perm: [N,7] row gather", lambda r, p: r[p], rays, perm)
    # un-permute results WITHOUT building inv_perm at all: scatter the
    # sorted rows back to original positions (row scatter = the scatter
    # analogue of the vectorized [N,C] row gather)
    t("unpermute: [N,7] row scatter at[perm]",
      lambda r, p: jnp.zeros_like(r).at[p].set(r, unique_indices=True),
      rays, perm)
    t("unpermute: argsort(perm) + row gather",
      lambda r, p: r[jnp.argsort(p)], rays, perm)
    t("sort+inv+2x apply (per-cast prevtile cost)",
      lambda k, r: (lambda p: (jnp.argsort(p), r[p]))(
          jnp.argsort(k, stable=True)), key32, rays)

    # Multi-operand lax.sort: carry the ray payload THROUGH the sort
    # instead of argsort + a [N,7] row gather (whose 7-wide rows pad to
    # full 128-lane tiles: ~1 GB moved for 56 MB of data). The inverse
    # side works the same way: sorting (perm, results...) by perm IS the
    # inverse permutation.
    import jax.lax as lax

    cols7 = tuple(jnp.asarray(np.asarray(rays)[:, c]) for c in range(7))

    def sort_carry(k, *cols):
        outs = lax.sort((k, *cols), num_keys=1, is_stable=True)
        return sum(outs[1:])

    t("sort carrying 7 SoA payload cols (lax.sort)", sort_carry, key32,
      *cols7)

    def unperm_carry(p, *cols):
        outs = lax.sort((p, *cols), num_keys=1, is_stable=False)
        return sum(outs[1:])

    t("unpermute 4 SoA cols: lax.sort by perm", unperm_carry, perm,
      *cols7[:4])

    # nearest2 key prepass at dragon-like box counts
    from flexlight_tpu.ops.intersect_sparse import nearest2_key

    k = 702                                   # dragon cluster count
    centers = rng.uniform(-10, 10, (k, 3)).astype(np.float32)
    half = rng.uniform(0.2, 3.0, (k, 3)).astype(np.float32)
    amin = jnp.asarray(centers - half)
    amax = jnp.asarray(centers + half)
    o = jnp.asarray(rng.uniform(-12, 12, (n, 3)).astype(np.float32))
    d = rays[:, 0:3] / jnp.linalg.norm(rays[:, 0:3], axis=1, keepdims=True)
    ml = jnp.full((n,), 4.2e9, jnp.float32)
    interp = jax.default_backend() == "cpu"   # Pallas needs interpret on CPU
    t("nearest2 key pass (88 supertiles)",
      lambda a, b, oo, dd, mm: nearest2_key(a, b, oo, dd, mm,
                                            interpret=interp),
      amin, amax, o, d, ml)


if __name__ == "__main__":
    main()
