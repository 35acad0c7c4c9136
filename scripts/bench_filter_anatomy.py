#!/usr/bin/env python
"""Attribute the first filter kernel's device cost to its internal parts.

The uniform-key run costs 21.9 ms (2026-08-19) even though only ~37
offsets are active per tile — so most of the time is NOT the per-offset
updates. Candidates: the per-ox-group unaligned window slice, the
per-ox-group prep_fn (byte unpack + contrib math), the per-offset gate +
FMA updates, or per-kernel fixed cost (window DMA, scale/staircase,
banded 4x dispatch). This script times stubbed kernel variants to split
them:

  full        the real first filter (both key modes)
  no-update   update_fn returns acc unchanged (gates/taps still traced
              out? no - the whole offset body collapses to nothing, so
              this measures group slice+prep + fixed cost)
  no-prep     prep_fn parks raw planes without byte unpack/contrib math
              (update math is fed nonsense - output ignored; measures
              prep_fn's share of the group cost)
  no-groups   entries=() - kernel does only window DMA + scale + init +
              finish (per-kernel fixed cost, banded x4)

Usage: python scripts/bench_filter_anatomy.py [cpu] [H W]
"""

import os
import sys

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from bench_filters import synth_inputs  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from flexlight_tpu.post import filter_kernel as K
    from flexlight_tpu.utils.devtime import report

    nums = [int(a) for a in sys.argv[1:] if a.isdigit()]
    h, w = (nums[0], nums[1]) if len(nums) >= 2 else (1080, 1920)
    interp = jax.default_backend() == "cpu"

    def run_first(variant, color, ip, ocolor, ids, oid):
        prep = K._first_prep
        update = K._first_update
        if variant == "no-update":
            update = lambda acc, ctx, nb, wt: acc
        if variant == "no-prep":
            # park raw planes: same scratch shapes, no unpack/contrib math
            prep = lambda col: (
                (col[K.ID], col[K.ID], col[K.ID], col[K.OID]),
                (col[K.COLOR].astype(jnp.float32),) * 3)
        render_id_p, render_ip_w = K.vote_repair_packed(
            K.pack_rgba8(ids), K.pack_rgba8(oid), ip[..., 3])
        outs = K._run_disc(
            (ids, oid, color, ip, ocolor), "disc37", K.FIRST_BOUNDS,
            n_acc=4, out_chs=(4, 3),
            scale_fn=K._first_scale, prep_fn=prep, ctx_fn=K._first_ctx,
            init_fn=K._first_init, update_fn=update,
            finish_fn=K._first_finish, valid_fn=K._first_valid,
            interpret=interp, band_edges=K.FIRST_BAND_EDGES,
            n_int=4, n_f32=3)
        return outs[0] + render_ip_w[..., None]

    def run_nogroups(color, ip, ocolor, ids, oid):
        # empty offset table: fixed cost only (DMA + scale + init/finish)
        import flexlight_tpu.post.filter_kernel as FK
        orig = FK._banded_entries
        FK._banded_entries = lambda *a: [(-float("inf"), float("inf"), ())]
        try:
            outs = K._run_disc(
                (ids, oid, color, ip, ocolor), "disc37", K.FIRST_BOUNDS,
                n_acc=4, out_chs=(4, 3),
                scale_fn=K._first_scale, prep_fn=K._first_prep,
                ctx_fn=K._first_ctx, init_fn=K._first_init,
                update_fn=K._first_update, finish_fn=K._first_finish,
                valid_fn=K._first_valid, interpret=interp,
                band_edges=K.FIRST_BAND_EDGES, n_int=4, n_f32=3)
        finally:
            FK._banded_entries = orig
        return outs[0]

    for mode in ("uniform", "mixed"):
        color, ip, ocolor, ids, oid = synth_inputs(h, w, mode)
        print(f"--- {mode} keys, {h}x{w} ---", flush=True)
        for variant in ("full", "no-update", "no-prep"):
            report(f"first[{mode},{variant}]",
                   lambda c, p, oc, i, o, v=variant: run_first(v, c, p, oc,
                                                               i, o),
                   color, ip, ocolor, ids, oid, iters=4)
        report(f"first[{mode},no-groups]", run_nogroups,
               color, ip, ocolor, ids, oid, iters=4)


if __name__ == "__main__":
    main()
