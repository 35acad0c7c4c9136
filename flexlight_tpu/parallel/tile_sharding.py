"""Multi-chip rendering: image-tile x sample sharding over a device mesh.

The reference is single-GPU; its per-pixel SIMT parallelism (SURVEY §2.5)
scales across TPU chips here as a 2D `jax.sharding.Mesh`:

- 'tile' axis — data parallelism over horizontal image strips. Each device
  traces camera rays for its own rows against the replicated scene; strips
  are assembled with an all_gather (ICI).
- 'sample' axis — the per-pixel sample loop (glsl:610-614) split across
  devices; radiance is averaged with a psum.

Post-processing (temporal + the 7x7-ish denoise stencils + FXAA/TAA) runs
on the gathered image. The stencil radius is dynamic per pixel
(first_filter.glsl:101), so a halo exchange needs a bound; a
ppermute-based bounded-halo path is the planned upgrade — the all_gather
assembly is already a full, correct multi-chip pipeline for the image
sizes in BASELINE.json.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pathtrace import MRT, render_mrt


def make_mesh(n_tile: int, n_sample: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = n_tile * n_sample
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_tile, n_sample)
    return Mesh(arr, axis_names=("tile", "sample"))


def render_mrt_sharded(buffers, width: int, height: int, camera_pos,
                       view_matrix, config, random_seed, mesh: Mesh,
                       scheme: str = "scan", tile: int = 1024) -> MRT:
    """Render the full-frame MRT with rows sharded over 'tile' and the
    sample loop over 'sample'. Returns replicated flat [H*W] MRT."""
    n_tile = mesh.shape["tile"]
    n_sample = mesh.shape["sample"]
    if height % n_tile != 0:
        raise ValueError(f"height {height} not divisible by tile axis {n_tile}")
    if config.samples_per_ray % n_sample != 0:
        raise ValueError("samples_per_ray not divisible by sample axis")
    rows_local = height // n_tile
    samples_local = config.samples_per_ray // n_sample

    def shard_fn(buffers, camera_pos, view_matrix, random_seed):
        ti = jax.lax.axis_index("tile")
        si = jax.lax.axis_index("sample")
        mrt, (rme_x, frl) = render_mrt(
            buffers, width, height, camera_pos, view_matrix, config,
            random_seed, scheme=scheme, tile=tile,
            row0=ti * rows_local, rows=rows_local,
            sample_offset=si.astype(jnp.float32) * samples_local,
            local_samples=samples_local, with_raw_aux=True)

        # Cross-sample combine matching the reference's sequential sample
        # loop over shader globals (glsl:84-89, 555-576):
        #  - renderId.xyz, originalId.w base (originalTPOx is overwrite —
        #    see below), glassFilter, originalRMEx: `+=` across samples
        #  - originalColor, originalTPOx, renderId.w: overwritten each
        #    sample -> the globally-last sample (shard n_sample-1) wins
        #  - firstRayLength: running min across samples
        # The coverage mask and location channels are sample-independent.
        def sum_s(x):
            return jax.lax.psum(x, "sample")

        def last_s(x):
            sel = (si == n_sample - 1).astype(x.dtype)
            return jax.lax.psum(x * (sel if x.ndim == 1 else sel[..., None]),
                                "sample")

        color = sum_s(mrt.color)
        glass = sum_s(mrt.glass)
        cov = mrt.alpha > 0.0
        # original_w = min(rme accumulated over ALL samples, min frl)
        # (glsl:635) — folded here from the raw channels.
        rme_total = sum_s(rme_x)
        frl_min = jax.lax.pmin(frl, "sample")
        original_w = jnp.where(
            cov, jnp.minimum(rme_total, frl_min) + np.float32(1.0 / 255.0), 0.0)
        render_id = jnp.concatenate(
            [sum_s(mrt.render_id[..., 0:3]), last_s(mrt.render_id[..., 3:4])],
            axis=-1)
        out = MRT(
            color=color,
            glass=glass,
            original_color=last_s(mrt.original_color),
            original_w=original_w,
            render_id=render_id,
            original_id_w=last_s(mrt.original_id_w),
            location_id=last_s(mrt.location_id),
            alpha=last_s(mrt.alpha),
        )
        # Assemble image strips across the tile axis (ICI all_gather)
        return jax.tree.map(
            lambda x: jax.lax.all_gather(x, "tile", axis=0, tiled=True), out)

    # check_vma=False: traversal scan carries start from constants
    # (min_len=POW32), which the varying-manual-axes checker would force
    # through pcast on every carry leg; the function is replication-safe
    # by construction (same scene on every shard, per-shard ray strips).
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(buffers, camera_pos, view_matrix, random_seed)


@partial(jax.jit, static_argnames=("width", "height", "config", "mesh",
                                   "scheme", "tile"))
def frame_pipeline_sharded(buffers, cam_pos, view, random_seed,
                           temporal_state, taa_state, width: int, height: int,
                           config, mesh: Mesh, scheme: str = "scan",
                           tile: int = 1024):
    """Full multi-chip frame: sharded pathtrace + replicated post.

    Mirrors models.pathtracer.frame_pipeline with the MRT pass distributed.
    """
    from ..models.pathtracer import postprocess_mrt

    mrt = render_mrt_sharded(buffers, width, height, cam_pos, view, config,
                             random_seed, mesh, scheme=scheme, tile=tile)
    return postprocess_mrt(mrt, temporal_state, taa_state, width, height, config)


@partial(jax.jit, static_argnames=("width", "height", "config", "mesh",
                                   "scheme", "tile", "halo"))
def frame_pipeline_sharded_halo(buffers, cam_pos, view, random_seed,
                                temporal_state, taa_state,
                                width: int, height: int, config, mesh: Mesh,
                                scheme: str = "scan", tile: int = 1024,
                                halo: int = 32):
    """Fully-sharded frame: pathtrace AND post-processing stay strip-sharded.

    Temporal accumulation is pointwise per strip; the denoise stencils and
    FXAA exchange `halo` boundary rows with mesh neighbors via ppermute
    (parallel.halo) instead of all_gathering frames. Identical to the
    single-chip pipeline wherever the per-pixel stencil radius fits the
    halo. Only the final RGB strips (and updated history strips) are
    gathered. 1D 'tile' mesh.
    """
    from ..models.pathtracer import _filter_chain, _quantized_mrt
    from ..ops.pathtrace import render_mrt
    from ..post.common import quantize_rgba8, split_hdr
    from ..post.fxaa import fxaa_auto
    from ..post.temporal import TemporalState, push_frame, temporal_average
    from .halo import with_halo

    n_tile = mesh.shape["tile"]
    if height % n_tile != 0:
        raise ValueError(f"height {height} not divisible by tile axis {n_tile}")
    rows_local = height // n_tile
    # One-hop ppermute reaches at most the adjacent strip
    halo = min(halo, rows_local)
    use_aa = config.antialiasing in ("fxaa", "taa")

    def shard_fn(buffers, cam_pos, view, random_seed, temporal_state, taa_state):
        ti = jax.lax.axis_index("tile")
        row0 = ti * rows_local
        mrt = render_mrt(buffers, width, height, cam_pos, view, config,
                         random_seed, scheme=scheme, tile=tile,
                         row0=row0, rows=rows_local)
        color, alpha, color_q, ip_q, id_q, oid_q, ocolor_q = _quantized_mrt(
            mrt, rows_local, width)

        # slice this shard's strip of the (replicated) history ring
        my_state = jax.tree.map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, row0, rows_local, axis=1),
            temporal_state)

        display = None
        if config.temporal:
            my_state = push_frame(my_state, color_q, ip_q, id_q, oid_q)
            t_color, t_glass, center_w = temporal_average(my_state)
            if config.filter:
                frac_q, high_q = split_hdr(t_color)
                r0 = jnp.concatenate([frac_q, center_w[..., None]], axis=-1)
                ip0 = jnp.concatenate(
                    [high_q, quantize_rgba8(t_glass)[..., None]], axis=-1)
                display = _filter_chain(
                    config, r0, ip0, ocolor_q, id_q, oid_q,
                    lift=lambda f: with_halo(f, halo, "tile"))
            else:
                display = jnp.clip(t_color, 0.0, 1.0)
                if use_aa:
                    display = quantize_rgba8(display)
        elif config.filter:
            display = _filter_chain(
                config, color_q, ip_q, ocolor_q, id_q, oid_q,
                lift=lambda f: with_halo(f, halo, "tile"))
        else:
            direct = color * mrt.original_color.reshape(rows_local, width, 3)
            display = jnp.clip(direct, 0.0, 1.0)

        new_taa = taa_state
        if use_aa:
            aa_in = jnp.concatenate(
                [quantize_rgba8(display),
                 (alpha.reshape(rows_local, width) > 0).astype(jnp.float32)[..., None]],
                axis=-1)
            if config.antialiasing == "fxaa":
                display = with_halo(fxaa_auto, halo, "tile")(aa_in)[..., 0:3]
            else:
                # TAA: the 3x3 clip-clamp is the only cross-pixel read
                # (history averaging is pointwise), so only the clamp needs
                # a 1-row halo; history strips stay local.
                from ..post.taa import neighborhood_clamp, taa_apply
                from .halo import exchange_halo

                my_taa = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, row0, rows_local, axis=1), taa_state)
                padded = exchange_halo(aa_in, 1, "tile")
                mn, mx = neighborhood_clamp(padded)
                out, my_taa = taa_apply(my_taa, aa_in,
                                        clamp=(mn[1:-1], mx[1:-1]))
                display = out[..., 0:3]
                new_taa = my_taa

        display = jnp.clip(display, 0.0, 1.0)
        gather = lambda x, axis: jax.lax.all_gather(x, "tile", axis=axis, tiled=True)
        new_state = jax.tree.map(lambda x: gather(x, 1), my_state)
        if config.antialiasing == "taa":
            new_taa = jax.tree.map(lambda x: gather(x, 1), new_taa)
        return gather(display, 0), new_state, new_taa

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    display, new_temporal, new_taa = fn(buffers, cam_pos, view, random_seed,
                                        temporal_state, taa_state)
    return display, new_temporal, new_taa
