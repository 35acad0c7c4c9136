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
        mrt = render_mrt(
            buffers, width, height, camera_pos, view_matrix, config,
            random_seed, scheme=scheme, tile=tile,
            row0=ti * rows_local, rows=rows_local,
            sample_offset=si.astype(jnp.float32) * samples_local,
            local_samples=samples_local)
        # Radiance: sum of per-shard partial averages == full average
        color = jax.lax.psum(mrt.color, "sample")
        # Aux channels follow the reference's sequential-sample semantics;
        # take the first sample shard's values (exact when n_sample == 1).
        first = (si == 0).astype(jnp.float32)
        aux = jax.tree.map(
            lambda x: jax.lax.psum(x * (first if x.ndim == 1 else first[..., None]),
                                   "sample"),
            MRT(color=mrt.color, glass=mrt.glass,
                original_color=mrt.original_color, original_w=mrt.original_w,
                render_id=mrt.render_id, original_id_w=mrt.original_id_w,
                location_id=mrt.location_id, alpha=mrt.alpha))
        out = aux._replace(color=color)
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
