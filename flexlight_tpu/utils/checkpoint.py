"""Checkpoint / resume.

The reference's closest mechanisms are localStorage config persistence and
static-baked scene buffers (SURVEY §5). Here both become real artifacts:

- save/load of the renderer's accumulated history state (temporal ring,
  TAA history, frame counter) so a long accumulation can resume;
- save/load of flattened scene arrays so dragon-scale scenes skip the
  host-side BVH/flatten cost on reload (the staticPermanent analogue).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np


def snapshot_render_state(renderer) -> dict:
    """Host-side (numpy) copy of the renderer's resumable state.

    This is the only step that reads the device; utils.failover keeps the
    latest snapshot so a checkpoint can still be written after the device
    dies (a dead device cannot be read — fetches hang, see failover)."""
    state = {
        "frame_count": renderer._frame_count,
        "config": dataclasses.asdict(renderer.config),
        "width": renderer.width,
        "height": renderer.height,
    }
    arrays = {}
    if renderer._temporal_state is not None:
        for name, arr in renderer._temporal_state._asdict().items():
            arrays[f"temporal_{name}"] = np.asarray(arr)
    if renderer._taa_state is not None:
        arrays["taa_history"] = np.asarray(renderer._taa_state.history)
    return {"meta": state, "arrays": arrays}


def write_render_state(path: str, snapshot: dict) -> None:
    """Persist a snapshot_render_state() dict. Pure host IO."""
    np.savez_compressed(path, meta=json.dumps(snapshot["meta"]),
                        **snapshot["arrays"])


def save_render_state(path: str, renderer) -> None:
    write_render_state(path, snapshot_render_state(renderer))


def load_render_state(path: str, renderer) -> None:
    from ..post.taa import TAAState
    from ..post.temporal import TemporalState

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if (meta["width"], meta["height"]) != (renderer.width, renderer.height):
        raise ValueError("checkpoint resolution mismatch")
    renderer._prepare()
    renderer._frame_count = int(meta["frame_count"])
    if "temporal_color" in data:
        renderer._temporal_state = TemporalState(
            color=jnp.asarray(data["temporal_color"]),
            ip=jnp.asarray(data["temporal_ip"]),
            ids=jnp.asarray(data["temporal_ids"]),
            oid=jnp.asarray(data["temporal_oid"]),
        )
    if "taa_history" in data:
        renderer._taa_state = TAAState(history=jnp.asarray(data["taa_history"]))


def save_scene_cache(path: str, scene) -> None:
    """Persist the flattened scene arrays (staticPermanent analogue,
    scene.js:870-882)."""
    built = scene.generate_arrays()
    np.savez_compressed(
        path,
        geometry=built.geometry,
        attributes=built.attributes,
        id_buffer=built.id_buffer,
        min_max=built.min_max,
        lights=scene.build_light_array(),
        ambient=np.asarray(scene.ambient_light, dtype=np.float32),
    )


def load_scene_cache(path: str):
    """Returns SceneBuffers built from a cache file (no host scene walk)."""
    from ..ops.buffers import SceneBuffers, build_atlas
    from ..scene.transform import global_registry

    data = np.load(path)
    rotations, shifts = global_registry().build_arrays()
    return SceneBuffers(
        geometry=jnp.asarray(data["geometry"]),
        attributes=jnp.asarray(data["attributes"]),
        id_buffer=jnp.asarray(data["id_buffer"]),
        rotations=jnp.asarray(rotations),
        shifts=jnp.asarray(shifts),
        lights=jnp.asarray(data["lights"]),
        ambient=jnp.asarray(data["ambient"]),
        albedo_atlas=jnp.zeros((1, 1, 3), dtype=jnp.float32),
        pbr_atlas=jnp.zeros((1, 1, 3), dtype=jnp.float32),
        tpo_atlas=jnp.zeros((1, 1, 3), dtype=jnp.float32),
        texture_width=jnp.float32(1.0),
    )
