from .buffers import SceneBuffers, build_scene_buffers, fetch_tex_val
from .geometry import world_geometry
from .pathtrace import MRT, camera_rays, render_mrt
from .traverse import Hit, shadow_coherent, shadow_scan, traverse_coherent, traverse_scan

__all__ = [
    "Hit", "MRT", "SceneBuffers", "build_scene_buffers", "camera_rays",
    "fetch_tex_val", "render_mrt", "shadow_coherent", "shadow_scan",
    "traverse_coherent", "traverse_scan", "world_geometry",
]
