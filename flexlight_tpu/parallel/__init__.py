from .tile_sharding import frame_pipeline_sharded, make_mesh, render_mrt_sharded

__all__ = ["frame_pipeline_sharded", "make_mesh", "render_mrt_sharded"]
