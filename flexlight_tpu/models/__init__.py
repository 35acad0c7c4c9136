from .pathtracer import PathTracer, frame_pipeline
from .rasterizer import Rasterizer, raster_frame
from .simple import SimplePathTracer, simple_frame

__all__ = ["PathTracer", "Rasterizer", "SimplePathTracer",
           "frame_pipeline", "raster_frame", "simple_frame"]
