from .flatten import FlattenedScene, flatten_graph
from .primitives import Bounding, Cuboid, Object3D, Plane, Primitive, Triangle
from .scene import LightSource, PushList, Scene, Texture
from .transform import Transform, TransformRegistry, reset_global_registry

__all__ = [
    "Bounding", "Cuboid", "FlattenedScene", "LightSource", "Object3D",
    "Plane", "Primitive", "PushList", "Scene", "Texture", "Transform",
    "TransformRegistry", "flatten_graph", "reset_global_registry",
]
