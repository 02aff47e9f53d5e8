from .sharding import make_scene_mesh, denoise_scenes_sharded

__all__ = ["make_scene_mesh", "denoise_scenes_sharded"]
