from .rasterizer import SceneMesh, rasterize
