from atray_tpu.scene.data import (
    Materials,
    Planes,
    Scene,
    SceneParams,
    Spheres,
    TriMesh,
    build_scene,
)
from atray_tpu.scene.objio import load_obj, save_obj
from atray_tpu.scene import procedural, transforms
