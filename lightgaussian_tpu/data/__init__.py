"""Data layer: PLY / COLMAP / Blender readers, Scene assembly, checkpoints."""
from lightgaussian_tpu.data.dataset import (  # noqa: F401
    CameraInfo,
    SceneInfo,
    camera_to_json,
    detect_scene_type,
    load_camera,
    nerfpp_norm,
    read_blender_scene,
    read_colmap_scene,
    read_scene,
)
from lightgaussian_tpu.data.ply import (  # noqa: F401
    fetch_point_cloud,
    load_gaussian_ply,
    read_ply,
    save_gaussian_ply,
    store_point_cloud,
    write_ply,
)
from lightgaussian_tpu.data.scene import Scene, max_saved_iteration  # noqa: F401
