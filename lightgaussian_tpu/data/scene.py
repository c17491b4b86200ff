"""Scene: binds a dataset directory to a GaussianScene.

Mirrors `/root/reference/scene/__init__.py`: scene-type sniffing, first-run
`input.ply` copy + `cameras.json` export, camera shuffling, NeRF++
`cameras_extent`, and model-init dispatch — `create_from_pcd` for fresh runs,
`load_ply` / SH-truncating `load_ply_sh` / VQ `load_vq` for saved iterations.
Saving writes `point_cloud/iteration_N/point_cloud.ply` in the reference's
interchange layout.
"""
from __future__ import annotations

import json
import random
import shutil
from pathlib import Path

from lightgaussian_tpu.data import dataset as D
from lightgaussian_tpu.data import ply as ply_io
from lightgaussian_tpu.models import gaussians as G


class Scene:
    def __init__(
        self,
        source_path: str,
        model_path: str,
        images_dir: str = "images",
        white_background: bool = False,
        eval_split: bool = False,
        resolution: int = -1,
        resolution_scales=(1.0,),
        load_iteration: int | None = None,
        shuffle: bool = True,
        new_sh_degree: int | None = None,
        load_vq: bool = False,
        max_sh_degree: int = 3,
        seed: int = 0,
        load_images: bool = True,
    ):
        self.source_path = Path(source_path)
        self.model_path = Path(model_path)
        self.loaded_iter = None

        if load_iteration is not None:
            if load_iteration == -1:
                self.loaded_iter = max_saved_iteration(self.model_path / "point_cloud")
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        info = D.read_scene(self.source_path, images_dir, white_background, eval_split)
        self.scene_info = info

        if not self.loaded_iter:
            self.model_path.mkdir(parents=True, exist_ok=True)
            try:
                shutil.copyfile(info.ply_path, self.model_path / "input.ply")
            except OSError:
                pass
            cam_json = [
                D.camera_to_json(i, c)
                for i, c in enumerate(info.test_cameras + info.train_cameras)
            ]
            (self.model_path / "cameras.json").write_text(json.dumps(cam_json))

        if shuffle:
            rng = random.Random(seed)
            rng.shuffle(info.train_cameras)
            rng.shuffle(info.test_cameras)

        self.cameras_extent = info.nerf_normalization["radius"]

        self.train_cameras: dict[float, list] = {}
        self.test_cameras: dict[float, list] = {}
        for scale in resolution_scales:
            self.train_cameras[scale] = [
                D.load_camera(c, resolution, scale, load_images) for c in info.train_cameras
            ]
            self.test_cameras[scale] = [
                D.load_camera(c, resolution, scale, load_images) for c in info.test_cameras
            ]

        if self.loaded_iter:
            it_dir = self.model_path / "point_cloud" / f"iteration_{self.loaded_iter}"
            if load_vq:
                from lightgaussian_tpu.compress import vectree

                self.gaussians = vectree.load_vq_scene(it_dir / "extreme_saving")
            elif new_sh_degree is not None:
                self.gaussians = ply_io.load_gaussian_ply(
                    it_dir / "point_cloud.ply", new_sh_degree=new_sh_degree
                )
            else:
                self.gaussians = ply_io.load_gaussian_ply(it_dir / "point_cloud.ply")
        else:
            pts, cols, _ = info.point_cloud
            self.gaussians = G.from_point_cloud(pts, cols, max_sh_degree=max_sh_degree)

    def save(self, iteration: int, scene: "G.GaussianScene | None" = None) -> Path:
        out = self.model_path / "point_cloud" / f"iteration_{iteration}" / "point_cloud.ply"
        ply_io.save_gaussian_ply(scene if scene is not None else self.gaussians, out)
        return out

    def getTrainCameras(self, scale: float = 1.0):
        return self.train_cameras[scale]

    def getTestCameras(self, scale: float = 1.0):
        return self.test_cameras[scale]


def max_saved_iteration(point_cloud_dir: Path) -> int:
    """`searchForMaxIteration` (`utils/system_utils.py` in the reference)."""
    iters = [
        int(p.name.split("_")[-1])
        for p in Path(point_cloud_dir).iterdir()
        if p.name.startswith("iteration_")
    ]
    if not iters:
        raise FileNotFoundError(f"no saved iterations under {point_cloud_dir}")
    return max(iters)
