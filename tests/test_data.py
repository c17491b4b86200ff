"""Data-layer tests: PLY round-trips (incl. the reference interchange layout),
COLMAP binary/text parsers, Blender scene reading, Scene assembly, and training
checkpoint save/restore."""
import dataclasses
import json

import numpy as np
import pytest

from lightgaussian_tpu.data import colmap, dataset as D, ply
from lightgaussian_tpu.data.scene import Scene
from lightgaussian_tpu.models import gaussians as G
from lightgaussian_tpu.models.camera import Camera
from lightgaussian_tpu.train import checkpoint as ckpt
from lightgaussian_tpu.train.state import init_train_state


# ---------------------------------------------------------------------------
# PLY
# ---------------------------------------------------------------------------

def test_ply_roundtrip_structured(tmp_path, rng):
    data = np.empty(17, dtype=[("x", "f4"), ("n", "u1"), ("d", "f8")])
    data["x"] = rng.normal(size=17).astype(np.float32)
    data["n"] = rng.integers(0, 255, 17)
    data["d"] = rng.normal(size=17)
    ply.write_ply(tmp_path / "t.ply", data)
    back = ply.read_ply(tmp_path / "t.ply")["vertex"]
    assert back.count == 17
    for f in ("x", "n", "d"):
        np.testing.assert_array_equal(back[f], data[f])


def test_ply_ascii_read(tmp_path):
    txt = (
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty uchar red\n"
        "end_header\n1.5 2.5 255\n-1.0 0.0 7\n"
    )
    (tmp_path / "a.ply").write_text(txt)
    v = ply.read_ply(tmp_path / "a.ply")["vertex"]
    np.testing.assert_allclose(v["x"], [1.5, -1.0])
    np.testing.assert_array_equal(v["red"], [255, 7])


def test_point_cloud_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (50, 3))
    ply.store_point_cloud(tmp_path / "p.ply", xyz, rgb)
    pts, cols, normals = ply.fetch_point_cloud(tmp_path / "p.ply")
    np.testing.assert_allclose(pts, xyz, rtol=1e-6)
    np.testing.assert_allclose(cols, rgb / 255.0, atol=1e-6)
    assert np.all(normals == 0)


def _random_scene(rng, n=30, max_sh=3):
    cap = G.round_capacity(n)
    k = (max_sh + 1) ** 2 - 1
    scene = G.empty_scene(cap, max_sh_degree=max_sh, active_sh_degree=max_sh)
    import jax.numpy as jnp

    def fill(buf, vals):
        return buf.at[:n].set(jnp.asarray(vals, jnp.float32))

    return dataclasses.replace(
        scene,
        means=fill(scene.means, rng.normal(size=(n, 3))),
        sh_dc=fill(scene.sh_dc, rng.normal(size=(n, 3))),
        sh_rest=fill(scene.sh_rest, rng.normal(size=(n, k, 3))),
        log_scales=fill(scene.log_scales, rng.normal(size=(n, 3))),
        quats=fill(scene.quats, rng.normal(size=(n, 4))),
        opacity_logits=fill(scene.opacity_logits, rng.normal(size=(n,))),
        alive=scene.alive.at[:n].set(True),
    )


def test_gaussian_ply_roundtrip(tmp_path, rng):
    scene = _random_scene(rng, n=30)
    ply.save_gaussian_ply(scene, tmp_path / "pc.ply")
    back = ply.load_gaussian_ply(tmp_path / "pc.ply")
    assert back.max_sh_degree == 3 and back.active_sh_degree == 3
    assert int(back.num_alive()) == 30
    for f in G.GaussianScene.PARAM_FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(back, f))[:30], np.asarray(getattr(scene, f))[:30], rtol=1e-6
        )


def test_gaussian_ply_field_order(tmp_path, rng):
    """The interchange header must match the reference property order exactly."""
    scene = _random_scene(rng, n=5)
    ply.save_gaussian_ply(scene, tmp_path / "pc.ply")
    v = ply.read_ply(tmp_path / "pc.ply")["vertex"]
    expected = (
        ["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2"]
        + [f"f_rest_{i}" for i in range(45)]
        + ["opacity", "scale_0", "scale_1", "scale_2", "rot_0", "rot_1", "rot_2", "rot_3"]
    )
    assert v.property_names == expected


def test_gaussian_ply_frest_channel_major(tmp_path, rng):
    """f_rest_k columns are channel-major: k = channel*K + coeff
    (reference save_ply transposes [N,K,3] -> [N,3,K] before flattening)."""
    scene = _random_scene(rng, n=3)
    ply.save_gaussian_ply(scene, tmp_path / "pc.ply")
    v = ply.read_ply(tmp_path / "pc.ply")["vertex"]
    sh_rest = np.asarray(scene.sh_rest)[:3]  # [3, 15, 3]
    for ch in range(3):
        for coeff in range(15):
            np.testing.assert_allclose(
                v[f"f_rest_{ch * 15 + coeff}"], sh_rest[:, coeff, ch], rtol=1e-6
            )


def test_gaussian_ply_sh_truncation(tmp_path, rng):
    scene = _random_scene(rng, n=10, max_sh=3)
    ply.save_gaussian_ply(scene, tmp_path / "pc.ply")
    back = ply.load_gaussian_ply(tmp_path / "pc.ply", new_sh_degree=2)
    assert back.max_sh_degree == 2
    assert back.sh_rest.shape[1] == 8
    np.testing.assert_allclose(
        np.asarray(back.sh_rest)[:10], np.asarray(scene.sh_rest)[:10, :8, :], rtol=1e-6
    )
    with pytest.raises(ValueError):
        ply.load_gaussian_ply(tmp_path / "pc.ply", new_sh_degree=4)


def test_gaussian_ply_skips_dead(tmp_path, rng):
    scene = _random_scene(rng, n=20)
    scene = dataclasses.replace(scene, alive=scene.alive.at[5:10].set(False))
    ply.save_gaussian_ply(scene, tmp_path / "pc.ply")
    back = ply.load_gaussian_ply(tmp_path / "pc.ply")
    assert int(back.num_alive()) == 15


# ---------------------------------------------------------------------------
# COLMAP
# ---------------------------------------------------------------------------

def _fake_colmap(dirpath, n_images=6, width=64, height=48):
    rng = np.random.default_rng(7)
    sparse = dirpath / "sparse" / "0"
    sparse.mkdir(parents=True)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", width, height, np.array([60.0, 55.0, width / 2, height / 2]))}
    colmap.write_cameras_binary(sparse / "cameras.bin", cams)
    images = {}
    for i in range(1, n_images + 1):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        images[i] = colmap.ColmapImage(
            i, q, rng.normal(size=3), 1, f"img_{i:03d}.png",
            rng.normal(size=(3, 2)), np.array([1, 2, 3], np.int64),
        )
    colmap.write_images_binary(sparse / "images.bin", images)
    xyz = rng.normal(size=(40, 3))
    rgb = rng.integers(0, 256, (40, 3))
    colmap.write_points3D_binary(sparse / "points3D.bin", xyz, rgb)
    # matching images on disk
    from PIL import Image

    img_dir = dirpath / "images"
    img_dir.mkdir()
    for i in range(1, n_images + 1):
        arr = rng.integers(0, 256, (height, width, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"img_{i:03d}.png")
    return cams, images, xyz, rgb


def test_colmap_binary_roundtrip(tmp_path):
    cams, images, xyz, rgb = _fake_colmap(tmp_path)
    rc = colmap.read_cameras_binary(tmp_path / "sparse/0/cameras.bin")
    assert rc[1].model == "PINHOLE" and rc[1].width == 64
    np.testing.assert_allclose(rc[1].params, cams[1].params)
    ri = colmap.read_images_binary(tmp_path / "sparse/0/images.bin")
    assert set(ri) == set(images)
    for k in images:
        np.testing.assert_allclose(ri[k].qvec, images[k].qvec)
        np.testing.assert_allclose(ri[k].tvec, images[k].tvec)
        assert ri[k].name == images[k].name
        np.testing.assert_array_equal(ri[k].point3D_ids, images[k].point3D_ids)
    rxyz, rrgb, _ = colmap.read_points3D_binary(tmp_path / "sparse/0/points3D.bin")
    np.testing.assert_allclose(rxyz, xyz)
    np.testing.assert_array_equal(rrgb, rgb)


def test_colmap_text_parsers(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 64 48 60.0 55.0 32.0 24.0\n"
    )
    (tmp_path / "images.txt").write_text(
        "# hdr\n1 0.9 0.1 0.2 0.38 1.0 2.0 3.0 1 img.png\n1.0 2.0 5 3.0 4.0 -1\n"
    )
    (tmp_path / "points3D.txt").write_text("# c\n9 1.0 2.0 3.0 10 20 30 0.5 1 0\n")
    cams = colmap.read_cameras_text(tmp_path / "cameras.txt")
    assert cams[1].model == "PINHOLE" and cams[1].height == 48
    ims = colmap.read_images_text(tmp_path / "images.txt")
    assert ims[1].name == "img.png" and ims[1].camera_id == 1
    np.testing.assert_array_equal(ims[1].point3D_ids, [5, -1])
    xyz, rgb, err = colmap.read_points3D_text(tmp_path / "points3D.txt")
    np.testing.assert_allclose(xyz[0], [1, 2, 3])
    np.testing.assert_array_equal(rgb[0], [10, 20, 30])


def test_qvec_rotmat_roundtrip(rng):
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap.qvec2rotmat(q)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(colmap.rotmat2qvec(R), q, atol=1e-8)


# ---------------------------------------------------------------------------
# Scene reading
# ---------------------------------------------------------------------------

def test_read_colmap_scene(tmp_path):
    _fake_colmap(tmp_path)
    info = D.read_colmap_scene(tmp_path, eval_split=True)
    assert len(info.train_cameras) + len(info.test_cameras) == 6
    assert len(info.test_cameras) == 1  # every 8th, 6 images -> index 0 only
    assert info.point_cloud[0].shape == (40, 3)
    assert info.nerf_normalization["radius"] > 0
    # cached points3D.ply was produced
    assert (tmp_path / "sparse/0/points3D.ply").exists()
    # sorted by name
    names = [c.image_name for c in sorted(info.train_cameras + info.test_cameras, key=lambda c: c.image_name)]
    assert names == sorted(names)


def _fake_blender(dirpath, n=4, size=32):
    from PIL import Image

    rng = np.random.default_rng(3)
    frames = []
    for split in ("train", "test"):
        split_frames = []
        d = dirpath / split
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            theta = 2 * np.pi * i / n
            c2w = np.eye(4)
            c2w[:3, 3] = [4 * np.cos(theta), 0.0, 4 * np.sin(theta)]
            # look roughly at origin; keep it simple: standard axes
            split_frames.append({"file_path": f"./{split}/r_{i}", "transform_matrix": c2w.tolist()})
            arr = rng.integers(0, 256, (size, size, 4), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"r_{i}.png")
        (dirpath / f"transforms_{split}.json").write_text(
            json.dumps({"camera_angle_x": 0.7, "frames": split_frames})
        )


def test_read_blender_scene(tmp_path):
    _fake_blender(tmp_path)
    info = D.read_blender_scene(tmp_path, white_background=True, eval_split=True)
    assert len(info.train_cameras) == 4 and len(info.test_cameras) == 4
    assert info.point_cloud[0].shape[0] == 100_000
    # non-eval mode folds test into train
    info2 = D.read_blender_scene(tmp_path, eval_split=False)
    assert len(info2.train_cameras) == 8 and not info2.test_cameras
    assert D.detect_scene_type(tmp_path) == "Blender"


def test_load_camera_resolution(tmp_path):
    _fake_colmap(tmp_path)
    info = D.read_colmap_scene(tmp_path)
    cam = D.load_camera(info.train_cameras[0], resolution=2)
    assert (cam.width, cam.height) == (32, 24)
    assert cam.gt_image.shape == (3, 24, 32)
    assert float(cam.gt_image.max()) <= 1.0
    cam_full = D.load_camera(info.train_cameras[0], resolution=-1)
    assert (cam_full.width, cam_full.height) == (64, 48)


def test_scene_assembly_and_save(tmp_path):
    _fake_colmap(tmp_path)
    model_dir = tmp_path / "out"
    sc = Scene(tmp_path, model_dir, eval_split=True, resolution=2)
    assert (model_dir / "cameras.json").exists()
    assert (model_dir / "input.ply").exists()
    assert sc.cameras_extent > 0
    assert int(sc.gaussians.num_alive()) == 40
    out = sc.save(10)
    assert out.exists()
    # reload at the saved iteration
    sc2 = Scene(tmp_path, model_dir, eval_split=True, resolution=2, load_iteration=-1)
    assert sc2.loaded_iter == 10
    assert int(sc2.gaussians.num_alive()) == 40
    np.testing.assert_allclose(
        np.asarray(sc2.gaussians.means)[:40], np.asarray(sc.gaussians.means)[:40], rtol=1e-6
    )


# ---------------------------------------------------------------------------
# Training checkpoint
# ---------------------------------------------------------------------------

def test_checkpoint_roundtrip(tmp_path, rng):
    scene = _random_scene(rng, n=25)
    state = init_train_state(scene)
    # dirty some optimizer state so the round-trip is non-trivial
    state = dataclasses.replace(
        state,
        step=state.step + 5,
        max_radii2d=state.max_radii2d.at[:25].set(2.0),
    )
    ckpt.save_checkpoint(tmp_path / "chk.npz", state, iteration=123, spatial_lr_scale=3.5)
    back, it, slr = ckpt.load_checkpoint(tmp_path / "chk.npz")
    assert it == 123 and slr == 3.5
    assert int(back.step) == 5
    assert back.scene.active_sh_degree == scene.active_sh_degree
    flat_a = jax.tree_util.tree_leaves(state)
    flat_b = jax.tree_util.tree_leaves(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)


import jax  # noqa: E402  (used in test above)

def test_gaussian_ply_roundtrip_degree0(tmp_path):
    """A fully-distilled degree-0 model has NO f_rest_* fields; save/load must
    round-trip (regression: load_gaussian_ply crashed on np.stack([]))."""
    from lightgaussian_tpu.data.ply import load_gaussian_ply, save_gaussian_ply
    from lightgaussian_tpu.utils.synthetic import random_scene

    scene = random_scene(n=32, seed=9, max_sh_degree=0)
    path = tmp_path / "deg0.ply"
    save_gaussian_ply(scene, path)
    back = load_gaussian_ply(path)
    assert back.max_sh_degree == 0
    assert back.sh_rest.shape[1] == 0
    np.testing.assert_allclose(
        np.asarray(back.means)[np.asarray(back.alive)],
        np.asarray(scene.means)[np.asarray(scene.alive)], atol=1e-6,
    )

