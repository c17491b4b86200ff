"""Native C++ host library: parity with the pure-Python/numpy/XLA paths."""
import numpy as np
import pytest

from lightgaussian_tpu import native
from lightgaussian_tpu.compress import vectree as vt
from lightgaussian_tpu.data import colmap

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def _fake_sparse(tmp_path, n_images=5, n_points=200, seed=0):
    rng = np.random.default_rng(seed)
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    images = {}
    for i in range(1, n_images + 1):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        m = rng.integers(0, 50)
        images[i] = colmap.ColmapImage(
            i, q, rng.normal(size=3), 1, f"frame_{i:04d}.jpg",
            rng.normal(size=(m, 2)), rng.integers(-1, 1000, m).astype(np.int64),
        )
    colmap.write_images_binary(sparse / "images.bin", images)
    xyz = rng.normal(size=(n_points, 3))
    rgb = rng.integers(0, 256, (n_points, 3))
    colmap.write_points3D_binary(sparse / "points3D.bin", xyz, rgb)
    return sparse, images, xyz, rgb


def test_images_bin_native_vs_python(tmp_path):
    sparse, images, _, _ = _fake_sparse(tmp_path)
    recs = native.parse_images_bin(sparse / "images.bin")
    assert recs is not None and len(recs) == len(images)
    for image_id, qvec, tvec, camera_id, name, xys, ids in recs:
        ref = images[image_id]
        np.testing.assert_allclose(qvec, ref.qvec)
        np.testing.assert_allclose(tvec, ref.tvec)
        assert camera_id == ref.camera_id and name == ref.name
        np.testing.assert_allclose(xys, np.asarray(ref.xys).reshape(-1, 2))
        np.testing.assert_array_equal(ids, ref.point3D_ids)


def test_points3d_bin_native_vs_python(tmp_path):
    sparse, _, xyz, rgb = _fake_sparse(tmp_path)
    out = native.parse_points3d_bin(sparse / "points3D.bin")
    assert out is not None
    np.testing.assert_allclose(out[0], xyz)
    np.testing.assert_array_equal(out[1], rgb)


def test_reader_dispatch_uses_native_and_falls_back(tmp_path, monkeypatch):
    sparse, images, xyz, _ = _fake_sparse(tmp_path, seed=1)
    via_native = colmap.read_images_binary(sparse / "images.bin")
    monkeypatch.setenv("LG_DISABLE_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_failed", False)
    assert not native.available()
    via_python = colmap.read_images_binary(sparse / "images.bin")
    assert set(via_native) == set(via_python)
    for k in via_native:
        np.testing.assert_allclose(via_native[k].qvec, via_python[k].qvec)
        np.testing.assert_array_equal(
            via_native[k].point3D_ids, via_python[k].point3D_ids
        )
        assert via_native[k].name == via_python[k].name
    # monkeypatch auto-restores all patched attributes at teardown


def test_truncated_images_bin_rejected(tmp_path):
    sparse, _, _, _ = _fake_sparse(tmp_path)
    raw = (sparse / "images.bin").read_bytes()
    (sparse / "bad.bin").write_bytes(raw[: len(raw) // 2])
    assert native.parse_images_bin(sparse / "bad.bin") is None


def test_knn_native_matches_exact_small():
    rng = np.random.default_rng(0)
    pts = rng.random((50, 3)).astype(np.float32)
    d = native.knn3_mean_sq_dist(pts, window=49)  # window covers all -> exact
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    exact = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(d, exact, rtol=1e-5)


def test_knn_native_never_underestimates():
    rng = np.random.default_rng(1)
    pts = rng.random((3000, 3)).astype(np.float32)
    d = native.knn3_mean_sq_dist(pts)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    exact = np.sort(d2, axis=1)[:, :3].mean(1)
    # approximation can only overestimate (modulo f32 rounding)
    assert (d >= exact * (1.0 - 1e-5)).all()
    rel = np.abs(d - exact) / exact
    assert rel.mean() < 0.5


def test_knn_host_entry(monkeypatch):
    from lightgaussian_tpu.ops import knn

    pts = np.random.default_rng(2).random((500, 3)).astype(np.float32)
    d_host = knn.mean_sq_dist_to_3nn_host(pts)
    assert d_host.shape == (500,) and np.isfinite(d_host).all()


def test_bit_packing_native_vs_numpy():
    rng = np.random.default_rng(3)
    for bits in (1, 5, 8, 13, 16):
        vals = rng.integers(0, 2**bits, 777).astype(np.uint32)
        p_nat = native.pack_bits_msb(vals, bits)
        p_np = vt.pack_bits_msb(vals, bits)
        np.testing.assert_array_equal(p_nat, p_np)
        u_nat = native.unpack_bits_msb(p_np, 777, bits)
        np.testing.assert_array_equal(u_nat, vals)
