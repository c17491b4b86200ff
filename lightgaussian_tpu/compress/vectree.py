"""VecTree quantization: importance-weighted VQ of SH features + the
`extreme_saving/` compressed-checkpoint bundle.

Byte-compatible with the reference's format (`/root/reference/vectree/
vectree.py:100-155` writer, `vectree/utils.py:5-65` reader):

    extreme_saving/
      metadata.npz         {input_pc_num, input_pc_dim, codebook_size, codebook_dim}
      non_vq_mask.npz      packbits(bool[N])   (True = kept un-quantized)
      vq_indexs.npz        packbits(MSB-first log2(K)-bit codes, vq rows only)
      codebook.npz         fp16 [K, sh_dim]
      non_vq_feats.npz     fp16 [n_keep, sh_dim]
      other_attribute.npz  fp16 [N, 8]   (opacity, 3 scale, 4 rot)
      xyz.npz              fp32 [N, 3]
    extreme_saving.zip     (size report)

The full-feature matrix layout matches the interchange PLY column order:
x,y,z,nx,ny,nz,f_dc(3),f_rest(sh_dim-3),opacity,scale(3),rot(4).
"""
from __future__ import annotations

import dataclasses
import json
import math
import zipfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from lightgaussian_tpu.compress import vq as vq_mod


def pack_bits_msb(values: np.ndarray, bits: int) -> np.ndarray:
    """dec2bin (MSB-first) + packbits (`vectree/utils.py:105-111`)."""
    v = values.astype(np.int64)
    shifts = np.arange(bits - 1, -1, -1)
    bin_rows = ((v[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
    return np.packbits(bin_rows.reshape(-1))


def unpack_bits_msb(packed: np.ndarray, count: int, bits: int) -> np.ndarray:
    flat = np.unpackbits(packed)[: count * bits].reshape(count, bits)
    shifts = np.arange(bits - 1, -1, -1)
    return (flat.astype(np.int64) << shifts[None, :]).sum(axis=1)


@dataclasses.dataclass
class VQConfig:
    """CLI knobs of `vectree/vectree.py:10-26`."""

    sh_degree: int = 2
    vq_ratio: float = 0.6
    codebook_size: int = 2**13
    iterations: int = 1000
    chunk: int = 80_000
    k_expire: int = 10
    no_importance: bool = False
    vq_way: str = "half"  # fp16 storage of residual attributes

    @property
    def sh_dim(self) -> int:
        return {3: 48, 2: 27, 1: 12, 0: 3}[self.sh_degree]


def scene_to_feature_matrix(scene) -> np.ndarray:
    """GaussianScene (alive rows) -> the reference's full attribute matrix
    [N, 6 + sh_dim + 8] in interchange column order."""
    alive = np.asarray(scene.alive)
    xyz = np.asarray(scene.means)[alive]
    n = xyz.shape[0]
    sh_dc = np.asarray(scene.sh_dc)[alive]
    sh_rest = np.asarray(scene.sh_rest)[alive]
    f_rest = np.transpose(sh_rest, (0, 2, 1)).reshape(n, -1)
    return np.concatenate(
        [
            xyz,
            np.zeros_like(xyz),
            sh_dc,
            f_rest,
            np.asarray(scene.opacity_logits)[alive][:, None],
            np.asarray(scene.log_scales)[alive],
            np.asarray(scene.quats)[alive],
        ],
        axis=1,
    ).astype(np.float32)


def feature_matrix_to_scene(feats: np.ndarray, capacity: int | None = None):
    """Inverse of `scene_to_feature_matrix` (layout of `write_ply_data`,
    `vectree/utils.py:83-103`)."""
    from lightgaussian_tpu.models import gaussians as G

    n, d = feats.shape
    sh_dim = d - 6 - 8
    k = (sh_dim - 3) // 3
    max_sh = int(round(math.sqrt(k + 1))) - 1
    cap = G.round_capacity(n) if capacity is None else capacity
    scene = G.empty_scene(cap, max_sh_degree=max_sh, active_sh_degree=max_sh)

    def fill(buf, vals):
        return buf.at[:n].set(jnp.asarray(vals, jnp.float32))

    sh_rest = feats[:, 9 : 9 + 3 * k].reshape(n, 3, k).transpose(0, 2, 1)
    return dataclasses.replace(
        scene,
        means=fill(scene.means, feats[:, 0:3]),
        sh_dc=fill(scene.sh_dc, feats[:, 6:9]),
        sh_rest=fill(scene.sh_rest, sh_rest),
        opacity_logits=fill(scene.opacity_logits, feats[:, d - 8]),
        log_scales=fill(scene.log_scales, feats[:, d - 7 : d - 4]),
        quats=fill(scene.quats, feats[:, d - 4 : d]),
        alive=scene.alive.at[:n].set(True),
    )


@dataclasses.dataclass
class QuantizationResult:
    non_vq_mask: np.ndarray  # [N] bool
    vq_indices: np.ndarray  # [n_vq] int
    codebook: np.ndarray  # [K, sh_dim] fp32 (fp16-rounded values)
    size_mb: float


def quantize_features(
    feats: np.ndarray,
    importance: np.ndarray,
    cfg: VQConfig,
    seed: int = 0,
    mesh: "jax.sharding.Mesh | None" = None,
) -> tuple[QuantizationResult, np.ndarray]:
    """The `Quantization.quantize` pipeline (`vectree/vectree.py:166-207`):
    top-(1-ratio) by importance kept raw, codebook trained on the rest with
    importance-weighted EMA + k_expire, final fp16-codebook assignment.

    Returns (result, quantized full feature matrix)."""
    n, d = feats.shape
    assert 6 + cfg.sh_dim + 8 == d, (
        f"sh_degree {cfg.sh_degree} (sh_dim {cfg.sh_dim}) does not match the "
        f"feature width {d} (expected 6 + sh_dim + 8); pass the model's actual "
        "SH degree"
    )
    sh = feats[:, 6 : 6 + cfg.sh_dim]
    imp = np.ones(n) if cfg.no_importance else np.asarray(importance, np.float64)
    assert imp.shape[0] == n, f"importance rows {imp.shape[0]} != features {n}"

    n_keep = int(n * (1.0 - cfg.vq_ratio))
    order = np.argsort(-imp)
    non_vq_mask = np.zeros(n, bool)
    non_vq_mask[order[:n_keep]] = True
    is_percent = imp[non_vq_mask].sum() / max(imp.sum(), 1e-12)
    print(f"IS_percent: {is_percent:.4f}")

    vq_rows = ~non_vq_mask
    sh_vq = jnp.asarray(sh[vq_rows], jnp.float32)
    imp_vq = jnp.asarray(imp[vq_rows], jnp.float32)

    key = jax.random.PRNGKey(seed)
    init_key, train_key = jax.random.split(key)
    state = vq_mod.init_codebook(init_key, cfg.codebook_size, cfg.sh_dim, feats=sh_vq)
    if mesh is not None:
        state = vq_mod.train_codebook_sharded(
            mesh, train_key, state, sh_vq, imp_vq,
            iterations=cfg.iterations, chunk=cfg.chunk, k_expire=cfg.k_expire,
        )
    else:
        state = vq_mod.train_codebook(
            train_key, state, sh_vq, imp_vq,
            iterations=cfg.iterations, chunk=cfg.chunk, k_expire=cfg.k_expire,
        )

    quant_sh, idx_all = vq_mod.quantize_with_fp16_codebook(jnp.asarray(sh, jnp.float32), state.embed)
    quant_sh = np.asarray(quant_sh)
    idx_all = np.asarray(idx_all)

    out = feats.copy()
    out[vq_rows, 6 : 6 + cfg.sh_dim] = quant_sh[vq_rows]
    if cfg.vq_way == "half":
        out[non_vq_mask, 6 : 6 + cfg.sh_dim] = (
            sh[non_vq_mask].astype(np.float16).astype(np.float32)
        )
        out[:, d - 8 :] = out[:, d - 8 :].astype(np.float16).astype(np.float32)

    result = QuantizationResult(
        non_vq_mask=non_vq_mask,
        vq_indices=idx_all[vq_rows],
        codebook=np.asarray(state.embed.astype(jnp.float16).astype(jnp.float32)),
        size_mb=0.0,
    )
    return result, out


def save_extreme(path: str | Path, feats: np.ndarray, result: QuantizationResult, cfg: VQConfig) -> float:
    """Write the `extreme_saving/` bundle + zip; returns size in MB
    (`vectree/vectree.py:104-155`)."""
    path = Path(path)
    out = path / "extreme_saving"
    out.mkdir(parents=True, exist_ok=True)
    n, d = feats.shape
    bits = int(math.log2(cfg.codebook_size))

    metadata = {
        "input_pc_num": n,
        "input_pc_dim": d,
        "codebook_size": cfg.codebook_size,
        "codebook_dim": cfg.sh_dim,
    }
    np.savez_compressed(out / "metadata.npz", metadata=np.array(metadata, dtype=object))
    np.savez_compressed(out / "vq_indexs.npz", pack_bits_msb(result.vq_indices, bits))
    np.savez_compressed(out / "codebook.npz", result.codebook.astype(np.float16))
    np.savez_compressed(out / "non_vq_mask.npz", np.packbits(result.non_vq_mask))
    np.savez_compressed(
        out / "non_vq_feats.npz",
        feats[result.non_vq_mask, 6 : 6 + cfg.sh_dim].astype(np.float16),
    )
    np.savez_compressed(out / "other_attribute.npz", feats[:, d - 8 :].astype(np.float16))
    np.savez_compressed(out / "xyz.npz", feats[:, 0:3].astype(np.float32))

    zpath = path / "extreme_saving.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(out.iterdir()):
            z.write(f, arcname=f"extreme_saving/{f.name}")
    size_mb = zpath.stat().st_size / 1024.0 / 1024.0
    print(f"Size = {size_mb:.2f} MB")
    return size_mb


def load_extreme(path: str | Path) -> np.ndarray:
    """`load_vqgaussian` (`vectree/utils.py:5-65`): rebuild the full [N, D]
    feature matrix from the bundle."""
    path = Path(path)

    def load_f(name, array_name="arr_0", allow_pickle=False):
        return np.load(path / name, allow_pickle=allow_pickle)[array_name]

    metadata = load_f("metadata.npz", array_name="metadata", allow_pickle=True).item()
    k_codes = metadata["codebook_size"]
    sh_dim = metadata["codebook_dim"]
    bits = int(math.log2(k_codes))
    n = metadata["input_pc_num"]
    d = metadata["input_pc_dim"]

    non_vq_mask = np.unpackbits(load_f("non_vq_mask.npz"))[:n].astype(bool)
    vq_mask = ~non_vq_mask
    n_vq = int(vq_mask.sum())

    codebook = load_f("codebook.npz").astype(np.float32)
    vq_idx = unpack_bits_msb(load_f("vq_indexs.npz"), n_vq, bits)
    non_vq_feats = load_f("non_vq_feats.npz").astype(np.float32)
    other = load_f("other_attribute.npz").astype(np.float32)
    xyz = load_f("xyz.npz").astype(np.float32)

    full = np.zeros((n, d), np.float32)
    full[:, 0:3] = xyz
    full[:, d - 8 :] = other
    full[vq_mask, 6 : 6 + sh_dim] = codebook[vq_idx]
    full[non_vq_mask, 6 : 6 + sh_dim] = non_vq_feats
    return full


def load_vq_scene(path: str | Path):
    """Compressed checkpoint -> GaussianScene (`gaussian_model.py:420-461`)."""
    return feature_matrix_to_scene(load_extreme(path))


def quantize_scene(
    scene,
    importance: np.ndarray,
    save_path: str | Path,
    cfg: VQConfig | None = None,
    seed: int = 0,
    mesh=None,
):
    """End-to-end: scene -> VQ -> extreme_saving bundle + dequantized scene.

    `importance` is indexed over alive rows (what imp_score.npz stores) or
    over THIS scene's capacity; any other length is an alignment bug from a
    different scene/checkpoint and is rejected rather than silently mixing
    dead-slot zeros into the keep-set ranking."""
    cfg = cfg or VQConfig()
    feats = scene_to_feature_matrix(scene)
    n = feats.shape[0]
    imp = np.asarray(importance)
    if imp.shape[0] != n:
        alive = np.asarray(scene.alive)
        if imp.shape[0] == alive.shape[0]:
            imp = imp[alive]
        else:
            raise ValueError(
                f"imp_score length {imp.shape[0]} matches neither the scene's "
                f"alive rows ({n}) nor its capacity ({alive.shape[0]}); the "
                "scores were saved from a different checkpoint than input_path"
            )
    result, qfeats = quantize_features(feats, imp, cfg, seed=seed, mesh=mesh)
    result.size_mb = save_extreme(save_path, feats, result, cfg)
    return result, feature_matrix_to_scene(load_extreme(Path(save_path) / "extreme_saving"))
