"""LPIPS perceptual metric — VGG16 feature topology in pure JAX.

Mirrors the reference's `lpipsPyTorch/` (LPIPS v0.1 criterion:
`modules/lpips.py:8-36`, VGG backbone slices `modules/networks.py:36-98`,
input scaling `modules/utils.py` + ImageNet normalization): five relu-block
feature stacks, unit-normalized along channels, squared difference, 1x1
"lin" weighting, spatial mean, summed over stages.

Weights: the reference downloads torchvision VGG16 + richzhang lin weights at
call time (`modules/utils.py:12-33`). This environment has no network egress
and no torchvision, so weights load from a local `.npz` (convert once with
`convert_torch_lpips` on a machine that has them). Without a weights file, a
deterministic seeded random VGG is used — random convolutional features are a
recognized perceptual-metric baseline, but scores are NOT comparable to
published LPIPS numbers, so results are tagged `lpips_kind = "vgg-random"`.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (out_channels, n_convs) per block; relu slices after
# indices 3, 8, 15, 22, 29 of torchvision's features module.
_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
# richzhang input normalization, exactly as the reference applies it
# (`modules/networks.py:40-46` z_score): these shift/scale constants assume
# [-1,1] inputs upstream, but the reference pipeline (like Inria 3D-GS) feeds
# [0,1] images straight in (`metrics.py:75`) — published 3D-GS LPIPS numbers
# carry that quirk, so byte-matching it is the parity requirement
# (cross-validated against the reference torch module in
# tests/test_lpips_parity.py).
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@dataclasses.dataclass(frozen=True)
class LPIPSParams:
    convs: tuple  # tuple of (kernel [kh,kw,cin,cout], bias [cout]) per conv
    lins: tuple  # tuple of [c_stage] per stage (1x1 lin weights, non-negative)
    kind: str  # "vgg-pretrained" | "vgg-random"


jax.tree_util.register_pytree_node(
    LPIPSParams,
    lambda p: ((p.convs, p.lins), p.kind),
    lambda kind, leaves: LPIPSParams(leaves[0], leaves[1], kind),
)


def random_lpips_params(seed: int = 0) -> LPIPSParams:
    """Deterministic random VGG16 features + uniform lin weights."""
    key = jax.random.PRNGKey(seed)
    convs = []
    c_in = 3
    for c_out, n_convs in _VGG_BLOCKS:
        for _ in range(n_convs):
            key, k1 = jax.random.split(key)
            fan_in = 3 * 3 * c_in
            w = jax.random.normal(k1, (3, 3, c_in, c_out), jnp.float32) * np.sqrt(2.0 / fan_in)
            convs.append((w, jnp.zeros((c_out,), jnp.float32)))
            c_in = c_out
    lins = tuple(jnp.full((c,), 1.0 / c, jnp.float32) for c, _ in _VGG_BLOCKS)
    return LPIPSParams(convs=tuple(convs), lins=lins, kind="vgg-random")


def load_lpips_params(path: str | Path) -> LPIPSParams:
    """Load converted weights: conv{i}_w/conv{i}_b (HWIO) + lin{s}."""
    z = np.load(path)
    convs = []
    i = 0
    while f"conv{i}_w" in z:
        convs.append((jnp.asarray(z[f"conv{i}_w"]), jnp.asarray(z[f"conv{i}_b"])))
        i += 1
    lins = tuple(jnp.asarray(z[f"lin{s}"]) for s in range(5))
    return LPIPSParams(convs=tuple(convs), lins=lins, kind="vgg-pretrained")


def convert_torch_lpips(vgg_state: dict, lin_state: dict, out_path: str | Path) -> None:
    """One-time converter from torchvision VGG16 `features` state_dict (OIHW)
    + richzhang `lin` state_dict to our npz layout. Needs torch tensors or
    numpy arrays as values; runs anywhere, saved file is portable."""
    arrays = {}
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i, lid in enumerate(conv_ids):
        w = np.asarray(vgg_state[f"{lid}.weight"])  # [O, I, H, W]
        arrays[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))  # -> HWIO
        arrays[f"conv{i}_b"] = np.asarray(vgg_state[f"{lid}.bias"])
    for s in range(5):
        lw = np.asarray(lin_state[f"lin{s}.model.1.weight"])  # [1, C, 1, 1]
        arrays[f"lin{s}"] = lw.reshape(-1)
    np.savez(out_path, **arrays)


def _vgg_features(params: LPIPSParams, x: jnp.ndarray) -> list[jnp.ndarray]:
    """x: [N, 3, H, W] in [0, 1]. Returns the 5 relu-slice activations."""
    shift = jnp.asarray(_LPIPS_SHIFT).reshape(1, 3, 1, 1)
    scale = jnp.asarray(_LPIPS_SCALE).reshape(1, 3, 1, 1)
    h = (x - shift) / scale

    feats = []
    ci = 0
    for b, (c_out, n_convs) in enumerate(_VGG_BLOCKS):
        for _ in range(n_convs):
            w, bias = params.convs[ci]
            ci += 1
            h = jax.lax.conv_general_dilated(
                h, w, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"),
            ) + bias.reshape(1, -1, 1, 1)
            h = jax.nn.relu(h)
        feats.append(h)
        if b < len(_VGG_BLOCKS) - 1:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
    return feats


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
    return f / (norm + eps)


@partial(jax.jit, static_argnames=())
def lpips(params: LPIPSParams, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance between [N,3,H,W] (or [3,H,W]) images in [0,1]."""
    if x.ndim == 3:
        x, y = x[None], y[None]
    fx = _vgg_features(params, x)
    fy = _vgg_features(params, y)
    total = 0.0
    for f1, f2, lin in zip(fx, fy, params.lins):
        d = (_unit_normalize(f1) - _unit_normalize(f2)) ** 2
        weighted = jnp.einsum("nchw,c->nhw", d, lin)
        total = total + weighted.mean(axis=(1, 2))
    return total.mean()


_DEFAULT_WEIGHTS = Path(__file__).parent / "weights" / "lpips_vgg.npz"
_CACHED: dict[str, LPIPSParams] = {}


def get_lpips_params(weights_path: str | Path | None = None) -> LPIPSParams:
    """Pretrained params if a weights file exists (argument, default location,
    or $LPIPS_WEIGHTS), else the seeded random fallback."""
    import os

    path = weights_path or os.environ.get("LPIPS_WEIGHTS") or _DEFAULT_WEIGHTS
    key = str(path)
    if key not in _CACHED:
        if Path(path).exists():
            _CACHED[key] = load_lpips_params(path)
        else:
            _CACHED[key] = random_lpips_params()
    return _CACHED[key]
