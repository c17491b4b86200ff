"""Cross-validation of `eval/lpips.py` against the reference's torch LPIPS.

Imports the reference's ACTUAL criterion (`/root/reference/lpipsPyTorch/
modules/lpips.py:8-36` + `networks.py:36-98`) on CPU. This box has no
torchvision and no egress, so:
- `torchvision.models` is stubbed with a VGG16 `features` Sequential of the
  standard topology carrying seeded random weights, and
- `get_state_dict` (which downloads richzhang lin weights) is monkeypatched
  to return seeded random 1x1 lin weights.

The SAME weights are then converted into our npz layout via
`convert_torch_lpips` and loaded into the pure-JAX implementation; both sides
must agree to float tolerance on random image pairs. Weight values are
arbitrary — what this gates is the full computational graph: input
normalization quirk, conv/pool topology, relu slice points, channel
unit-normalization, lin weighting, spatial/stage reduction.
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (REF / "lpipsPyTorch" / "modules" / "lpips.py").exists(),
    reason="reference checkout not available",
)


def _vgg16_features_topology() -> "torch.nn.Sequential":
    """torchvision vgg16().features: 13 convs / 5 maxpools, 31 modules."""
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, c_in = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers += [nn.Conv2d(c_in, v, kernel_size=3, padding=1), nn.ReLU(inplace=False)]
            c_in = v
    return nn.Sequential(*layers)


@pytest.fixture(scope="module")
def ref_criterion_and_weights():
    """The reference LPIPS criterion (vgg) + the raw weight dicts we injected."""
    g = torch.Generator().manual_seed(0)
    features = _vgg16_features_topology()
    with torch.no_grad():
        for m in features:
            if isinstance(m, torch.nn.Conv2d):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.1)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.01)

    # --- stub torchvision so the reference module imports ---
    fake_models = types.SimpleNamespace(
        vgg16=lambda weights=None: types.SimpleNamespace(features=features),
        VGG16_Weights=types.SimpleNamespace(IMAGENET1K_V1="IMAGENET1K_V1"),
    )
    fake_tv = types.ModuleType("torchvision")
    fake_tv.models = fake_models
    saved = {k: sys.modules.get(k) for k in ("torchvision", "torchvision.models")}
    sys.modules["torchvision"] = fake_tv
    sys.modules["torchvision.models"] = fake_models  # for `from torchvision import models`
    sys.path.insert(0, str(REF))
    try:
        for mod in list(sys.modules):
            if mod.startswith("lpipsPyTorch"):
                del sys.modules[mod]
        import lpipsPyTorch.modules.lpips as ref_lpips_mod

        # random richzhang-style lin weights (non-negative, like the real ones)
        n_channels = [64, 128, 256, 512, 512]
        lin_raw = {}
        lin_state = {}
        for s, c in enumerate(n_channels):
            w = torch.rand((1, c, 1, 1), generator=g) * 0.05
            lin_raw[f"lin{s}.model.1.weight"] = w
            lin_state[f"{s}.1.weight"] = w  # keys after get_state_dict's renaming
        orig = ref_lpips_mod.get_state_dict
        ref_lpips_mod.get_state_dict = lambda net_type="alex", version="0.1": lin_state
        try:
            criterion = ref_lpips_mod.LPIPS(net_type="vgg")
        finally:
            ref_lpips_mod.get_state_dict = orig
        vgg_state = {k: v.clone() for k, v in features.state_dict().items()}
        yield criterion, vgg_state, lin_raw
    finally:
        sys.path.remove(str(REF))
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_lpips_matches_reference_torch_module(ref_criterion_and_weights, tmp_path):
    from lightgaussian_tpu.eval.lpips import load_lpips_params, convert_torch_lpips, lpips

    criterion, vgg_state, lin_raw = ref_criterion_and_weights
    npz = tmp_path / "lpips_shared.npz"
    convert_torch_lpips(vgg_state, lin_raw, npz)
    params = load_lpips_params(npz)
    assert params.kind == "vgg-pretrained"

    rng = np.random.default_rng(42)
    for h, w in [(64, 64), (48, 80), (37, 53)]:  # incl. odd sizes (pool floors)
        x = rng.random((1, 3, h, w), dtype=np.float32)
        y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)
        with torch.no_grad():
            ref_val = float(criterion(torch.from_numpy(x), torch.from_numpy(y)).item())
        ours = float(lpips(params, x, y))
        np.testing.assert_allclose(ours, ref_val, rtol=2e-4, atol=2e-6)


def test_lpips_identity_zero(ref_criterion_and_weights, tmp_path):
    from lightgaussian_tpu.eval.lpips import load_lpips_params, convert_torch_lpips, lpips

    _, vgg_state, lin_raw = ref_criterion_and_weights
    npz = tmp_path / "lpips_shared.npz"
    convert_torch_lpips(vgg_state, lin_raw, npz)
    params = load_lpips_params(npz)
    x = np.random.default_rng(7).random((1, 3, 32, 32), dtype=np.float32)
    assert float(lpips(params, x, x)) == pytest.approx(0.0, abs=1e-7)
