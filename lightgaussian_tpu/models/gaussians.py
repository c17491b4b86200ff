"""GaussianScene: the model state as a fixed-capacity pytree of arrays.

TPU-native replacement for the reference's mutable `GaussianModel`
(`/root/reference/scene/gaussian_model.py:27-176`). Instead of reallocating
tensors on every densify/prune (which would retrace/recompile under XLA), the
scene has a static capacity `N_max` and a boolean `alive` mask:

- prune     -> `alive &= keep` (one vector op)
- densify   -> masked scatter of clones/splits into free slots
- render    -> dead Gaussians are culled in preprocess (opacity forced to 0)

Parameterization matches the reference: log-scales (exp activation), logit
opacity (sigmoid), unnormalized quaternion (normalized in the covariance
builder), SH split into a DC band and `rest` coefficients
(`gaussian_model.py:28-60,97-123`).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lightgaussian_tpu.ops import knn, sh as sh_ops


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianScene:
    means: jnp.ndarray  # [N_max, 3]
    sh_dc: jnp.ndarray  # [N_max, 3]
    sh_rest: jnp.ndarray  # [N_max, K, 3], K = (max_sh+1)^2 - 1
    log_scales: jnp.ndarray  # [N_max, 3]
    quats: jnp.ndarray  # [N_max, 4] (w, x, y, z)
    opacity_logits: jnp.ndarray  # [N_max]
    alive: jnp.ndarray  # [N_max] bool
    active_sh_degree: int = dataclasses.field(metadata=dict(static=True))
    max_sh_degree: int = dataclasses.field(metadata=dict(static=True))

    # ---- derived quantities (activations, gaussian_model.py:28-43) ----
    @property
    def capacity(self) -> int:
        return int(self.means.shape[0])

    @property
    def scales(self) -> jnp.ndarray:
        return jnp.exp(self.log_scales)

    @property
    def opacities(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity_logits)

    @property
    def sh_coeffs(self) -> jnp.ndarray:
        """[N, (max_sh+1)^2, 3] full SH tensor (dc ++ rest)."""
        return jnp.concatenate([self.sh_dc[:, None, :], self.sh_rest], axis=1)

    def num_alive(self) -> jnp.ndarray:
        return self.alive.sum()

    # ---- trainable-parameter view ----
    PARAM_FIELDS = ("means", "sh_dc", "sh_rest", "log_scales", "quats", "opacity_logits")

    def params(self) -> dict[str, jnp.ndarray]:
        return {k: getattr(self, k) for k in self.PARAM_FIELDS}

    def with_params(self, params: dict[str, jnp.ndarray]) -> "GaussianScene":
        return dataclasses.replace(self, **params)

    # ---- SH degree schedule (gaussian_model.py:125-136) ----
    def one_up_sh_degree(self) -> "GaussianScene":
        if self.active_sh_degree < self.max_sh_degree:
            return dataclasses.replace(self, active_sh_degree=self.active_sh_degree + 1)
        return self

    def truncate_sh(self, new_max_degree: int) -> "GaussianScene":
        """Drop SH coefficients above `new_max_degree` — the distillation
        student init (`gaussian_model.py:129-136`, `distill_train.py:73-80`)."""
        k_new = sh_ops.num_sh_coeffs(new_max_degree) - 1
        return dataclasses.replace(
            self,
            sh_rest=self.sh_rest[:, :k_new, :],
            max_sh_degree=new_max_degree,
            active_sh_degree=min(self.active_sh_degree, new_max_degree),
        )


def empty_scene(capacity: int, max_sh_degree: int = 3, active_sh_degree: int = 0) -> GaussianScene:
    k_rest = sh_ops.num_sh_coeffs(max_sh_degree) - 1
    z = jnp.zeros
    return GaussianScene(
        means=z((capacity, 3), jnp.float32),
        sh_dc=z((capacity, 3), jnp.float32),
        sh_rest=z((capacity, k_rest, 3), jnp.float32),
        log_scales=z((capacity, 3), jnp.float32),
        quats=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32), (capacity, 1)),
        opacity_logits=jnp.full((capacity,), -10.0, jnp.float32),
        alive=jnp.zeros((capacity,), bool),
        active_sh_degree=active_sh_degree,
        max_sh_degree=max_sh_degree,
    )


def round_capacity(n: int, granule: int = 4096) -> int:
    """Bucket capacities so densify-triggered reallocation recompiles rarely."""
    return max(granule, ((n + granule - 1) // granule) * granule)


def from_point_cloud(
    points: np.ndarray,
    colors: np.ndarray,
    max_sh_degree: int = 3,
    capacity: int | None = None,
    initial_opacity: float = 0.1,
) -> GaussianScene:
    """Initialize from an SfM point cloud, matching `create_from_pcd`
    (`gaussian_model.py:138-177`): DC SH from RGB, isotropic log-scale from the
    sqrt of the mean 3-NN squared distance, identity rotation, opacity 0.1."""
    n = points.shape[0]
    cap = round_capacity(n) if capacity is None else capacity
    assert cap >= n
    scene = empty_scene(cap, max_sh_degree)

    pts = jnp.asarray(points, jnp.float32)
    # host (native C++) KNN: points arrive as host numpy here, and init-time
    # device dispatch is wasteful on a remote-attached TPU
    dist2 = jnp.clip(
        jnp.asarray(knn.mean_sq_dist_to_3nn_host(np.asarray(points))), 1e-7, None
    )
    log_scale = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    sh_dc = sh_ops.rgb_to_sh(jnp.asarray(colors, jnp.float32))
    opacity_logit = float(np.log(initial_opacity / (1.0 - initial_opacity)))

    def fill(buf, vals):
        return buf.at[:n].set(vals)

    return dataclasses.replace(
        scene,
        means=fill(scene.means, pts),
        sh_dc=fill(scene.sh_dc, sh_dc),
        log_scales=fill(scene.log_scales, log_scale),
        opacity_logits=fill(scene.opacity_logits, jnp.full((n,), opacity_logit)),
        alive=fill(scene.alive, jnp.ones((n,), bool)),
    )


def compact(scene: GaussianScene, new_capacity: int | None = None) -> GaussianScene:
    """Pack alive Gaussians to the front (optionally into a new capacity).

    Used before checkpoint export and when growing/shrinking capacity. Runs as a
    single sort-by-dead-flag gather — stable, so relative order is preserved.
    """
    order = jnp.argsort(~scene.alive, stable=True)  # alive first
    n_alive = scene.alive.sum()
    cap = scene.capacity if new_capacity is None else new_capacity

    def reorder(x):
        x = x[order]
        if cap <= scene.capacity:
            return x[:cap]
        pad = [(0, cap - scene.capacity)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)

    new = jax.tree.map(reorder, scene.params())
    alive = jnp.arange(cap) < n_alive
    return dataclasses.replace(scene, alive=alive, **new)
