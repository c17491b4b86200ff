"""lightgaussian_tpu — a TPU-native 3D Gaussian Splatting training & compression framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
VITA-Group/LightGaussian (3D-GS training with densification, global-significance
pruning & recovery, SH distillation, VecTree vector quantization, rendering and
evaluation tooling), re-designed for TPU:

- Gaussians live as a fixed-capacity, HBM-resident pytree of arrays with an
  alive-mask; densify/prune are masked scatter passes (static shapes for XLA).
- The differentiable rasterizer is a custom-VJP pipeline: vectorized EWA
  preprocess in jnp, tile binning via ``jax.lax.sort`` over a fixed-capacity
  compact instance buffer, and chunked front-to-back alpha blending as Pallas
  kernels (within-chunk transmittance via log-depth shifted-multiply scans on
  the VPU; gradient accumulation via segment sums — no atomics).
- Multi-chip scaling uses a ``jax.sharding.Mesh`` with camera-batch data
  parallelism and tile-space sharding, gradients reduced with ``psum`` on ICI.
"""

__version__ = "0.1.0"
