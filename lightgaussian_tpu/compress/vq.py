"""Importance-weighted vector quantization — TPU-native EMA codebook.

Replaces the vendored lucidrains `VectorQuantize` used by the reference
(`/root/reference/vectree/vq.py:262-299`) with a jitted implementation designed
for the MXU: nearest-code search is one [chunk, D] x [D, K] matmul
(argmin of ||x||^2 - 2 x.E^T + ||E||^2), cluster statistics are unsorted
segment-sums, and the whole training loop is a `lax.fori_loop` over random
chunks so the 1000-iteration codebook fit runs as a single XLA program.

Semantics preserved from the reference:
- weights normalized to mean 1 over the batch (`vq.py:263-264`)
- EMA(decay) of cluster_size and of the embedding itself, with
  Laplace-smoothed cluster sizes (`vq.py:284-298`)
- k_expire: after each step the k least-used codes are overwritten by the k
  most-important vectors of the current chunk (`vectree/vectree.py:202-204`)

The dormant torch.distributed all-reduce of (cluster_size, embed_sum) in the
reference (`vq.py:288,295`) becomes an optional `jax.lax.psum` over a mesh
axis — see `train_codebook_sharded`.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

DECAY = 0.8
EPS = 1e-5


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CodebookState:
    embed: jnp.ndarray  # [K, D] current codebook (embed_avg / smoothed size)
    embed_avg: jnp.ndarray  # [K, D] EMA of weighted assigned-vector sums
    cluster_size: jnp.ndarray  # [K] EMA of (weighted) assignment counts


def init_codebook(key: jax.Array, codebook_size: int, dim: int, feats: jnp.ndarray | None = None) -> CodebookState:
    """Initialize from random data samples when `feats` is given (the healthy
    analogue of the reference's kmeans-free uniform init), else small uniform."""
    if feats is not None and feats.shape[0] > 0:
        idx = jax.random.randint(key, (codebook_size,), 0, feats.shape[0])
        embed = feats[idx]
    else:
        embed = jax.random.uniform(key, (codebook_size, dim), minval=-1.0, maxval=1.0)
    embed = embed.astype(jnp.float32)
    # cluster_size starts at 1 so embed == embed_avg / cluster_size holds from
    # step 0; starting at 0 makes the first ratio (0.8 + 0.2c)/(0.2c) overshoot
    # every code by ~3x and scramble the initial assignments.
    return CodebookState(
        embed=embed,
        embed_avg=embed,
        cluster_size=jnp.ones((codebook_size,), jnp.float32),
    )


def nearest_code(feats: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """argmin_k ||x - e_k||^2 via the MXU: one [N,D]x[D,K] matmul."""
    x2 = jnp.sum(feats * feats, axis=1, keepdims=True)
    e2 = jnp.sum(embed * embed, axis=1)[None, :]
    dist = x2 - 2.0 * (feats @ embed.T) + e2
    return jnp.argmin(dist, axis=1)


def _ema_step(state: CodebookState, chunk: jnp.ndarray, weight: jnp.ndarray, k_expire: int, axis_name: str | None = None) -> CodebookState:
    k_codes = state.embed.shape[0]
    # An all-zero-importance chunk (common: VQ candidates are the LEAST
    # important Gaussians, whose GSS can be exactly 0) degrades to unweighted
    # VQ instead of poisoning the codebook with 0/0 NaNs.
    wsum = weight.sum()
    w = jnp.where(wsum > 0.0, weight * (weight.size / jnp.maximum(wsum, 1e-12)), 1.0)

    idx = nearest_code(chunk, state.embed)
    cluster_batch = jax.ops.segment_sum(w, idx, num_segments=k_codes)
    embed_sum = jax.ops.segment_sum(chunk * w[:, None], idx, num_segments=k_codes)
    if axis_name is not None:
        cluster_batch = jax.lax.psum(cluster_batch, axis_name)
        embed_sum = jax.lax.psum(embed_sum, axis_name)

    # Two-accumulator EMA — a DELIBERATE divergence from the reference
    # (`vq.py:284-298` EMAs the embedding toward each chunk's ratio
    # embed_sum/smoothed(EMA(cluster_size)); its embed_avg buffer is never
    # EMA-updated). We EMA the numerator (embed_avg) and denominator
    # (cluster_size) SEPARATELY and take their ratio — the standard VQ-VAE
    # form, better suited to chunked updates: EMA-ing the per-chunk ratio
    # injects multiplicative sampling noise (count_now / EMA(count)) that
    # walks codes off their data. Recorded in PARITY.md.
    cluster_size = state.cluster_size * DECAY + cluster_batch * (1.0 - DECAY)
    embed_avg = state.embed_avg * DECAY + embed_sum * (1.0 - DECAY)
    n = cluster_size.sum()
    smoothed = (cluster_size + EPS) / (n + k_codes * EPS) * n
    embed = embed_avg / jnp.maximum(smoothed, 1e-12)[:, None]

    if k_expire > 0:
        _, dead = jax.lax.top_k(-cluster_size, k_expire)
        wk, important = jax.lax.top_k(w, k_expire)
        cand = chunk[important]
        if axis_name is not None:
            # keep the codebook replicated: pool per-device top-k candidates
            # and take the global top-k (identical on every device)
            cand = jax.lax.all_gather(cand, axis_name).reshape(-1, chunk.shape[1])
            wk = jax.lax.all_gather(wk, axis_name).reshape(-1)
            _, sel = jax.lax.top_k(wk, k_expire)
            cand = cand[sel]
        # Revived codes get average inertia so one later no-assignment chunk
        # doesn't immediately drag them away from the candidate vector.
        c0 = jnp.maximum(n / k_codes, 1.0)
        embed = embed.at[dead].set(cand)
        embed_avg = embed_avg.at[dead].set(cand * c0)
        cluster_size = cluster_size.at[dead].set(c0)

    return CodebookState(embed=embed, embed_avg=embed_avg, cluster_size=cluster_size)


@partial(jax.jit, static_argnames=("iterations", "chunk", "k_expire"))
def train_codebook(
    key: jax.Array,
    state: CodebookState,
    feats: jnp.ndarray,  # [M, D] vectors to be quantized
    importance: jnp.ndarray,  # [M]
    iterations: int = 1000,
    chunk: int = 80_000,
    k_expire: int = 10,
) -> CodebookState:
    """The codebook-fitting loop of `vectree/vectree.py:187-204` as one XLA
    program: `iterations` x (sample chunk, weighted EMA update, expire)."""
    k_expire = min(k_expire, state.embed.shape[0])

    def body(i, carry):
        state, key = carry
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (chunk,), 0, feats.shape[0])
        state = _ema_step(state, feats[idx], importance[idx], k_expire)
        return state, key

    state, _ = jax.lax.fori_loop(0, iterations, body, (state, key))
    return state


def train_codebook_sharded(
    mesh: jax.sharding.Mesh,
    key: jax.Array,
    state: CodebookState,
    feats: jnp.ndarray,
    importance: jnp.ndarray,
    iterations: int = 1000,
    chunk: int = 80_000,
    k_expire: int = 10,
    axis: str = "data",
):
    """Data-sharded codebook training: each device samples from its local shard
    of `feats`; cluster statistics are psum'd over the mesh axis — the active
    version of the reference's dormant DDP hooks (`vq.py:288-295`)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis]
    local_chunk = max(1, chunk // n_dev)
    k_expire = min(k_expire, state.embed.shape[0])

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def run(keys, state, feats_local, imp_local):
        key = keys[0]

        def body(i, carry):
            state, key = carry
            key, sub = jax.random.split(key)
            idx = jax.random.randint(sub, (local_chunk,), 0, feats_local.shape[0])
            state = _ema_step(state, feats_local[idx], imp_local[idx], k_expire, axis_name=axis)
            return state, key

        state, _ = jax.lax.fori_loop(0, iterations, body, (state, key))
        return state

    keys = jax.random.split(key, n_dev)
    sharding = NamedSharding(mesh, P(axis))
    # Pad by REPEATING real rows (not zeros): a zero-padded row carries
    # importance 0, but if a sampled chunk were all-padding the wsum>0
    # fallback in `_ema_step` would hand every pad row weight 1.0 and pull
    # codes toward the zero vector. Repeated rows are legitimate data.
    pad = (-feats.shape[0]) % n_dev
    if pad:
        rep = jnp.arange(pad) % feats.shape[0]
        feats = jnp.concatenate([feats, feats[rep]], axis=0)
        importance = jnp.concatenate([importance, importance[rep]], axis=0)
    feats = jax.device_put(feats, sharding)
    importance = jax.device_put(importance, sharding)
    return run(keys, state, feats, importance)


@jax.jit
def quantize_with_fp16_codebook(feats: jnp.ndarray, embed: jnp.ndarray):
    """Final assignment pass with the fp16-rounded codebook
    (`vectree/vectree.py:80-97`): returns (quantized feats fp16->fp32, indices)."""
    embed_h = embed.astype(jnp.float16).astype(jnp.float32)
    idx = nearest_code(feats, embed_h)
    return embed_h[idx], idx
