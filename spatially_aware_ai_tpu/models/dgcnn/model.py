"""DGCNN point-cloud classifier in Flax (EdgeConv + dynamic kNN graphs).

The reference fine-tunes an external `dgcnn` package on the fly for in-situ
object re-identification (clip_seem_fusion.py:142-158); the package is absent
from the snapshot, so this is a from-scratch implementation of the standard
DGCNN-cls architecture (Wang et al. 2019) sized by the reference's hparams:
emb_dims=1024, k_neighbors=20, dropout=0.5, output_channels=50, num_points=30.

TPU notes: the kNN graph build is one [B, N, N] pairwise-distance matmul on
the MXU followed by top_k (N=30 points — tiny); EdgeConv MLPs are dense
matmuls over [B, N, k] neighborhoods. Everything is static-shaped: the label
space is padded to `output_channels` so adding user labels never recompiles.
A custom Pallas kNN/EdgeConv kernel (SURVEY.md §7.1-4c's suggestion) would
LOSE here: at N=30 the whole graph build is a single sub-tile matmul, far
below kernel launch + Mosaic padding overheads — XLA's fusion of the
distance matrix into top_k is already optimal at this size.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DGCNNConfig:
    in_channels: int = 518  # xyz(3) + rgb(3) + clip(512)
    k_neighbors: int = 20
    emb_dims: int = 1024
    dropout: float = 0.5
    output_channels: int = 50
    num_points: int = 30


def knn_graph(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x [B, N, C] -> neighbor indices [B, N, k] (excluding padding logic;
    self-neighbor included like the standard implementation)."""
    # pairwise squared distances via the |a|^2 - 2ab + |b|^2 expansion (MXU)
    inner = jnp.einsum("bnc,bmc->bnm", x, x)
    sq = jnp.sum(x * x, axis=-1)
    d2 = sq[:, :, None] - 2 * inner + sq[:, None, :]
    _, idx = jax.lax.top_k(-d2, k)
    return idx


def gather_neighbors(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x [B, N, C], idx [B, N, k] -> [B, N, k, C]."""
    return jnp.take_along_axis(x[:, :, None, :], idx[..., None], axis=1)


class EdgeConv(nn.Module):
    out_channels: int
    k: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        """x [B, N, C] -> [B, N, out_channels] with dynamic graph on x."""
        idx = knn_graph(x, self.k)
        xj = gather_neighbors(x, idx)  # [B, N, k, C]
        xi = jnp.broadcast_to(x[:, :, None, :], xj.shape)
        h = jnp.concatenate([xi, xj - xi], axis=-1)
        h = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        return h.max(axis=2)


class DGCNN(nn.Module):
    cfg: DGCNNConfig = DGCNNConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points [B, N, C_in] -> logits [B, output_channels]."""
        c = self.cfg
        k = min(c.k_neighbors, points.shape[1])
        x1 = EdgeConv(64, k, self.dtype)(points, train)
        x2 = EdgeConv(64, k, self.dtype)(x1, train)
        x3 = EdgeConv(128, k, self.dtype)(x2, train)
        x4 = EdgeConv(256, k, self.dtype)(x3, train)
        x = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # [B, N, 512]
        x = nn.Dense(c.emb_dims, use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = jnp.concatenate([x.max(axis=1), x.mean(axis=1)], axis=-1)
        x = nn.Dense(512, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Dropout(self.cfg.dropout, deterministic=not train)(x)
        x = nn.Dense(256)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Dropout(self.cfg.dropout, deterministic=not train)(x)
        return nn.Dense(c.output_channels)(x)
