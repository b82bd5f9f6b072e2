"""Fourier-feature position autoencoder (side experiment).

JAX port of the reference examples/autoencoder.py:50-262: an MLP
autoencoder over gaussian positions using random sin/cos projections
(Fourier features) as the input encoding.  Not splatting-coupled — kept for
capability parity with the reference examples (SURVEY.md §2.8).

Usage: python examples/autoencoder.py [--n 10000] [--steps 500]
"""

from __future__ import annotations

import argparse
import math
from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def init_mlp(key, sizes: Sequence[int], output_scale: float | None = None):
  """List of (W, b) with He-style init (reference linear(), :12-19)."""
  params = []
  keys = jax.random.split(key, len(sizes) - 1)
  for i, k in enumerate(keys):
    fan_in = sizes[i]
    std = (output_scale if (output_scale is not None
                            and i == len(keys) - 1)
           else 1.0 / math.sqrt(fan_in))
    w = jax.random.normal(k, (sizes[i], sizes[i + 1])) * std
    b = jnp.zeros((sizes[i + 1],))
    params.append((w, b))
  return params


def mlp_apply(params, x, activation=jax.nn.relu):
  for i, (w, b) in enumerate(params):
    x = x @ w + b
    if i < len(params) - 1:
      x = activation(x)
  return x


def sincos(x):
  """Fourier feature lift (reference SinCos, :64-72)."""
  return jnp.concatenate([jnp.sin(x), jnp.cos(x)], -1)


def random_projections(key, in_dim: int, n_proj: int, scale: float = 4.0):
  """Random frequency matrix (reference RandomProjections, :79+)."""
  return jax.random.normal(key, (in_dim, n_proj)) * scale


def make_autoencoder(key, in_dim=2, latent=8, n_proj=64,
                     hidden: List[int] = (128, 128)):
  k1, k2, k3 = jax.random.split(key, 3)
  proj = random_projections(k1, in_dim, n_proj)
  encoder = init_mlp(k1, [2 * n_proj, *hidden, latent])
  decoder = init_mlp(k2, [latent, *hidden, in_dim], output_scale=1e-2)
  return dict(proj=proj, encoder=encoder, decoder=decoder)


def encode(params, x):
  feats = sincos(x @ params["proj"])
  return mlp_apply(params["encoder"], feats)


def decode(params, z):
  return mlp_apply(params["decoder"], z)


def forward(params, x):
  z = encode(params, x)
  return z, decode(params, z)


def train(n=10_000, steps=500, lr=3e-3, seed=0, verbose=True):
  key = jax.random.PRNGKey(seed)
  k_data, k_model = jax.random.split(key)
  positions = jax.random.uniform(k_data, (n, 2)) * 2.0 - 1.0

  params = make_autoencoder(k_model)

  def loss_fn(params, x):
    _, recon = forward(params, x)
    return jnp.mean((recon - x) ** 2)

  @jax.jit
  def step(params, opt_state, x):
    loss, grads = jax.value_and_grad(loss_fn)(params, x)
    m, v, t = opt_state
    t = t + 1
    m = jax.tree.map(lambda m_, g: 0.9 * m_ + 0.1 * g, m, grads)
    v = jax.tree.map(lambda v_, g: 0.999 * v_ + 0.001 * g * g, v, grads)
    mh = jax.tree.map(lambda m_: m_ / (1 - 0.9 ** t), m)
    vh = jax.tree.map(lambda v_: v_ / (1 - 0.999 ** t), v)
    params = jax.tree.map(
        lambda p, m_, v_: p - lr * m_ / (jnp.sqrt(v_) + 1e-8), params, mh, vh)
    return params, (m, v, t), loss

  opt_state = (jax.tree.map(jnp.zeros_like, params),
               jax.tree.map(jnp.zeros_like, params), jnp.int32(0))
  loss = None
  for i in range(steps):
    params, opt_state, loss = step(params, opt_state, positions)
    if verbose and (i + 1) % 100 == 0:
      print(f"step {i + 1}: loss {float(loss):.6f}")
  return params, float(loss)


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument("--n", type=int, default=10_000)
  parser.add_argument("--steps", type=int, default=500)
  parser.add_argument("--lr", type=float, default=1e-3)
  args = parser.parse_args(argv)
  _, loss = train(args.n, args.steps, args.lr)
  print(f"final reconstruction loss: {loss:.6f}")
  return loss


if __name__ == "__main__":
  main()
