"""Sequence-level data parallelism: N independent VO sequences, one per mesh
slot (SURVEY.md §2c "pmap/pjit KITTI sequences 00-10 across chips",
BASELINE.json configs[4]).

The per-frame step is already a pure function over a fixed-shape pytree, so
DP is literally ``vmap`` + sharding annotations on the leading axis: every
leaf of the batched ``FrameState`` and the image batch are sharded over the
``data`` mesh axis, and XLA runs each sequence's step on its own device with
zero collectives (embarrassingly parallel — the BA back-end in
parallel/ba_sharded.py is where real collectives appear).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline.vo import VisualOdometry


def make_mesh(n_devices: int, axis: str = "data") -> Mesh:
    devs = jax.devices()[:n_devices]
    return Mesh(devs, (axis,))


def batched_step(vo: VisualOdometry, mesh: Mesh, axis: str = "data"):
    """Returns a jitted function (states, images, keys) -> states with every
    leading axis sharded over ``axis``."""
    shard = NamedSharding(mesh, P(axis))

    def shard_tree(tree):
        return jax.tree.map(lambda x: jax.device_put(x, shard), tree)

    vstep = jax.vmap(vo._step_impl)
    jstep = jax.jit(vstep, out_shardings=None)

    return jstep, shard_tree


def dryrun(vo: VisualOdometry, n_devices: int, axis: str = "data") -> None:
    """Compile + execute one data-parallel step on tiny shapes."""
    mesh = make_mesh(n_devices, axis)
    key = jax.random.PRNGKey(0)
    H, W = vo.config.image_shape
    img = jnp.zeros((H, W), jnp.float32)

    state = vo.bootstrap(img, img, key)
    batch_state = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_devices,) + x.shape), state
    )
    batch_img = jnp.zeros((n_devices, H, W), jnp.float32)
    batch_keys = jax.random.split(key, n_devices)

    jstep, shard_tree = batched_step(vo, mesh, axis)
    with mesh:
        batch_state = shard_tree(batch_state)
        batch_img = shard_tree(batch_img)
        batch_keys = shard_tree(batch_keys)
        out = jstep(batch_state, batch_img, batch_keys)
        jax.block_until_ready(out.T_CW)
    assert out.T_CW.shape == (n_devices, 4, 4)
