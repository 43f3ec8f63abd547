"""Mesh construction + sharding placement for data-parallel training."""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    """1-D mesh over the first n devices (all by default).

    Raises if fewer than `n_devices` exist -- silently truncating would
    hand back a smaller mesh and hide a misconfigured topology.
    """
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} JAX device(s) are visible "
                f"(platform={devs[0].platform if devs else 'none'}); set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
                "with JAX_PLATFORMS=cpu for a virtual mesh"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def validate_dp_divisibility(mesh: Optional[Mesh], **named_sizes) -> None:
    """Raise early when a leading-axis size does not divide over the
    mesh: GSPMD would otherwise pad or fail deep inside a compile with
    an opaque error. Call with the batch-like sizes that shard on the
    dp axis, e.g. validate_dp_divisibility(mesh, num_envs=64, batch_size=256).
    """
    if mesh is None:
        return
    n = mesh.devices.size
    bad = {k: v for k, v in named_sizes.items() if v % n != 0}
    if bad:
        raise ValueError(
            f"sizes not divisible by the {n}-device mesh: "
            + ", ".join(f"{k}={v} ({v} % {n} = {v % n})" for k, v in bad.items())
            + " -- pick multiples of the device count so every shard is equal"
        )


def shard_leading_axis(mesh: Mesh, tree, axis_name: str = "dp"):
    """Place a pytree with its leading axis split over the mesh."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1))) if x.ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree onto every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def constrain_leading_axis(mesh: Optional[Mesh], tree, axis_name: str = "dp"):
    """In-jit sharding constraint: leading axis split over the mesh.

    Usable inside traced code (unlike device_put); no-op without a mesh
    so single-device call sites need no branching.
    """
    if mesh is None:
        return tree

    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1))) if x.ndim else P()
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def make_sharded_update(update_fn, mesh: Mesh, axis_name: str = "dp"):
    """Wrap an agent update for data-parallel execution.

    Params/opt state replicate; batch shards on its leading axis; GSPMD
    derives the gradient all-reduce over ICI -- no hand-written
    collectives needed at this model scale. The jit is hoisted to this
    scope so repeated calls reuse ONE compiled executable (round-1
    verdict: jitting inside `run` would retrace every update).
    """
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(update_fn, donate_argnums=(0,))

    def batch_sharding(batch):
        return jax.tree_util.tree_map(
            lambda x: NamedSharding(
                mesh, P(axis_name, *([None] * (max(x.ndim, 1) - 1)))
            ) if getattr(x, "ndim", 0) else repl,
            batch,
        )

    def run(state, batch, key):
        state = replicate(mesh, state)
        batch = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), batch, batch_sharding(batch)
        )
        key = jax.device_put(key, repl)
        return jitted(state, batch, key)

    return run
