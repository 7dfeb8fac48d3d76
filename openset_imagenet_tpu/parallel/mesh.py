"""Device mesh + sharding utilities — the framework's DP/NCCL equivalent.

The reference gestures at data parallelism (vestigial DDP import and a dead
``dist:`` config block, reference ``train.py:10``, ``config/train.yaml:35-39``)
but never implements it; its real scaling unit is one-process-per-GPU
experiment parallelism (``script/train_all.py:95-118``).  Here data
parallelism is a first-class citizen: a 1-D ``data`` mesh over all local
devices, ``NamedSharding`` annotations on batches, replicated parameters,
and XLA-inserted gradient ``psum`` over ICI inside the jitted train step.

ResNet-50 at these scales needs no tensor/pipeline parallelism (SURVEY.md §2:
"do not invent them"), but the mesh helpers accept an optional ``model`` axis
so wider topologies remain expressible.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None,
              axis_sizes: Optional[Sequence[int]] = None) -> Mesh:
    """Device mesh over the first ``num_devices`` devices.

    The default is a 1-D pure data-parallel mesh.  For multi-axis layouts
    pass ``axis_sizes``, e.g. ``axis_names=('data', 'model'),
    axis_sizes=(4, 2)`` on 8 devices; sizes must multiply to the device
    count.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        # Never truncate silently: a caller asking for 16 devices on an
        # 8-chip host must not run on 8 believing it got 16.
        if not 1 <= num_devices <= len(devices):
            raise ValueError(
                f"requested {num_devices} devices, but "
                f"{len(devices)} are available")
        devices = devices[:num_devices]
    devs = np.asarray(devices)
    if len(axis_names) == 1:
        return Mesh(devs, axis_names)
    if axis_sizes is None:
        raise ValueError(
            "multi-axis meshes need explicit axis_sizes, e.g. "
            "make_mesh(axis_names=('data', 'model'), axis_sizes=(4, 2))")
    if len(axis_sizes) != len(axis_names) or \
            int(np.prod(axis_sizes)) != len(devs):
        raise ValueError(
            f"axis_sizes {tuple(axis_sizes)} does not tile {len(devs)} "
            f"devices over axes {tuple(axis_names)}")
    return Mesh(devs.reshape(tuple(axis_sizes)), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over the data axis, replicate the rest (any rank)."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_over_axis(mesh: Mesh, tree, axis: str = "data"):
    """ZeRO-style sharding tree: one shard of each leaf per device.

    Returns a pytree of ``NamedSharding`` with the structure of ``tree``
    where every array leaf is sharded along its first dimension divisible
    by the mesh axis size; leaves with no such dimension (scalars, step
    counters, odd class counts) stay replicated.  Used for ZeRO-1
    optimizer-state partitioning (``opt.zero1``): Adam moments, EMA
    shadows and accumulation buffers each live once across the mesh
    instead of once per device, and XLA's SPMD partitioner places the
    matching reduce-scatter/all-gather collectives over ICI.
    """
    n = int(mesh.shape[axis])
    rep = NamedSharding(mesh, P())

    def leaf(x):
        shape = tuple(getattr(x, "shape", ()) or ())
        if n > 1:
            for i, d in enumerate(shape):
                if d >= n and d % n == 0:
                    spec = [None] * len(shape)
                    spec[i] = axis
                    return NamedSharding(mesh, P(*spec))
        return rep

    return jax.tree.map(leaf, tree)


def data_mesh_for_batch(global_batch: int, devices=None) -> Mesh:
    """Largest 1-D data mesh whose size divides the global batch.

    A 1-sample remainder cannot be split over more chips than it has rows;
    shared by the train worker and the evaluate CLI.  Shrinking idles
    devices, so it warns loudly; on multi-host it raises instead (excluding
    devices would strand whole processes).

    ``devices`` restricts the mesh to an explicit device subset — the
    per-run isolation behind the reference's ``--gpu`` pinning (reference
    ``script/train.py:58-60``): parallel sweep queues each build a
    disjoint single-device mesh instead of contending for all chips.
    """
    import warnings

    if devices is None:
        devices = jax.devices()
    total = len(devices)
    n = total
    while int(global_batch) % n:
        n -= 1
    if n != total:
        if jax.process_count() > 1:
            raise ValueError(
                f"global batch {global_batch} does not divide the "
                f"{total}-device multi-host mesh; choose a divisible batch")
        warnings.warn(
            f"batch_size {global_batch} is not divisible by "
            f"{total} devices; using only {n} (idle devices waste "
            "throughput — pick a divisible batch size)", stacklevel=2)
    return make_mesh(num_devices=n, devices=devices)


def select_device(index: int):
    """``[jax.devices()[index]]`` with a loud out-of-range error.

    Device-pinning helper for the ``--gpu`` CLI flags: unlike the
    reference's CUDA_VISIBLE_DEVICES-style process env pinning, JAX runs
    pin by building their mesh over one chosen device.
    """
    devices = jax.devices()
    if not 0 <= int(index) < len(devices):
        raise ValueError(
            f"device index {index} out of range: this host has "
            f"{len(devices)} {devices[0].platform.upper()} device(s)")
    return [devices[int(index)]]
