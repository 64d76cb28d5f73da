"""SPMD spatial sharding over a TPU device mesh.

The reference scales to big outputs by splitting VGG *layers* across two GPUs
(``/root/reference/style_transfer/style_transfer.py:71-76,326-333`` — a
memory-capacity device plan, explicitly not faster). The TPU-native design
replaces that wholesale: activations are sharded over their spatial dims
(H, and W for larger meshes) across all chips via ``jax.sharding``. GSPMD
partitions the convolutions/poolings with halo exchange over ICI, and the
channel-space statistics the losses need (means, Gram/SRM matrices) come out
of ``psum``-reduced einsums, replicated on every chip. One program, N chips,
no hand-written collectives — and unlike the reference's split, it *is*
faster, not just bigger.

Axes: ``sph`` shards image height, ``spw`` shards width. A device count n is
factored as close to square as possible with the larger factor on H.
"""

import math
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "factor_devices",
    "make_mesh",
    "image_spec",
    "image_sharding",
    "replicated",
    "shard_image",
    "constrain_image",
]


def factor_devices(n: int):
    """Factor n into (rows, cols) as square as possible, rows >= cols."""
    best = (n, 1)
    for c in range(1, int(math.isqrt(n)) + 1):
        if n % c == 0:
            best = (n // c, c)
    return best


def make_mesh(devices: Optional[Sequence] = None, n_devices: Optional[int] = None):
    """Build a 2D ('sph', 'spw') mesh over the given / first-n / all devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(
                    f"requested {n_devices} devices but only {len(devices)} present"
                )
            devices = devices[:n_devices]
    rows, cols = factor_devices(len(devices))
    import numpy as np

    arr = np.asarray(devices).reshape(rows, cols)
    return Mesh(arr, ("sph", "spw"))


def image_spec(mesh: Mesh) -> P:
    """PartitionSpec for NHWC images: shard H over sph, W over spw."""
    sph = "sph" if mesh.shape.get("sph", 1) > 1 else None
    spw = "spw" if mesh.shape.get("spw", 1) > 1 else None
    return P(None, sph, spw, None)


def image_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, image_spec(mesh))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_image(x, mesh: Optional[Mesh]):
    """Place an NHWC image onto the mesh, sharded spatially when possible.

    ``device_put`` requires dims divisible by the mesh factors; for the
    arbitrary sizes a scale pyramid produces, fall back to replicated
    placement — the ``with_sharding_constraint`` inside the jitted step
    redistributes (XLA pads uneven shards internally)."""
    if mesh is None or math.prod(mesh.shape.values()) == 1:
        return x
    h, w = x.shape[1], x.shape[2]
    if h % mesh.shape.get("sph", 1) == 0 and w % mesh.shape.get("spw", 1) == 0:
        return jax.device_put(x, image_sharding(mesh))
    return jax.device_put(x, replicated(mesh))


def constrain_image(x, mesh: Optional[Mesh]):
    """Pin the sharding of an NHWC activation inside a jitted function."""
    if mesh is None or math.prod(mesh.shape.values()) == 1:
        return x
    return jax.lax.with_sharding_constraint(x, image_sharding(mesh))
