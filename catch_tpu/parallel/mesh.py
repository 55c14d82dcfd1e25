"""Device-mesh helpers."""

import numpy as np
import jax

__all__ = ["make_mesh"]


def make_mesh(n_devices=None, axis_name="d"):
    """Create a 1-D jax.sharding.Mesh over the first `n_devices` devices.

    Args:
        n_devices: number of devices (default: all available)
        axis_name: mesh axis name

    Returns:
        jax.sharding.Mesh
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(
            f"requested {n_devices} devices, only {len(devs)} available")
    return jax.sharding.Mesh(
        np.array(devs[:n_devices]), axis_names=(axis_name,))
