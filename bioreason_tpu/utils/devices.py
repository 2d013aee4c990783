"""Device/platform helpers.

`force_cpu_devices(n)` pins JAX to the host CPU platform with `n` virtual
devices — the multi-chip simulation path for tests and sharding dry runs.
It must win even on hosts whose site customization registers a TPU-proxy
backend and overrides `jax_platforms` at interpreter startup, so it updates
the jax config (not just env vars) and clears any already-initialized
backends.
"""

from __future__ import annotations

import os


def force_cpu_devices(n: int = 8) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        # XLA_FLAGS was already parsed by the first backend init, so the
        # device-count flag above is a no-op now; the config knob still works.
        from jax.extend.backend import clear_backends
        clear_backends()
    jax.config.update("jax_num_cpu_devices", n)
    jax.config.update("jax_platforms", "cpu")
