import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware. Env vars alone are not enough on hosts whose
# sitecustomize registers a TPU-proxy backend (it overrides jax_platforms via
# jax.config), so force the CPU platform through the config API too.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

from bioreason_tpu.utils import force_cpu_devices

force_cpu_devices(8)
