from bioreason_tpu.utils.devices import force_cpu_devices
