import os

# deterministic CPU testing with a virtual 8-device mesh for sharding tests
# (force: the machine environment may preset JAX_PLATFORMS to a TPU plugin)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")

REFERENCE_CONFIG = "/root/reference/config"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_CONFIG)
