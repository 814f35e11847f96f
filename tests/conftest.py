import os

# deterministic CPU testing with a virtual 8-device mesh for sharding tests.
# The machine sitecustomize registers a TPU plugin and pins JAX_PLATFORMS
# before conftest runs, so the env var alone is NOT enough — override the
# already-imported jax config (backend init is lazy, so this still wins).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_CONFIG = "/root/reference/config"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_CONFIG)
