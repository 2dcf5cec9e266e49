"""
Test configuration: run on a virtual 8-device CPU mesh so that sharded
(multi-chip) code paths are exercised without TPU hardware, and keep float64
for the DMET numerics.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# the axon TPU plugin force-sets jax_platforms at import; pin tests to the
# virtual CPU mesh regardless
try:
    jax.config.update("jax_platforms", "cpu")
    jax.devices()
except Exception:
    pass

# disk-cache the native integral tensors (keyed by workload + the ints/
# source hash, so integral-engine changes auto-invalidate): repeated
# suite runs skip the ~1 min/builder host generation
os.environ.setdefault(
    "LIBDMET_TPU_INT_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".integral_cache"))
