"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

This is the TPU-world analog of a fake distributed backend (SURVEY.md §4):
sharding tests run identically here and on a real v5e-8.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the fake CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize imports jax at interpreter startup (before
# this conftest), so JAX_PLATFORMS from env is already baked into jax.config.
# The backend itself initializes lazily — overriding the config here still
# lands in time.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REFERENCE = "/root/reference"


def reference_on_path():
    """Put the reference repo on sys.path for parity oracles."""
    if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return os.path.isdir(REFERENCE)
