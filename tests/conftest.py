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

# persist the heavyweight CPU compiles (fit/pipeline programs run 10-60 s
# each to build) so suite RE-runs replay them from disk; keys are HLO
# hashes, so code changes miss cleanly (utils/compile_cache.py)
from r3d_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(min_compile_secs=5.0)

import pytest  # noqa: E402

# Suite tiers (measured round 5: 316 passed, 3 skipped in 77-91 min
# across two full runs on this 1-core host). `heavy` marks the composed/e2e protocol
# files (verbatim torch reference training chains) plus the multi-fit
# equality files whose single tests run 2-4 min — together ~40% of suite
# wall. `-m "not heavy"` is the core tier (measured 282 passed in 38
# min alone): every
# forward/gradient parity oracle, kernel, sharding, loss, and unit test.
# The heavy tier re-proves the same semantics at full-fit/protocol scale.
# Files are marked centrally here so a new heavy file is one set-entry,
# not per-test decoration.
HEAVY_FILES = {
    "test_composed_protocol_parity.py",
    "test_composed_protocol_50salads.py",
    "test_composed_protocol_darai.py",
    "test_composed_protocol_nturgbd.py",
    "test_e2e_moc_parity.py",
    "test_predict_tcn_darai_parity.py",
    "test_hybrid_cache.py",
    "test_sticky_eval.py",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: long composed/e2e protocol files (5-13 min each); "
        'deselect with -m "not heavy" for the core tier',
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in HEAVY_FILES:
            item.add_marker(pytest.mark.heavy)

REFERENCE = "/root/reference"


def reference_on_path():
    """Put the reference repo on sys.path for parity oracles."""
    if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return os.path.isdir(REFERENCE)
