"""Test harness: force JAX onto 8 virtual CPU devices.

Multi-chip behavior (SPMD spatial sharding) is tested without a TPU pod via
``--xla_force_host_platform_device_count=8``, the fake-backend substitute the
reference never had (SURVEY.md §4.4). Must run before any JAX backend init.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_FLAG = "--xla_force_host_platform_device_count=8"
if _FLAG not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _FLAG).strip()

# No background AOT-prefetch compile threads under test: a leftover daemon
# worker's XLA CPU compile racing a later test's compiles/torch work
# segfaulted the interpreter (rare, r5). Sync mode runs the same jobs
# inline at get() — identical results, deterministic scheduling.
os.environ.setdefault("STT_PREFETCH_SYNC", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def vgg_params():
    import jax.numpy as jnp

    from style_transfer_tpu.models.weights import random_params

    return {k: jnp.asarray(v) for k, v in random_params(0).items()}


@pytest.fixture()
def content_pil(rng):
    from PIL import Image

    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack([xx / w * 255, yy / h * 255, (xx + yy) / (h + w) * 255], -1)
    return Image.fromarray(arr.astype(np.uint8))


@pytest.fixture()
def style_pil():
    from PIL import Image

    r = np.random.RandomState(7)
    return Image.fromarray(r.randint(0, 255, (80, 80, 3)).astype(np.uint8))
