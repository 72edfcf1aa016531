"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual CPU mesh (standard JAX
practice, cf. SURVEY.md §4) — tests never need real TPU hardware.
"""

import os

# Hard override: the session environment may pin JAX_PLATFORMS to a TPU plugin
# (e.g. 'axon'); tests must run on CPU with virtual devices regardless. A
# pytest plugin (jaxtyping) imports jax before this conftest runs, and jax
# snapshots JAX_PLATFORMS into its config at import — so set the env var for
# safety AND force the config value post-import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_board_np(rng, max_exp=11, p_zero=0.35):
    """Random exponent board with a realistic zero fraction."""
    b = rng.integers(0, max_exp + 1, size=(4, 4))
    mask = rng.random((4, 4)) < p_zero
    b = np.where(mask, 0, b)
    return b.astype(np.int32)
