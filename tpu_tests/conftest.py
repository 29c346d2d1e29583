"""TPU test lane: runs on the real chip (no CPU forcing).

The main tests/ suite forces an 8-virtual-device CPU platform; this lane
exists precisely to execute the Pallas kernels (chase, dd-stencil) on TPU
hardware and assert them against the exact XLA paths.  Every test skips
cleanly when no TPU backend is live.

Run:  PYTHONPATH=.:/root/.axon_site python -m pytest tpu_tests -q
  or: python tpu_tests/run_lane.py   (writes the committed JSON artifact)
"""
import jax
import pytest

try:
    # persistent XLA cache: lane compiles (1-5 min each through the
    # remote-device tunnel) survive across runs and partial kills
    from pybader_tpu.precompile import enable_persistent_cache

    enable_persistent_cache()
except Exception:
    pass


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if jax.default_backend() == "cpu":
        pytest.skip("TPU lane: no accelerator backend live",
                    allow_module_level=False)
