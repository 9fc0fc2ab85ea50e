"""Test configuration: run the suite on a virtual 8-device CPU platform so
mesh/sharding tests work without TPU hardware (SURVEY.md section 4).

The container's sitecustomize (PYTHONPATH=/root/.axon_site) registers the
'axon' TPU PJRT plugin at interpreter start and pins the backend regardless
of JAX_PLATFORMS — so merely setting env vars here is too late. If we detect
that sitecustomize ran, re-exec pytest once with a scrubbed environment."""
import os
import sys

_SENTINEL = "ZUTIS_TPU_TEST_REEXEC"

if os.environ.get(_SENTINEL) != "1" and "axon_site" in os.environ.get(
    "PYTHONPATH", ""
):
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

# CI numeric-guard mode (SURVEY.md section 5 race/sanitizer row): raise on
# the first NaN-producing op across the whole suite
if os.environ.get("ZUTIS_DEBUG_NANS") == "1":
    jax.config.update("jax_debug_nans", True)
