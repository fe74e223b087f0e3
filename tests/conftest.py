"""Test configuration: force CPU with 8 virtual devices so mesh/sharding tests
run without a TPU slice (the idiomatic JAX replacement for a fake backend —
SURVEY.md §4).

Note: the environment pre-imports jax with JAX_PLATFORMS=axon (sitecustomize),
so the env var alone is ignored; jax.config.update before first backend use is
authoritative.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent HLO compile cache: the 8-device mesh suites compile
# flagship-width (hidden 3072) programs; repeat runs (exps/test.sh lanes,
# local iteration) load them from disk instead of recompiling. Same cache
# the multichip dryrun and the CLIs use (utils/cache.py), keyed by host ISA
# so foreign-host XLA:CPU entries cannot dispatch-fail. test_aot.py turns it
# OFF module-locally: XLA:CPU executables compiled through the HLO cache
# serialize to blobs whose reload dispatch-fails (see its autouse fixture).
from visualcloze_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
