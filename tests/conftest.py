"""Test configuration: force an 8-virtual-device CPU platform.

The reference exercises distributed behavior only by launching real GPUs; we
instead validate all sharding logic on a fake 8-device CPU mesh (SURVEY.md §4).
jax may already be imported by site customization, so we use runtime config
updates (which work until the first backend initialization) rather than env
vars.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite compiles many small programs; this
# makes repeat runs (CI / driver) start warm.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
