"""Test harness: run everything on CPU with 8 virtual devices.

This is the standard way to test TPU sharding logic without a pod:
``--xla_force_host_platform_device_count=8`` gives `jax.devices()` eight
host devices so mesh/shard_map/halo-exchange paths execute for real.
Pallas kernels run in interpreter mode on CPU (handled inside the kernels'
`interpret=` plumbing).

NOTE: this environment pre-imports jax via sitecustomize with
JAX_PLATFORMS=axon (a tunneled TPU).  Env vars are therefore already baked
into jax.config — we must override through jax.config.update, before any
backend is initialised (XLA_FLAGS is still read lazily at backend init).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
jax.config.update("jax_default_matmul_precision", "highest")
# x64 available for golden-precision tests; explicit f32 arrays stay f32.
jax.config.update("jax_enable_x64", True)
