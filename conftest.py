"""Pytest bootstrap: pin tests to the CPU backend with 8 virtual devices so
sharding tests run anywhere (SURVEY.md §4 'multi-host tests runnable on
CPU'). The axon TPU platform in this image force-registers itself regardless
of JAX_PLATFORMS, so we pin the default device instead of the platform."""
import os

_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_default_device', jax.devices('cpu')[0])
