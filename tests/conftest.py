import os

# Tests always run on the CPU backend with 8 virtual devices: sharding /
# collective tests simulate a TPU mesh this way (SURVEY.md §4), and CPU gives
# exact f32 matmuls for the numerical oracles. Must be set before jax
# initializes a backend — and must *override* any ambient JAX_PLATFORMS
# (the dev environment pins it to the TPU tunnel).
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

# some environments register a TPU plugin from sitecustomize before user
# code runs, which wins over the env var — force the config explicitly
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
