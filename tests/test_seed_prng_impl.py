"""The prng_impl train knob (core/seed.py setup_seed): `rbg` swaps the
jax PRNG for the hardware/counter RNG — measured -6.9% train step at
16f b4 (doc/TRAIN_PERF.md). Run in a subprocess: jax_default_prng_impl
is process-global and must not leak into this process's golden tests.
"""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import flax.linen as nn
from vgen_tpu.core import setup_seed

k_def = setup_seed(7)
assert k_def.shape == (2,), k_def.shape  # threefry2x32 raw key

k = setup_seed(7, prng_impl="rbg")
assert jax.config.jax_default_prng_impl == "rbg"
assert k.shape == (4,), k.shape  # rbg raw key

# dropout masks generate and are deterministic per key
drop = nn.Dropout(0.5, deterministic=False)
x = jnp.ones((4, 128))
a = drop.apply({}, x, rngs={"dropout": k})
b = drop.apply({}, x, rngs={"dropout": k})
assert (a == b).all()
assert float((a == 0).mean()) > 0.2  # masks actually dropped
# reproducible end-to-end: same seed -> same mask
k2 = setup_seed(7, prng_impl="rbg")
c = drop.apply({}, x, rngs={"dropout": k2})
assert (a == c).all()
print("PRNG-IMPL-OK")
"""


def test_seed_prng_impl_rbg_subprocess():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run([sys.executable, "-c", SCRIPT],
                         capture_output=True, text=True, timeout=300,
                         env=env, cwd=ROOT)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "PRNG-IMPL-OK" in res.stdout
