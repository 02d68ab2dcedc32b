"""utils.fetch: poll-until-ready device->host reads (tunnel-safe)."""
import numpy as np
import jax.numpy as jnp

from dpvo_tpu.utils.fetch import fetch, fetch_copy


def test_fetch_matches_and_copy_writable():
    x = jnp.arange(12.0).reshape(3, 4)
    out = fetch(x)
    np.testing.assert_allclose(out, np.arange(12.0).reshape(3, 4))

    c = fetch_copy(x)
    c[0, 0] = 99.0          # writable copy
    assert float(x[0, 0]) == 0.0

    # plain numpy passes through
    np.testing.assert_allclose(fetch(np.ones(3)), np.ones(3))
