import jax
import jax.numpy as jnp
import numpy as np

from cvsd_tpu.ops.letterbox import PAD_VALUE, letterbox_batch, letterbox_batch_pallas


def test_pallas_letterbox_matches_nearest(rng):
    f = rng.integers(0, 255, (2, 240, 320, 3)).astype(np.uint8)
    out = np.asarray(letterbox_batch_pallas(jnp.asarray(f), 640, jnp.float32))
    nn = np.asarray(jax.image.resize(jnp.asarray(f).astype(jnp.float32),
                                     (2, 480, 640, 3), method="nearest")) / 255.0
    np.testing.assert_allclose(out[:, 80:560], nn, atol=1e-6)
    np.testing.assert_allclose(out[:, :80], PAD_VALUE / 255.0, atol=1e-6)
    np.testing.assert_allclose(out[:, 560:], PAD_VALUE / 255.0, atol=1e-6)


def test_pallas_letterbox_noninteger_scale_falls_back(rng):
    f = rng.integers(0, 255, (1, 250, 333, 3)).astype(np.uint8)
    out = letterbox_batch_pallas(jnp.asarray(f), 640, jnp.float32)
    ref = letterbox_batch(jnp.asarray(f), 640, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
