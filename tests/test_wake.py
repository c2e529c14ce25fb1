"""Python-side wake tests: native ctypes binding roundtrip + JAX twin
convergence on a synthetic impulse-time task."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _native_available():
    from imagined_speech_translation_tpu.wake.native import find_native_library

    return find_native_library() is not None


def _impulse_batch(n, seq_len, rng):
    x = rng.normal(0, 0.05, (n, seq_len, 2)).astype(np.float32)
    labels = rng.integers(0, seq_len, n)
    for i, l in enumerate(labels):
        x[i, l, 1] += 5.0
    return x, labels.astype(np.int32)


@pytest.mark.skipif(not _native_available(), reason="libwake.so not built")
class TestNative:
    def test_forward_train_save_load(self, tmp_path):
        from imagined_speech_translation_tpu.wake import NativeWakeModel

        seq = 240
        model = NativeWakeModel(seq, 2, seed=7)
        rng = np.random.default_rng(0)
        x, labels = _impulse_batch(1, seq, rng)
        pred, probs = model.forward(x[0])
        assert probs.shape == (seq,)
        np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-4)

        l0 = model.train_step(x[0], int(labels[0]), lr=0.05)
        for _ in range(10):
            l1 = model.train_step(x[0], int(labels[0]), lr=0.05)
        assert l1 < l0

        model.save(tmp_path / "m.bin")
        m2 = NativeWakeModel.load(tmp_path / "m.bin", seq, 2)
        p1, pr1 = model.forward(x[0])
        p2, pr2 = m2.forward(x[0])
        assert p1 == p2
        np.testing.assert_allclose(pr1, pr2, atol=1e-6)
        assert m2.predict_time(x[0]) == p2 * 7.0

    def test_input_validation(self):
        from imagined_speech_translation_tpu.wake import NativeWakeModel

        model = NativeWakeModel(240, 2, seed=1)
        with pytest.raises(ValueError):
            model.forward(np.zeros((10, 2), np.float32))
        with pytest.raises(RuntimeError):
            NativeWakeModel(64, 2)  # below the topology minimum


def test_jax_twin_learns_impulse_task():
    from imagined_speech_translation_tpu.wake import WakeMLP, make_wake_train_step

    seq, n = 64, 64
    model = WakeMLP(n_classes=seq)
    init_fn, step_fn, predict_fn = make_wake_train_step(model, 3e-3)
    rng = np.random.default_rng(1)
    x, labels = _impulse_batch(n, seq, rng)
    params, opt_state = init_fn(jax.random.key(0), jnp.asarray(x[:2]))
    first = None
    for i in range(60):
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(x), jnp.asarray(labels)
        )
        if first is None:
            first = float(loss)
    assert float(loss) < 0.3 * first
    preds = np.asarray(predict_fn(params, jnp.asarray(x)))
    assert (preds == labels).mean() > 0.8
