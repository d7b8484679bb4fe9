"""Generator-pass labels follow the dataset's empirical distribution
(reference training_loop_mi_multimodal.py:319-321)."""

import numpy as np

import jax
import jax.numpy as jnp

from gantrack_tpu.training.step import sample_gen_labels


def test_gen_label_frequencies_track_bank():
    # Skewed one-hot bank: 80% class 0, 20% class 1 (claro death/alive shape).
    bank = np.zeros((1000, 2), np.float32)
    bank[:800, 0] = 1
    bank[800:, 1] = 1
    out = np.asarray(sample_gen_labels(jax.random.PRNGKey(0), jnp.asarray(bank), 4000))
    freq = out.mean(axis=0)
    np.testing.assert_allclose(freq, [0.8, 0.2], atol=0.03)


def test_gen_labels_are_bank_rows():
    bank = np.asarray([[0.5, 1.5], [2.5, 3.5], [4.5, 5.5]], np.float32)
    out = np.asarray(sample_gen_labels(jax.random.PRNGKey(1), jnp.asarray(bank), 64))
    for row in out:
        assert any(np.allclose(row, b) for b in bank), row
