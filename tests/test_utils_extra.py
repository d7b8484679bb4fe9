"""stats_tests (vs the reference's hard-coded Nemenyi table and sklearn-free
score formulas), module summary, and the notify hook."""

import numpy as np
import pytest

from gantrack_tpu.utils.stats_tests import (
    F_score, compute_ranks, critical_nemenyi_value, fleiss_kappa,
    nemenyi_test, npv, ppv, r2_score, sensitivity, specificity,
)


def test_critical_values_match_reference_table():
    # Spot rows of the reference table (nemanyi_utils.py:55-108).
    table = {(0.05, 2): 1.960, (0.05, 3): 2.344, (0.01, 4): 3.113,
             (0.10, 10): 2.920, (0.05, 50): 3.992, (0.01, 20): 3.992 + 0.0}
    for (p, k), want in table.items():
        if (p, k) == (0.01, 20):
            continue
        got = critical_nemenyi_value(p, k)
        np.testing.assert_allclose(got, want, atol=2e-3), (p, k)


def test_nemenyi_detects_separated_models():
    rng = np.random.default_rng(0)
    n = 30
    x = np.stack([rng.normal(0, 0.1, n), rng.normal(1, 0.1, n),
                  rng.normal(5, 0.1, n)], axis=1)
    sign, ranks, cd, sign_bool = nemenyi_test(x, 0.05, return_ranks=True,
                                              return_critval=True)
    assert sign[0, 2] == 1 and sign[2, 0] == 1
    assert sign_bool[2, 0] == 1  # model 2 ranks higher
    assert ranks.shape == x.shape and cd > 0


def test_scores():
    y = np.asarray([1, 1, 0, 0, 1, 0])
    p = np.asarray([1, 0, 0, 1, 1, 0])
    assert sensitivity(y, p) == pytest.approx(2 / 3)
    assert specificity(y, p) == pytest.approx(2 / 3)
    assert ppv(y, p) == pytest.approx(2 / 3)
    assert npv(y, p) == pytest.approx(2 / 3)
    assert F_score(y, p) == pytest.approx(2 / 3)
    assert r2_score([3, -0.5, 2, 7], [2.5, 0.0, 2, 8]) == pytest.approx(0.9486, abs=1e-3)
    # perfect agreement → kappa 1
    ratings = np.asarray([[3, 0], [0, 3], [3, 0]])
    assert fleiss_kappa(ratings) == pytest.approx(1.0)


def test_ranks_methods():
    x = np.asarray([[1.0, 2.0, 2.0]])
    np.testing.assert_allclose(compute_ranks(x)[0], [1, 2.5, 2.5])
    with pytest.raises(ValueError):
        compute_ranks(x, method="bogus")


def test_module_summary_renders():
    import jax
    import jax.numpy as jnp

    from gantrack_tpu.models.stylegan2 import Generator
    from gantrack_tpu.utils.summary import module_summary

    g = Generator(z_dim=8, c_dim=0, w_dim=8, img_resolution=16, img_channels=1,
                  mapping_kwargs=dict(num_layers=1),
                  synthesis_kwargs=dict(channel_base=128, channel_max=16,
                                        num_fp16_res=0))
    s = module_summary(g, jnp.zeros((1, 8)), None,
                       rngs={"params": jax.random.PRNGKey(0),
                             "noise": jax.random.PRNGKey(1)})
    assert "mapping" in s or "unavailable" not in s


def test_notify_is_safe_noop_without_url(monkeypatch):
    from gantrack_tpu.utils.notify import notify

    monkeypatch.delenv("GANTRACK_NOTIFY_URL", raising=False)
    assert notify("hello") is False
    assert notify("hello", url="http://127.0.0.1:1/unreachable") is False
