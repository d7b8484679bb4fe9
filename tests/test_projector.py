"""Latent projection: optimisation reduces the objective and recovers a
target rendered by the generator itself (the solvable case)."""

import numpy as np

import jax
import jax.numpy as jnp

from gantrack_tpu.models.stylegan2 import Generator
from gantrack_tpu.tools.projector import ProjectorConfig, compute_w_stats, project


def _tiny_g():
    g = Generator(
        z_dim=8, c_dim=0, w_dim=8, img_resolution=16, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=128, channel_max=32, num_fp16_res=0),
    )
    z = jnp.zeros((1, 8))
    variables = g.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, z, None)
    return g, variables


def test_w_stats():
    g, v = _tiny_g()
    w_avg, w_std = compute_w_stats(g, v, z_dim=8, num_samples=256)
    assert w_avg.shape == (1, 1, 8)
    assert w_std > 0


def test_projection_recovers_generated_target():
    g, v = _tiny_g()
    # Target = G(w*) for a known w; projection should approach it.
    z_t = jax.random.normal(jax.random.PRNGKey(5), (1, 8))
    ws_t = g.apply(v, z_t, None, method=lambda m, z, c: m.mapping(z, c))
    target = g.apply(v, ws_t, noise_mode="const",
                     method=lambda m, ws, **kw: m.synthesis(ws, **kw))[0]

    cfg = ProjectorConfig(num_steps=60, w_avg_samples=256,
                          initial_learning_rate=0.05, w_pix_weight=1.0)
    result = project(g, v, np.asarray(target), feature_fn=None, cfg=cfg)
    assert result["w"].shape[1] == 8
    losses = result["losses"]
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    # reconstruction error of the final w
    ws_fit = jnp.asarray(result["w"])[None]
    recon = g.apply(v, ws_fit, noise_mode="const",
                    method=lambda m, ws, **kw: m.synthesis(ws, **kw))[0]
    err = float(jnp.mean(jnp.square(recon - target)))
    base = float(jnp.mean(jnp.square(target)))
    assert err < base, (err, base)
