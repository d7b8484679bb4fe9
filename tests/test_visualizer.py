"""Web visualizer: render engine numerics + HTTP surface
(replaces the reference GUI visualizer.py/viz/* for headless TPU)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantrack_tpu.tools.visualizer import RenderEngine, serve

RES, ZDIM = 32, 16


def _sg2():
    from gantrack_tpu.models.stylegan2 import Generator

    g = Generator(
        z_dim=ZDIM, c_dim=0, w_dim=ZDIM, img_resolution=RES, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=256, channel_max=64, num_fp16_res=0),
    )
    v = g.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
               jnp.zeros((1, ZDIM)), None)
    return g, dict(v)


def _sg3():
    from gantrack_tpu.models.stylegan3 import Generator

    g = Generator(
        z_dim=ZDIM, c_dim=0, w_dim=ZDIM, img_resolution=RES, img_channels=1,
        channel_base=1024, channel_max=64, num_fp16_res=0,
        synthesis_kwargs=dict(num_layers=5),
    )
    v = g.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, ZDIM)), None)
    return g, dict(v)


def test_engine_matches_direct_apply():
    g, v = _sg2()
    eng = RenderEngine(g, v, channels=1)
    got = eng.render(seed=3, psi=0.7)
    z = jax.random.normal(jax.random.PRNGKey(3), (1, ZDIM))
    want = np.asarray(g.apply(v, z, None, truncation_psi=0.7, noise_mode="const"))[0]
    want = np.clip((want + 1) * 127.5, 0, 255).astype(np.uint8)[:, :, 0]
    np.testing.assert_array_equal(got, want)
    # psi moves pixels without recompiling (same two programs)
    assert not np.array_equal(got, eng.render(seed=3, psi=0.0))
    # blend interpolates between two seeds in w space
    a = eng.render(seed=3, seed2=5, blend=0.0)
    b = eng.render(seed=5, psi=1.0)
    np.testing.assert_array_equal(a, eng.render(seed=3))
    assert not np.array_equal(eng.render(seed=3, seed2=5, blend=1.0), a)
    np.testing.assert_array_equal(eng.render(seed=3, seed2=5, blend=1.0), b)


def test_style_mixing():
    g, v = _sg2()
    eng = RenderEngine(g, v, channels=1)
    base = eng.render(seed=3)
    # cutoff 0 or >= num_ws ⇒ mixing off
    np.testing.assert_array_equal(base, eng.render(seed=3, mix_seed=7, mix_cutoff=0))
    np.testing.assert_array_equal(
        base, eng.render(seed=3, mix_seed=7, mix_cutoff=g.num_ws))
    mixed = eng.render(seed=3, mix_seed=7, mix_cutoff=2)
    assert not np.array_equal(base, mixed)
    # rows >= cutoff come verbatim from the mixing seed
    ws_a = eng._ws(3, 1.0, None, 0.0, mix_seed=7, mix_cutoff=2)
    ws_b = eng._ws(7, 1.0, None, 0.0)
    np.testing.assert_array_equal(ws_a[:, 2:], ws_b[:, 2:])


def test_sg3_transform_slider_changes_image():
    g, v = _sg3()
    eng = RenderEngine(g, v, channels=1)
    assert eng.has_transform
    base = eng.render(seed=0)
    moved = eng.render(seed=0, tx=0.25, rotate=45.0)
    assert not np.array_equal(base, moved)


def test_layer_activations_capture():
    g, v = _sg2()
    eng = RenderEngine(g, v, channels=1)
    shapes = eng.layer_shapes()          # abstract listing: no compile/run
    assert shapes and all(len(s) == 4 for s in shapes.values())
    acts = eng.layer_activations(seed=0, psi=0.8)
    assert acts, "no NHWC intermediates captured"
    assert all(np.asarray(a).ndim == 4 for a in acts.values())
    # the abstract table matches the concrete activations exactly
    assert {k: tuple(np.asarray(a).shape) for k, a in acts.items()} == shapes


def test_http_surface():
    g, v = _sg2()
    eng = RenderEngine(g, v, channels=1)
    httpd = serve(eng, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        page = urllib.request.urlopen(f"{base}/").read()
        assert b"visualizer" in page
        info = json.loads(urllib.request.urlopen(f"{base}/api/info").read())
        assert info["resolution"] == RES and not info["has_transform"]
        r = urllib.request.urlopen(f"{base}/api/render?seed=1&psi=0.9")
        assert r.headers["Content-Type"] == "image/png"
        assert float(r.headers["X-Render-Ms"]) > 0
        assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
        layers = json.loads(urllib.request.urlopen(f"{base}/api/layers").read())
        name = layers["layers"][0]["name"]
        q = urllib.request.quote(name)
        r = urllib.request.urlopen(f"{base}/api/layer?name={q}&seed=1")
        assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/api/layer?name=nope&seed=1")
        assert ei.value.code == 500
    finally:
        httpd.shutdown()
