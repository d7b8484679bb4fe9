"""Serve the visualizer on a random-init tiny SG2 for a UI smoke drive."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gantrack_tpu.models.stylegan2 import Generator
from gantrack_tpu.tools.visualizer import RenderEngine, serve

g = Generator(
    z_dim=64, c_dim=0, w_dim=64, img_resolution=64, img_channels=1,
    mapping_kwargs=dict(num_layers=2),
    synthesis_kwargs=dict(channel_base=1024, channel_max=128, num_fp16_res=0),
)
v = g.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
           jnp.zeros((1, 64)), None)
eng = RenderEngine(g, dict(v), channels=1)
httpd = serve(eng, "127.0.0.1", 8091)
print("serving on 8091", flush=True)
httpd.serve_forever()
