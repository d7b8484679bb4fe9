"""Convert a reference StyleGAN2 network-snapshot pickle to a gantrack
checkpoint.

Capability parity with the reference's ``legacy.load_network_pkl``
consumption path (``legacy.py:22-59``): users migrating from Gan-track
can bring their trained pickles.  Unpickling the reference snapshot
requires torch and the reference's ``torch_utils``/``dnnlib`` packages on
sys.path (the snapshot embeds class *source* via
``persistence.persistent_class``, which re-imports those modules);
pass ``--reference`` pointing at a stylegan3 checkout.
"""

from __future__ import annotations

import click


@click.command()
@click.option("--src", required=True, help="network-snapshot-*.pkl")
@click.option("--dst", required=True, help="output checkpoint directory")
@click.option("--reference", default=None,
              help="path to a stylegan3 repo providing torch_utils/dnnlib")
def main(src, dst, reference):
    """Convert reference G/D/G_ema pickles into a gantrack train state."""
    import jax

    from ..models.stylegan2 import Discriminator, Generator
    from ..models.torch_compat import (
        load_network_pickle, transplant_into_state,
    )
    from ..training import create_train_state, lazy_reg_adam
    from ..utils.checkpoint import save_checkpoint

    g_t, d_t, g_ema_t = load_network_pickle(src, reference)

    res = g_t.img_resolution
    channels = g_t.img_channels
    c_dim = g_t.c_dim
    cbase = g_t.synthesis.b4.conv1.out_channels * 4  # min(cbase/4, cmax) at res 4
    print(f"G: res={res} ch={channels} c_dim={c_dim} z={g_t.z_dim} w={g_t.w_dim}")

    g = Generator(
        z_dim=g_t.z_dim, c_dim=c_dim, w_dim=g_t.w_dim,
        img_resolution=res, img_channels=channels,
        mapping_kwargs=dict(num_layers=g_t.mapping.num_layers),
        synthesis_kwargs=dict(channel_base=cbase),
    )
    d = Discriminator(c_dim=c_dim, img_resolution=res, img_channels=channels,
                      channel_base=cbase)
    opt_g = lazy_reg_adam(0.0025, reg_interval=4)
    opt_d = lazy_reg_adam(0.0025, reg_interval=16)
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), opt_g, opt_d,
        z_dim=g_t.z_dim, c_dim=c_dim, img_resolution=res, img_channels=channels,
    )

    state = transplant_into_state(state, g_t, d_t, g_ema_t)
    path = save_checkpoint(dst, state, step=0)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
