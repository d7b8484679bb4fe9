"""Multi-host dryrun: 2 processes × 4 virtual CPU devices, one real train step.

Validates the multi-host path end-to-end without pod hardware
(SURVEY §2.9; reference per-GPU process groups ``train_mi_multimodal.py:27-49``):

* ``initialize_distributed()`` picks up the JAX_COORDINATOR_ADDRESS /
  JAX_NUM_PROCESSES / JAX_PROCESS_ID env contract,
* a global 8-device mesh spans both processes,
* each process feeds only its process-local batch shard through
  ``shard_batch`` (``make_array_from_process_local_data``),
* the shard_map train step runs its psums over Gloo,
* both processes agree on the updated parameter checksum.

Run: ``python scripts/dryrun_multiprocess.py`` (parent spawns 2 workers).
"""
import os
import subprocess
import sys

PORT = int(os.environ.get("DRYRUN_MP_PORT", "45891"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(pid: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_CPU_ENABLE_ASYNC_DISPATCH"] = "0"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{PORT}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)
    sys.path.insert(0, REPO)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gantrack_tpu.parallel.mesh import create_mesh, initialize_distributed, shard_batch

    assert initialize_distributed(), "env contract not recognised"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    from gantrack_tpu.models.stylegan2 import Discriminator, Generator
    from gantrack_tpu.training import (
        StyleGAN2Loss, StyleGAN2LossConfig, TrainStepConfig, TrainStepper,
        create_train_state, lazy_reg_adam,
    )

    res, zdim, global_batch = 16, 8, 8
    g = Generator(
        z_dim=zdim, c_dim=0, w_dim=zdim, img_resolution=res, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=128, channel_max=32, num_fp16_res=0),
    )
    d = Discriminator(
        c_dim=0, img_resolution=res, img_channels=1,
        channel_base=128, channel_max=32, num_fp16_res=0,
        epilogue_kwargs=dict(mbstd_group_size=1),
    )
    opt_g = lazy_reg_adam(0.002, reg_interval=4)
    opt_d = lazy_reg_adam(0.002, reg_interval=16)
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), opt_g, opt_d,
        z_dim=zdim, c_dim=0, img_resolution=res, img_channels=1,
    )
    loss = StyleGAN2Loss(g, d, StyleGAN2LossConfig(r1_gamma=0.1, pl_weight=0.0,
                                                   style_mixing_prob=0.0))
    mesh = create_mesh()
    stepper = TrainStepper(
        loss, opt_g, opt_d,
        TrainStepConfig(batch_size=global_batch, z_dim=zdim), mesh)

    # Per-process local shard: rows [pid*4, pid*4+4) of the global batch.
    full = np.random.default_rng(0).standard_normal(
        (global_batch, res, res, 1)).astype(np.float32)
    local = full[pid * 4 : (pid + 1) * 4]
    images = shard_batch(mesh, jnp.asarray(local))
    assert images.shape[0] == global_batch, images.shape
    labels = shard_batch(mesh, jnp.zeros((4, 0), jnp.float32))

    state, _ = stepper.get(False, False)(state, images, labels)
    leaf = jax.tree.leaves(state.params_g)[0]
    checksum = float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))
    print(f"CHECKSUM {checksum:.6f}", flush=True)


def main() -> int:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # drop the axon plugin path: pure-CPU workers
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)
    ]
    sums, rcs = [], []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        rcs.append(p.returncode)
        tail = [l for l in out.splitlines() if l.startswith("CHECKSUM")]
        sums.append(tail[0] if tail else None)
        print(f"--- worker {pid} rc={p.returncode}")
        print("\n".join(out.splitlines()[-8:]))
    ok = rcs == [0, 0] and sums[0] is not None and sums[0] == sums[1]
    print(f"MULTIPROCESS_DRYRUN {'OK' if ok else 'FAIL'} {sums}")
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
    else:
        sys.exit(main())
