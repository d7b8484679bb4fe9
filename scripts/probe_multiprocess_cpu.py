"""Probe: 2-process × 4-virtual-CPU-device jax.distributed on one machine.

Parent spawns itself twice with process ids; each initializes the
distributed runtime, builds a global mesh, assembles a global batch from
process-local shards, and runs a psum. Establishes whether this jaxlib
supports multi-process CPU collectives (for the multi-host dryrun test).
"""
import os
import subprocess
import sys


def worker(pid: int, port: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("PYTHONPATH", None)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    devs = jax.devices()
    print(f"pid{pid}: {len(devs)} global devices, {jax.local_device_count()} local",
          flush=True)
    mesh = Mesh(np.asarray(devs), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    local = np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 100 * pid
    garr = jax.make_array_from_process_local_data(sharding, local)
    print(f"pid{pid}: global shape {garr.shape}", flush=True)

    @jax.jit
    def f(x):
        return jnp.sum(x * 2)

    out = f(garr)
    print(f"pid{pid}: sum {float(out)}", flush=True)


def main():
    port = 45677
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "worker", str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=180)
        print(f"--- worker {pid} (rc={p.returncode}) ---")
        print(out[-2000:])


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
