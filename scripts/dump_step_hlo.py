"""Dump the OPTIMIZED HLO of the train step to /tmp/step_hlo_<variant>.txt.

Pairs with ``profile_step.py`` + ``parse_xplane.py events``: the profiler
gives hot op names (%fusion.N); this dump contains each fusion's body and
``metadata.op_name`` JAX source attribution — turning "20 ms of bf16[64]
reduce fusions" into named source ops.

usage: python scripts/dump_step_hlo.py [do_gpl do_dr1]
"""

import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from profile_step import build_stepper  # noqa: E402


def main():
    variant = tuple(bool(int(v)) for v in (sys.argv[1:3] or ["0", "0"]))
    stepper, state, imgs, zeros_c = build_stepper()
    fn = stepper.get(*variant)
    lowered = fn.lower(state, imgs, zeros_c)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = f"/tmp/step_hlo_{int(variant[0])}{int(variant[1])}.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out}: {len(txt)} chars, "
          f"{txt.count(chr(10))} lines, {txt.count('fusion')} fusion mentions")


if __name__ == "__main__":
    main()
