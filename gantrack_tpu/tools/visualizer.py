"""Interactive network visualizer, rebuilt for a headless TPU environment.

The reference ships a CUDA/OpenGL desktop GUI
(``/root/reference/src/models/stylegan3/visualizer.py`` + ``viz/*`` +
``gui_utils/*``, 2574 LoC): glfw window, imgui widgets, an AsyncRenderer
process.  None of that maps to a display-less TPU pod — the TPU-era
equivalent is a tiny HTTP server + browser page, which is what this is.
Capability parity with the reference widgets:

* latent widget (``viz/latent_widget.py``) — seed picker + a second seed
  with a blend slider (w-space lerp);
* style-mixing widget (``viz/stylemix_widget.py``) — a mixing seed whose
  w replaces layers ≥ cutoff (equivalent to truncate-then-mix, since the
  shared-psi truncation lerp commutes with row swaps);
* truncation/noise widget (``viz/trunc_noise_widget.py``) — psi slider
  and noise mode, **without recompilation**: mapping runs with psi=1 and
  the truncation lerp ``w_avg + (w − w_avg)·psi`` is applied between the
  two jitted halves (mapping / synthesis), so every slider value reuses
  the same two compiled programs;
* layer widget (``viz/layer_widget.py``) — layer table + channel-grid
  view of any intermediate activation (flax ``capture_intermediates``;
  the many-output program compiles lazily on first use);
* equivariance/transform widget (``viz/equivariance_widget.py``) —
  rotate/translate sliders for StyleGAN3's input transform, passed as a
  *traced* 3×3 matrix so dragging never recompiles;
* performance widget (``viz/performance_widget.py``) — per-request
  render time returned in the ``X-Render-Ms`` header and shown in the UI;
* pickle widget — the checkpoint/run-dir is picked on the command line
  (``--network``), same contract as ``gen_images``.

Single render lock instead of the reference's AsyncRenderer: requests
serialise on the one chip, which is the correct behaviour there anyway.
"""

from __future__ import annotations

import functools
import io
import json
import re
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import click
import numpy as np

from .capture_layers import channel_grid, flatten_intermediates


class RenderEngine:
    """Two-program render path (mapping | synthesis) with host-side
    truncation, plus a lazily-compiled capture variant for layer view."""

    def __init__(self, g, vars_g: Dict, channels: int):
        import jax
        import jax.numpy as jnp

        self.g = g
        self.vars = vars_g
        self.channels = channels
        self.lock = threading.Lock()
        self.w_avg = np.asarray(vars_g["emas"]["mapping"]["w_avg"])
        consts = vars_g.get("consts", {})
        self.has_transform = "transform" in consts.get("synthesis", {}).get("input", {})
        # SG3 synthesis has no per-pixel noise argument; SG2 defaults to
        # "random", which would demand an rng per render.
        self._sk = {} if "stylegan3" in type(g).__module__ else {"noise_mode": "const"}

        self._map = jax.jit(functools.partial(
            g.apply, vars_g, method=lambda m, z, c: m.mapping(z, c)))

        def synth(ws, transform):
            v = vars_g
            if self.has_transform:
                v = jax.tree.map(lambda x: x, vars_g)  # shallow functional copy
                v["consts"]["synthesis"]["input"]["transform"] = transform
            return g.apply(v, ws, method=lambda m, w: m.synthesis(w, **self._sk))

        self._synth = jax.jit(synth)
        self._capture = None
        self._jnp = jnp

    # ---------------------------------------------------------- latents

    def _ws(self, seed: int, psi: float, seed2: Optional[int], blend: float,
            mix_seed: Optional[int] = None, mix_cutoff: int = 0):
        import jax

        z = jax.random.normal(jax.random.PRNGKey(int(seed)), (1, self.g.z_dim))
        ws = self._map(z, None)
        if seed2 is not None and blend > 0:
            z2 = jax.random.normal(jax.random.PRNGKey(int(seed2)), (1, self.g.z_dim))
            ws = ws + (self._map(z2, None) - ws) * float(blend)  # w-space lerp
        ws = np.array(ws)
        if mix_seed is not None and 0 < mix_cutoff < ws.shape[1]:
            # Style mixing (viz/stylemix_widget.py): fine layers
            # [cutoff:] take their w from the mixing seed.
            zm = jax.random.normal(jax.random.PRNGKey(int(mix_seed)), (1, self.g.z_dim))
            ws[:, int(mix_cutoff):] = np.asarray(self._map(zm, None))[:, int(mix_cutoff):]
        return self.w_avg + (ws - self.w_avg) * float(psi)

    def _transform(self, rotate: float, tx: float, ty: float):
        from .gen_images import make_transform

        if not self.has_transform:
            return self._jnp.zeros((3, 3), np.float32)
        return self._jnp.asarray(
            np.linalg.inv(make_transform((tx, ty), rotate)), np.float32)

    # ----------------------------------------------------------- render

    def render(self, seed: int, psi: float = 1.0, seed2: Optional[int] = None,
               blend: float = 0.0, rotate: float = 0.0, tx: float = 0.0,
               ty: float = 0.0, mix_seed: Optional[int] = None,
               mix_cutoff: int = 0) -> np.ndarray:
        """→ uint8 [H, W] or [H, W, 3]."""
        with self.lock:
            ws = self._ws(seed, psi, seed2, blend, mix_seed, mix_cutoff)
            img = np.asarray(self._synth(
                self._jnp.asarray(ws), self._transform(rotate, tx, ty)))[0]
        img = np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)
        return img[:, :, 0] if self.channels == 1 else img[:, :, :3]

    # ------------------------------------------------------- layer view

    def _ensure_capture(self):
        import jax

        if self._capture is None:
            def cap(ws, transform):
                v = jax.tree.map(lambda x: x, self.vars)
                if self.has_transform:
                    v["consts"]["synthesis"]["input"]["transform"] = transform
                _, st = self.g.apply(
                    v, ws, method=lambda m, w: m.synthesis(w, **self._sk),
                    capture_intermediates=lambda mdl, mth: mth == "__call__",
                    mutable=["intermediates"],
                )
                return st["intermediates"]
            self._capture = jax.jit(cap)

    def layer_activations(self, seed: int, psi: float = 1.0,
                          rotate: float = 0.0, tx: float = 0.0,
                          ty: float = 0.0) -> Dict[str, np.ndarray]:
        with self.lock:
            self._ensure_capture()
            inter = self._capture(self._jnp.asarray(self._ws(seed, psi, None, 0.0)),
                                  self._transform(rotate, tx, ty))
        return {k: v for k, v in flatten_intermediates(inter).items()
                if np.asarray(v).ndim == 4}

    def layer_shapes(self) -> Dict[str, tuple]:
        """Layer table WITHOUT compiling or running anything:
        ``jax.eval_shape`` traces the capture function abstractly, so the
        page-load layer listing is instant and the heavy many-output
        program compiles only when a layer image is first requested."""
        import jax

        with self.lock:
            self._ensure_capture()
        ws = jax.ShapeDtypeStruct((1, int(self.g.num_ws), self.w_avg.shape[-1]),
                                  np.float32)
        tr = jax.ShapeDtypeStruct((3, 3), np.float32)
        inter = jax.eval_shape(self._capture, ws, tr)
        return {k: tuple(v.shape) for k, v in flatten_intermediates(inter).items()
                if hasattr(v, "shape") and len(v.shape) == 4}


_PAGE = """<!DOCTYPE html><html><head><title>gantrack visualizer</title><style>
body{font-family:system-ui;margin:1.2em;background:#16181d;color:#d5d9e0}
.row{display:flex;gap:2em}.panel{min-width:21em}
label{display:block;margin:.7em 0 .15em;font-size:.85em;color:#9aa3b2}
input[type=range]{width:100%}input[type=number],select{width:7em;background:#22252d;
color:#d5d9e0;border:1px solid #3a3f4b;border-radius:4px;padding:2px 6px}
img{image-rendering:pixelated;border:1px solid #3a3f4b;border-radius:6px}
#perf{margin-top:.8em;font-size:.8em;color:#9aa3b2}h1{font-size:1.1em}
</style></head><body><h1>gantrack_tpu visualizer</h1><div class=row>
<div class=panel>
<label>seed <input id=seed type=number value=0></label>
<label>blend seed <input id=seed2 type=number value=1></label>
<label>blend <span id=blendv>0.00</span>
 <input id=blend type=range min=0 max=1 step=0.01 value=0></label>
<label>truncation psi <span id=psiv>1.00</span>
 <input id=psi type=range min=-1 max=2 step=0.01 value=1></label>
<label>style-mix seed <input id=mix_seed type=number value='' placeholder=off></label>
<label>mix cutoff layer <span id=mix_cutoffv>0</span>
 <input id=mix_cutoff type=range min=0 max=16 step=1 value=0></label>
<div id=xform style=display:none>
<label>rotate° <span id=rotatev>0</span>
 <input id=rotate type=range min=-180 max=180 step=1 value=0></label>
<label>translate x <span id=txv>0.00</span>
 <input id=tx type=range min=-1 max=1 step=0.01 value=0></label>
<label>translate y <span id=tyv>0.00</span>
 <input id=ty type=range min=-1 max=1 step=0.01 value=0></label></div>
<label>layer view <select id=layer><option value=''>(output)</option></select></label>
<div id=perf></div></div>
<div><img id=out width=512 height=512></div></div><script>
const ids=['seed','seed2','blend','psi','rotate','tx','ty','mix_seed','mix_cutoff'];
let timer=null;
function q(){const p=new URLSearchParams();
 ids.forEach(i=>p.set(i,document.getElementById(i).value));
 const l=document.getElementById('layer').value;
 return (l?'/api/layer?name='+encodeURIComponent(l)+'&':'/api/render?')+p;}
let lastUrl=null;
async function refresh(){const t0=performance.now();const r=await fetch(q());
 const perf=document.getElementById('perf');
 if(!r.ok){perf.textContent='error: '+await r.text();return;} // keep last frame
 const ms=r.headers.get('X-Render-Ms');const b=await r.blob();
 if(lastUrl)URL.revokeObjectURL(lastUrl);
 lastUrl=URL.createObjectURL(b);
 document.getElementById('out').src=lastUrl;
 perf.textContent=
  'render '+ms+' ms (round-trip '+(performance.now()-t0).toFixed(0)+' ms)';}
function arm(){clearTimeout(timer);timer=setTimeout(refresh,120);
 ['blend','psi','rotate','tx','ty'].forEach(i=>{const e=document.getElementById(i);
  document.getElementById(i+'v').textContent=(+e.value).toFixed(2);});
 document.getElementById('mix_cutoffv').textContent=
  document.getElementById('mix_cutoff').value;}
ids.forEach(i=>document.getElementById(i).addEventListener('input',arm));
document.getElementById('layer').addEventListener('change',arm);
fetch('/api/info').then(r=>r.json()).then(info=>{
 if(info.has_transform)document.getElementById('xform').style.display='';
 document.getElementById('mix_cutoff').max=info.num_ws;
 fetch('/api/layers').then(r=>r.json()).then(ls=>{const s=document.getElementById('layer');
  ls.layers.forEach(l=>{const o=document.createElement('option');
   o.value=l.name;o.textContent=l.name+'  '+l.shape.join('x');s.appendChild(o);});});});
refresh();</script></body></html>"""


def make_handler(engine: RenderEngine):
    from PIL import Image

    def png(arr: np.ndarray) -> bytes:
        buf = io.BytesIO()
        Image.fromarray(arr, "L" if arr.ndim == 2 else "RGB").save(buf, "png")
        return buf.getvalue()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, ctype: str, body: bytes, ms=None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            if ms is not None:
                self.send_header("X-Render-Ms", f"{ms:.1f}")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            qs = {k: v[0] for k, v in urllib.parse.parse_qs(url.query).items()}
            try:
                if url.path == "/":
                    self._send(200, "text/html", _PAGE.encode())
                elif url.path == "/api/info":
                    self._send(200, "application/json", json.dumps(dict(
                        resolution=engine.g.img_resolution,
                        channels=engine.channels, z_dim=engine.g.z_dim,
                        num_ws=int(engine.g.num_ws),
                        has_transform=engine.has_transform,
                    )).encode())
                elif url.path == "/api/layers":
                    shapes = engine.layer_shapes()  # abstract: no compile/run
                    self._send(200, "application/json", json.dumps(dict(
                        layers=[dict(name=k, shape=list(s[1:]))
                                for k, s in shapes.items()])).encode())
                elif url.path in ("/api/render", "/api/layer"):
                    args = dict(
                        seed=int(qs.get("seed", 0)),
                        psi=float(qs.get("psi", 1.0)),
                        rotate=float(qs.get("rotate", 0.0)),
                        tx=float(qs.get("tx", 0.0)), ty=float(qs.get("ty", 0.0)))
                    t0 = time.perf_counter()
                    if url.path == "/api/render":
                        img = engine.render(
                            seed2=int(qs.get("seed2", 0)) if qs.get("blend") else None,
                            blend=float(qs.get("blend", 0.0)),
                            mix_seed=int(qs["mix_seed"]) if qs.get("mix_seed") else None,
                            mix_cutoff=int(qs.get("mix_cutoff", 0)), **args)
                    else:
                        acts = engine.layer_activations(**args)
                        name = qs.get("name", "")
                        if name not in acts:
                            raise KeyError(f"unknown layer {name!r}")
                        img = channel_grid(acts[name][0])
                    self._send(200, "image/png", png(img),
                               ms=(time.perf_counter() - t0) * 1000)
                else:
                    self._send(404, "text/plain", b"not found")
            except Exception as e:  # surface errors to the page
                self._send(500, "text/plain", f"{type(e).__name__}: {e}".encode())

    return Handler


def serve(engine: RenderEngine, host: str, port: int) -> ThreadingHTTPServer:
    httpd = ThreadingHTTPServer((host, port), make_handler(engine))
    return httpd


@click.command()
@click.option("--network", "checkpoint", required=True, help="Checkpoint path or run dir")
@click.option("--host", default="127.0.0.1", show_default=True)
@click.option("--port", type=int, default=8091, show_default=True)
@click.option("--resolution", type=int, default=256)
@click.option("--channels", type=int, default=1)
@click.option("--cfg", type=click.Choice(["stylegan2", "stylegan3-t", "stylegan3-r"]),
              default="stylegan2")
@click.option("--cbase", type=int, default=32768)
@click.option("--cmax", type=int, default=512)
@click.option("--map-depth", type=int, default=None)
def main(checkpoint, host, port, resolution, channels, cfg, cbase, cmax, map_depth):
    """Serve the interactive visualizer for a trained checkpoint."""
    import os

    from ..utils.checkpoint import resolve_network
    from .train import build_generator_from_cfg

    g = build_generator_from_cfg(
        cfg, resolution=resolution, channels=channels, c_dim=0,
        cbase=cbase, cmax=cmax, map_depth=map_depth,
    )
    state, path = resolve_network(checkpoint)
    if state is None:
        raise click.ClickException(f"no checkpoint found under {checkpoint}")
    print(f"Loading {path}")
    engine = RenderEngine(g, {
        "params": state["params_g_ema"], "emas": state["emas_g"],
        **state["consts_g"],
    }, channels)
    httpd = serve(engine, host, port)
    print(f"visualizer at http://{host}:{port}/  (ctrl-c to stop)")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
