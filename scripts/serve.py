"""HTTP txt2img serving on one chip or a whole mesh.

POST /generate  {"prompt": "...", "steps": 30, "height": 512, "width": 512,
                 "guidance_scale": 7.5, "scheduler": "dpm", "seed": 0,
                 "adapter": "name"}        -> image/png
POST /adapters  {"name": "...", "path": "lora.safetensors"}  -> 200
                (register a LoRA/TI adapter for per-request routing)

Concurrent requests are micro-batched onto the device by
diffusion_finetuning_tpu.serving.GenerationServer; requests naming
different adapters batch separately and generate with their own LoRA trees
(multi-tenant serving — the pipe keeps an LRU of materialized merged
params per adapter).  With --data_parallel the pipeline shards each batch
across every local chip (params replicated, batch over the mesh's data
axis) and the batch ladder rounds to mesh multiples.

Usage: python scripts/serve.py MODEL_DIR [--lora path.safetensors]
       [--adapter name=path.safetensors ...] [--port 8000] [--max_batch 8]
       [--data_parallel]
"""

import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from diffusion_finetuning_tpu.pipelines.pipeline import StableDiffusionPipeline, patch_pipe
from diffusion_finetuning_tpu.serving import GenerationServer
from diffusion_finetuning_tpu.utils.cli import Fire


def serve(model_dir: str, lora: str = None, port: int = 8000,
          max_batch: int = 8, host: str = "127.0.0.1",
          data_parallel: bool = False, tensor_parallel: int = 1,
          adapter: list = ()):
    pipe = StableDiffusionPipeline.from_pretrained(model_dir, dtype=jnp.bfloat16)
    if lora:
        patch_pipe(pipe, lora, patch_unet=True, patch_text=True, patch_ti=True)
    if data_parallel or tensor_parallel > 1:
        import jax
        import numpy as np
        from jax.sharding import Mesh

        from diffusion_finetuning_tpu.parallel.mesh import make_mesh

        n = len(jax.devices())
        if tensor_parallel > 1:
            # (data, tp) mesh: each image's UNet denoise splits over tp
            # chips (Megatron column/row projections via tp_shardings),
            # concurrent requests still batch over the data axis
            assert n % tensor_parallel == 0, (
                f"{n} devices not divisible by tensor_parallel={tensor_parallel}")
            mesh = Mesh(
                np.array(jax.devices()).reshape(
                    n // tensor_parallel, tensor_parallel),
                ("data", "tp"),
            )
            pipe.shard_over(mesh)
            print(f"serving over {n} devices: data={n // tensor_parallel} "
                  f"x tp={tensor_parallel}")
        elif n > 1:
            pipe.shard_over(make_mesh(n))
            print(f"serving data-parallel over {n} devices")
    server = GenerationServer(pipe, max_batch=max_batch)
    # --adapter name=path (repeatable): pre-register multi-tenant adapters
    specs = [adapter] if isinstance(adapter, str) else list(adapter)
    for spec in specs:
        name, _, path = spec.partition("=")
        if not path:
            raise ValueError(f"--adapter expects name=path, got {spec!r}")
        server.register_adapter(name, path)
        print(f"registered adapter {name!r} from {path}")

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path == "/adapters":
                length = int(self.headers.get("Content-Length", 0))
                try:
                    body = json.loads(self.rfile.read(length) or b"{}")
                    server.register_adapter(body["name"], body["path"])
                    self.send_response(200)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                except Exception as e:
                    detail = " ".join(str(e).split())[:500]
                    self.send_error(400, "adapter registration failed", detail)
                return
            if self.path != "/generate":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(length) or b"{}")
                img = server.generate(
                    prompt=body.get("prompt", ""),
                    negative_prompt=body.get("negative_prompt", ""),
                    height=int(body.get("height", 512)),
                    width=int(body.get("width", 512)),
                    steps=int(body.get("steps", 30)),
                    guidance_scale=float(body.get("guidance_scale", 7.5)),
                    scheduler=body.get("scheduler", "dpm"),
                    seed=int(body.get("seed", 0)),
                    adapter=body.get("adapter"),
                )
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                data = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            except Exception as e:  # pragma: no cover
                # keep the status line protocol-clean; detail goes in the body
                detail = " ".join(str(e).split())[:500]
                self.send_error(500, "generation failed", detail)

        def log_message(self, fmt, *args):
            print(f"[serve] {fmt % args}")

    httpd = ThreadingHTTPServer((host, port), Handler)
    print(f"serving txt2img on http://{host}:{port}/generate")
    try:
        httpd.serve_forever()
    finally:
        server.close()


if __name__ == "__main__":
    Fire(serve)
