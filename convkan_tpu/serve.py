"""Production inference server for trained convkan_tpu models.

The reference has no serving story beyond whole-module pickles
(evaluations.py:225); its deployment surface ends at `model(x)`.  This
module completes ours: an HTTP server (stdlib only) over the jitted
forward with the properties a TPU serving path needs —

  * **shape buckets, compiled once**: batches are padded up to a fixed
    set of bucket sizes and every bucket is warmed at startup, so no
    request ever triggers an XLA recompile;
  * **dynamic batching**: concurrent requests are coalesced (up to
    ``max_batch``, waiting at most ``batch_timeout_ms``) into one device
    step — single-request latency stays flat while throughput scales;
  * **uint8 ingress**: clients send raw image bytes/arrays; dataset
    normalization (train/data.py constants) runs on device;
  * optional **BN folding** (utils/fold_bn.py) and **bf16** serving
    precision, same knobs as `bench.py --serving`.

CLI (train.py's reference-parity flag vocabulary picks the model):

    python -m convkan_tpu.serve --model VGGKAN --arch VGG16_kansmall \\
        --dataset CIFAR10 --results_dir runs --kind best --port 8421

    curl -s localhost:8421/predict -d '{"instances": [[[..HxWxC..]]]}'

Endpoints: POST /predict  {"instances": [...uint8 HWC arrays...]}
           -> {"predictions": [[per-class logits]...], "batch": n}
           GET  /healthz   -> {"ok": true, "model": "...", "buckets": [...]}
           GET  /metrics   -> request/instance/device-batch counters +
                              device-step latency p50/p95/p99
"""

from __future__ import annotations

import collections
import json
import os
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

import numpy as np


class InferenceEngine:
    """Bucketed, dynamically-batched jitted forward.

    Programmatic core of the server (tests drive this directly):
        eng = InferenceEngine(model, variables, dataset, input_shape)
        logits = eng.predict(batch_uint8)        # direct, padded+jitted
        logits = eng.submit(one_uint8_image)     # through the batching queue
    """

    def __init__(self, model, variables, dataset: str,
                 input_shape: Sequence[int],
                 buckets: Sequence[int] = (1, 8, 64),
                 max_batch: Optional[int] = None,
                 batch_timeout_ms: float = 2.0,
                 bf16: bool = False, int8: bool = False,
                 warmup: bool = True, mesh=None):
        import jax
        import jax.numpy as jnp

        from . import config as _cfg
        from .train.data import normalize_batch

        if int8 and bf16:
            raise ValueError("pick one serving precision: --int8 or --bf16")
        if int8 and model is None:
            raise ValueError("--int8 needs a live model; a StableHLO "
                             "artifact's precision is baked at export time")

        self.model = model
        self.dataset = dataset
        self.input_shape = tuple(input_shape)
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        self.max_batch = int(max_batch or self.buckets[-1])
        self.batch_timeout_s = batch_timeout_ms / 1e3
        self.mesh = mesh
        if mesh is not None:
            # multi-chip serving: batch sharded over the mesh's data axes,
            # params replicated (the same GSPMD recipe as training).
            # Buckets must split evenly across the data axes.
            from .parallel.mesh import batch_axes

            n_data = 1
            for ax, size in zip(mesh.axis_names, mesh.devices.shape):
                if ax in batch_axes(mesh):
                    n_data *= size
            bad = [b for b in self.buckets if b % n_data]
            if bad:
                raise ValueError(
                    f"buckets {bad} not divisible by the mesh's "
                    f"{n_data} data-parallel devices")

        def fwd(x_uint8):
            x = normalize_batch(x_uint8, dataset)
            if bf16:
                x = x.astype(jnp.bfloat16)
            # the context manager runs at trace time, which is exactly when
            # ops/conv.py consults the mode — every re-trace (one per bucket
            # shape) sees it active
            with _cfg.quant_mode("int8" if int8 else None):
                out = model.apply(variables, x, train=False)
            return out.astype(jnp.float32)

        if model is None:
            # exported-artifact mode (from_exported): `variables` is the
            # raw logits callable; normalization still runs on device
            def fwd(x_uint8):  # noqa: F811
                x = normalize_batch(x_uint8, dataset)
                return jnp.asarray(variables(x), jnp.float32)

        if mesh is None:
            self._fwd = jax.jit(fwd)
        elif model is None:
            raise ValueError("mesh serving needs a live model, not an "
                             "exported artifact (the blob's shardings are "
                             "baked at export time)")
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .parallel.mesh import batch_axes

            in_sh = NamedSharding(
                mesh, P(batch_axes(mesh), *([None] * len(self.input_shape))))
            out_sh = NamedSharding(mesh, P(batch_axes(mesh), None))
            self._fwd = jax.jit(fwd, in_shardings=in_sh,
                                out_shardings=out_sh)

        if warmup:
            for b in self.buckets:
                np.asarray(self._fwd(np.zeros((b,) + self.input_shape,
                                              np.uint8)))

        self._stats_lock = threading.Lock()
        self._stats = {"requests": 0, "instances": 0, "device_batches": 0}
        self._latencies_ms: "collections.deque" = collections.deque(
            maxlen=1024)

        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._batch_loop, daemon=True)
        self._worker.start()

    @classmethod
    def from_exported(cls, blob: bytes, dataset: str,
                      input_shape: Sequence[int], **kwargs):
        """Serve a `utils/export.export_forward` StableHLO artifact —
        the full production loop (train → export → serve) without the
        model class or checkpoint on the serving host.  The artifact's
        symbolic batch dimension makes every bucket size valid."""
        from .utils.export import load_forward

        return cls(None, load_forward(blob), dataset, input_shape,
                   **kwargs)

    # ---------------------------------------------------------- direct path
    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def predict(self, x_uint8: np.ndarray) -> np.ndarray:
        """Run a whole batch now (padding to the enclosing bucket; batches
        beyond the largest bucket run in largest-bucket chunks)."""
        x = np.asarray(x_uint8, np.uint8)
        if len(x) == 0:
            raise ValueError("empty batch")
        if x.shape[1:] != self.input_shape:
            raise ValueError(
                f"instance shape {x.shape[1:]} != expected "
                f"{self.input_shape} for dataset {self.dataset}")
        outs = []
        cap = self.buckets[-1]
        for i in range(0, len(x), cap):
            chunk = x[i:i + cap]
            n = len(chunk)
            b = self._bucket_for(n)
            if n < b:
                chunk = np.concatenate(
                    [chunk, np.zeros((b - n,) + self.input_shape,
                                     np.uint8)])
            t0 = time.perf_counter()
            outs.append(np.asarray(self._fwd(chunk))[:n])
            ms = (time.perf_counter() - t0) * 1e3
            with self._stats_lock:
                self._stats["instances"] += n
                self._stats["device_batches"] += 1
                self._latencies_ms.append(ms)
        return np.concatenate(outs)

    def count_request(self):
        with self._stats_lock:
            self._stats["requests"] += 1

    def metrics(self) -> dict:
        """Counters + device-step latency percentiles (last 1024 steps)."""
        import math

        with self._stats_lock:
            lat = sorted(self._latencies_ms)
            out = dict(self._stats)
        if lat:
            # nearest-rank percentile: ceil(q*n)-1 (int(q*n) is biased one
            # rank high for even n — p50 of [1, 9] must be 1, not 9)
            def pct(q):
                i = max(0, math.ceil(q * len(lat)) - 1)
                return round(lat[i], 3)

            out["device_step_ms"] = {"p50": pct(0.50), "p95": pct(0.95),
                                     "p99": pct(0.99), "n": len(lat)}
        return out

    # ------------------------------------------------------- batched path
    def submit(self, instance: np.ndarray, timeout: float = 30.0):
        """Enqueue ONE instance; blocks until its result is ready.  Called
        from many request threads concurrently — the worker coalesces
        whatever is queued into a single device step."""
        if self._stop.is_set():
            raise RuntimeError("engine closed")
        instance = np.asarray(instance, np.uint8)
        if instance.shape != self.input_shape:
            # validate HERE so one malformed instance cannot poison the
            # whole coalesced batch of other callers' requests
            raise ValueError(
                f"instance shape {instance.shape} != expected "
                f"{self.input_shape} for dataset {self.dataset}")
        box = {"event": threading.Event()}
        self._queue.put((instance, box))
        if self._stop.is_set() and not box["event"].wait(0.1):
            # close() raced our enqueue: its drain may already have missed
            # this item, so fail fast instead of waiting out the timeout
            raise RuntimeError("engine closed")
        if not box["event"].wait(timeout):
            # mark abandoned so the worker sheds it instead of spending a
            # device step on a result nobody is waiting for (under
            # sustained overload the backlog could otherwise never drain)
            box["abandoned"] = True
            raise TimeoutError("inference timed out")
        if "error" in box:
            raise RuntimeError(box["error"])
        return box["result"]

    def _batch_loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.batch_timeout_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            # shed instances whose submitter already timed out (their box
            # write is GIL-atomic; a concurrent mark after this filter just
            # computes one wasted row, not a wasted step)
            batch = [b for b in batch if not b[1].get("abandoned")]
            if not batch:
                continue
            arrays = [b[0] for b in batch]
            boxes = [b[1] for b in batch]
            try:
                preds = self.predict(np.stack(arrays))
                for box, row in zip(boxes, preds):
                    box["result"] = row
            except Exception as e:  # surface to every waiter, keep serving
                for box in boxes:
                    box["error"] = f"{type(e).__name__}: {e}"
            for box in boxes:
                box["event"].set()

    def close(self):
        self._stop.set()
        self._worker.join(timeout=2.0)
        # flush anything still queued so blocked submit() callers fail
        # immediately instead of waiting out their timeout
        while True:
            try:
                _, box = self._queue.get_nowait()
            except queue.Empty:
                break
            box["error"] = "engine closed"
            box["event"].set()


# ------------------------------------------------------------------ HTTP
def _make_handler(engine: InferenceEngine, model_name: str):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True, "model": model_name,
                                 "dataset": engine.dataset,
                                 "input_shape": list(engine.input_shape),
                                 "buckets": list(engine.buckets)})
            elif self.path == "/metrics":
                self._send(200, engine.metrics())
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            engine.count_request()
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                instances = np.asarray(req["instances"], np.uint8)
                if instances.shape[1:] != engine.input_shape:
                    raise ValueError(
                        f"instance shape {instances.shape[1:]} != "
                        f"{engine.input_shape}")
                t0 = time.perf_counter()
                if len(instances) == 1:
                    # single request: ride the dynamic batcher so
                    # concurrent clients share one device step
                    preds = engine.submit(instances[0])[None]
                else:
                    preds = engine.predict(instances)
                ms = (time.perf_counter() - t0) * 1e3
                self._send(200, {"predictions": preds.tolist(),
                                 "batch": len(instances),
                                 "latency_ms": round(ms, 3)})
            except (ValueError, KeyError, TypeError, OverflowError,
                    json.JSONDecodeError) as e:
                # OverflowError: numpy 2.x raises it for out-of-uint8-range
                # payload ints (e.g. 256) — a client error, not a 500
                self._send(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:
                # server-side fault (device error, inference timeout,
                # worker death) — 5xx so retry/alerting policies engage
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


class _Server(ThreadingHTTPServer):
    # socketserver's default listen backlog of 5 drops (connection-reset)
    # bursts of concurrent clients; a serving frontend needs headroom
    request_queue_size = 128
    daemon_threads = True


def make_server(engine: InferenceEngine, model_name: str, host: str,
                port: int) -> ThreadingHTTPServer:
    return _Server((host, port), _make_handler(engine, model_name))


def build_engine(args, train_mod=None):
    """Model + weights + engine from the parsed train.py-vocabulary args
    (the testable core of main)."""
    from .migrate import _dataset_input_shape, _load_train_module

    import jax
    import jax.numpy as jnp

    train = train_mod or _load_train_module()
    input_shape = _dataset_input_shape(args)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    if getattr(args, "stablehlo", None):
        # artifact mode bakes precision/folding/shardings at export time;
        # reject rather than silently drop these flags
        dropped = [f for f, on in
                   [("--bf16", args.bf16), ("--fold_bn", args.fold_bn),
                    ("--int8", getattr(args, "int8", False)),
                    ("--mesh_data", getattr(args, "mesh_data", None)),
                    ("--bf16_island", getattr(args, "bf16_island", False))]
                   if on]
        if dropped:
            raise SystemExit(
                f"{' '.join(dropped)} cannot apply to a --stablehlo "
                "artifact: precision, BN folding and shardings are baked "
                "at export time (utils/export.export_forward)")
        with open(args.stablehlo, "rb") as f:
            blob = f.read()
        engine = InferenceEngine.from_exported(
            blob, args.dataset, input_shape, buckets=buckets,
            batch_timeout_ms=args.batch_timeout_ms)
        return engine, os.path.basename(args.stablehlo)
    if getattr(args, "bf16_island", False) or args.bf16:
        # honor the train.py mixed-precision flag at serving time too
        # (process default, set before the model is built).  --bf16 implies
        # the island: casting only the input would leave the f32 basis
        # constants promoting the conv back to f32 (see bench.py
        # measure_serving) — the island is the supported bf16 path.
        from .nn.kan_conv import set_perf_defaults

        set_perf_defaults(island_bf16=True)
    num_classes = 100 if args.dataset == "CIFAR100" else 10
    model = train.build_model(args, input_shape, num_classes)
    name = args.ckpt_name or getattr(model, "model_name",
                                     type(model).__name__)

    if args.init_random:
        variables = model.init(jax.random.PRNGKey(args.seed),
                               jnp.zeros((1,) + input_shape, jnp.float32),
                               train=False)
    else:
        from .train.checkpoint import restore_checkpoint

        root = os.path.join(args.results_dir, args.dataset, "models")
        payload = restore_checkpoint(root, name, args.kind)
        # EMA-trained checkpoints serve their EMA weights (what the
        # epoch-loop evaluation/selection used — train/loop.py ema_decay)
        variables = {"params": payload.get("ema_params") or payload["params"]}
        if payload.get("batch_stats"):
            variables["batch_stats"] = payload["batch_stats"]
    if args.fold_bn:
        from .utils.fold_bn import fold_batch_norms

        variables, n = fold_batch_norms(variables, eps=args.bn_eps)
        print(f"folded {n} BatchNorms")

    mesh = None
    if getattr(args, "mesh_data", None) and args.mesh_data > 1:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(data=args.mesh_data)
    engine = InferenceEngine(model, variables, args.dataset, input_shape,
                             buckets=buckets,
                             batch_timeout_ms=args.batch_timeout_ms,
                             bf16=args.bf16,
                             int8=getattr(args, "int8", False), mesh=mesh)
    return engine, name


def main(argv=None):
    from .migrate import _load_train_module

    train = _load_train_module()
    p = train.build_parser()
    p.description = "Serve a trained convkan_tpu model over HTTP."
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8421)
    p.add_argument("--kind", default="best", choices=["best", "last"])
    p.add_argument("--ckpt_name", default=None)
    p.add_argument("--init_random", action="store_true",
                   help="serve freshly initialized weights (smoke tests)")
    p.add_argument("--stablehlo", default=None,
                   help="serve a utils/export.export_forward artifact "
                        "instead of model+checkpoint (no model code needed)")
    p.add_argument("--fold_bn", action="store_true",
                   help="fold conv->BN pairs before serving (fold_bn.py)")
    p.add_argument("--bn_eps", type=float, default=1e-5)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 serving: input cast + the layers' bf16 "
                        "compute islands (same recipe as bench.py "
                        "--serving --bf16; measured a wash vs f32 on v5e "
                        "at CIFAR shapes — see BENCH_NOTES.md)")
    p.add_argument("--int8", action="store_true",
                   help="dynamic int8 PTQ for every conv (config.py "
                        "quant_mode; s8xs8->s32 on the MXU, per-output-"
                        "channel weight scales)")
    p.add_argument("--buckets", default="1,8,64",
                   help="comma-separated batch buckets, compiled+warmed "
                        "at startup")
    p.add_argument("--batch_timeout_ms", type=float, default=2.0)
    args = p.parse_args(argv)
    engine, name = build_engine(args, train)
    server = make_server(engine, name, args.host, args.port)
    print(f"serving {name} ({args.dataset}, buckets {engine.buckets}) "
          f"on http://{args.host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.close()


if __name__ == "__main__":
    main()
