"""Production serving endpoint: the retrieval stack behind one HTTP port.

The reference is a batch CLI; deployment needs a long-lived process that
keeps the model compiled and the gallery HBM-resident and answers queries
at interactive latency. This module is that process — dependency-free
(stdlib ``http.server``), JSON/binary protocol:

  GET  /healthz            -> {"ok": true, "gallery": N, "dim": D, ...}
  POST /query              -> top-k for descriptor queries
        body: {"descriptors": [[...], ...], "k": 10,
               "qe_nqe": 0, "qe_alpha": 3.0, "diffusion": false,
               "nprobe": 8, "exact": 0, "refine": 0}
              (nprobe/exact: IVF knobs; refine: PQ rescore depth)
        or raw float32 bytes with X-Shape: Nq,D and query params in the
        URL (?k=10&qe=0&diffusion=0&nprobe=8&exact=0&refine=0)
        -> {"ids": [[...]], "scores": [[...]], "latency_ms": ...}
  POST /extract            -> descriptor for an image
        body: raw JPEG/PNG bytes -> {"descriptor": [...]}
  POST /extract_query      -> image bytes straight to top-k (one hop)

Device discipline: JAX dispatch is not thread-safe per-request here — a
single lock serializes device work (one TPU chip = one compute stream;
HTTP threads only overlap host I/O and JSON encoding). The first request
of each (shape, k) pays the jit compile; operators should warm the pod
with a canary query.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class RetrievalService:
    """The servable: an Index (+ optional Extractor for image queries,
    + optional IVF quantizer for approximate low-latency search).

    With ``ivf`` set, plain top-k queries go through the coarse-quantized
    probe path (``retrieval.ivf``) — the single-query HBM traffic drops to
    ``nprobe/C`` of the gallery, which is exactly the serving-latency
    case IVF exists for. ``pq`` (a ``retrieval.pq`` PQIndex/IVFPQIndex,
    exclusive with ``ivf``) serves ADC search over the compressed codes
    instead, with ``refine`` exact-rescored candidates per request.
    Requests can tune ``nprobe``/``refine`` or force the exact path
    per-call (``exact=1``); QE/diffusion requests always use the exact
    path (both re-rank against the FULL gallery by construction).
    """

    def __init__(self, index, extractor=None, db_names=None,
                 ivf=None, nprobe: int = 8, pq=None, refine: int = 0):
        if ivf is not None and pq is not None:
            raise ValueError("ivf and pq are exclusive (an IVFPQIndex "
                             "already embeds its coarse quantizer)")
        self.index = index
        self.extractor = extractor
        self.db_names = db_names
        self.ivf = ivf
        self.nprobe = nprobe
        self.pq = pq
        self.refine = refine
        self._lock = threading.Lock()  # serializes TPU dispatch

    def query(self, q: np.ndarray, k: int = 10, qe_nqe: int = 0,
              qe_alpha: float = 3.0, diffusion: bool = False,
              nprobe: Optional[int] = None, exact: bool = False,
              refine: Optional[int] = None):
        q = np.atleast_2d(np.asarray(q, np.float32))
        approx_ok = not exact and not diffusion and not qe_nqe
        use_ivf = self.ivf is not None and approx_ok
        use_pq = self.pq is not None and approx_ok
        with self._lock:
            if use_pq:
                from image_retrieval_for_image_based_localization_tpu.retrieval.pq import (
                    IVFPQIndex,
                )

                r = self.refine if refine is None else refine
                kw = dict(k=k, refine=r,
                          gallery=self.index.gallery if r else None)
                if isinstance(self.pq, IVFPQIndex):
                    kw["nprobe"] = nprobe or self.nprobe
                scores, idx = self.pq.search(
                    self.index.transform_queries(q), **kw)
            elif use_ivf:
                scores, idx = self.ivf.search(
                    self.index.transform_queries(q), k=k,
                    nprobe=nprobe or self.nprobe)
            elif diffusion:
                ranks = self.index.diffusion_ranks(
                    q, qe_nqe=qe_nqe, qe_alpha=qe_alpha)
                idx = ranks[:k].T
                scores = np.zeros(idx.shape, np.float32)
            else:
                scores, idx = self.index.query(
                    q, k=k, qe_nqe=qe_nqe, qe_alpha=qe_alpha)
        names = None
        if self.db_names is not None:
            names = [[self.db_names[int(i)] for i in row] for row in idx]
        elif self.index.ids is not None:
            names = [[str(self.index.ids[int(i)]) for i in row] for row in idx]
        return scores, idx, names

    def extract(self, image_bytes: bytes) -> np.ndarray:
        if self.extractor is None:
            raise RuntimeError("no model loaded (start with --network or "
                               "--checkpoint to serve /extract)")
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(image_bytes)).convert("RGB"))
        import tempfile, os

        # the Extractor's public entry is path-based (it owns resize policy)
        with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
            Image.fromarray(img).save(f, format="PNG")
            path = f.name
        try:
            with self._lock:
                d = self.extractor.extract([path])
        finally:
            os.unlink(path)
        return np.asarray(d)[0]


def _make_handler(service: RetrievalService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; metrics go to the JSON replies
            pass

        def _send(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.rstrip("/") in ("", "/healthz"):
                self._send(200, {
                    "ok": True,
                    "gallery": int(service.index.gallery.shape[0]),
                    "dim": int(service.index.gallery.shape[1]),
                    "model": service.extractor is not None,
                    "ivf": None if service.ivf is None else {
                        "clusters": int(service.ivf.centroids.shape[0]),
                        "nprobe": service.nprobe,
                        "pad_ratio": round(service.ivf.pad_ratio, 3),
                    },
                    "pq": None if service.pq is None else {
                        "m": int(service.pq.codebooks.shape[0]),
                        "refine": service.refine,
                        "ivf": hasattr(service.pq, "centroids"),
                    },
                })
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        def do_POST(self):
            t0 = time.time()
            try:
                path, _, qs = self.path.partition("?")
                params = dict(
                    kv.split("=", 1) for kv in qs.split("&") if "=" in kv
                )
                if path == "/query":
                    raw = self._body()
                    shape = self.headers.get("X-Shape")
                    if shape:  # raw float32 payload
                        nq, d = (int(v) for v in shape.split(","))
                        q = np.frombuffer(raw, np.float32).reshape(nq, d)
                        req = {}
                    else:
                        req = json.loads(raw)
                        q = np.asarray(req["descriptors"], np.float32)
                    k = int(req.get("k", params.get("k", 10)))
                    qe = int(req.get("qe_nqe", params.get("qe", 0)))
                    qa = float(req.get("qe_alpha", params.get("qe_alpha", 3.0)))
                    diff_raw = req.get("diffusion",
                                       params.get("diffusion", 0))
                    diff = (bool(int(diff_raw))
                            if isinstance(diff_raw, (str, int))
                            else bool(diff_raw))
                    np_raw = req.get("nprobe", params.get("nprobe"))
                    rf_raw = req.get("refine", params.get("refine"))
                    exact = bool(int(req.get("exact",
                                             params.get("exact", 0))))
                    scores, idx, names = service.query(
                        q, k=k, qe_nqe=qe, qe_alpha=qa, diffusion=diff,
                        nprobe=None if np_raw is None else int(np_raw),
                        exact=exact,
                        refine=None if rf_raw is None else int(rf_raw))
                    self._send(200, {
                        "ids": idx.tolist(),
                        "scores": np.asarray(scores, np.float64).tolist(),
                        "names": names,
                        "latency_ms": round((time.time() - t0) * 1e3, 2),
                    })
                elif path in ("/extract", "/extract_query"):
                    d = service.extract(self._body())
                    if path == "/extract":
                        self._send(200, {
                            "descriptor": d.astype(np.float64).tolist(),
                            "latency_ms": round((time.time() - t0) * 1e3, 2),
                        })
                    else:
                        k = int(params.get("k", 10))
                        scores, idx, names = service.query(d[None], k=k)
                        self._send(200, {
                            "ids": idx[0].tolist(),
                            "scores": np.asarray(
                                scores[0], np.float64).tolist(),
                            "names": None if names is None else names[0],
                            "latency_ms": round((time.time() - t0) * 1e3, 2),
                        })
                else:
                    self._send(404, {"error": f"unknown path {path}"})
            except Exception as e:  # noqa: BLE001 - reply, don't kill server
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(
    index,
    extractor=None,
    db_names=None,
    host: str = "127.0.0.1",
    port: int = 7878,
    block: bool = True,
    ivf=None,
    nprobe: int = 8,
    pq=None,
    refine: int = 0,
) -> ThreadingHTTPServer:
    """Start the retrieval service; returns the server (non-blocking mode
    runs it on a daemon thread — used by tests and embedders)."""
    service = RetrievalService(index, extractor=extractor, db_names=db_names,
                               ivf=ivf, nprobe=nprobe, pq=pq, refine=refine)
    srv = ThreadingHTTPServer((host, port), _make_handler(service))
    if block:
        print(f"serving gallery[{index.gallery.shape[0]}] on "
              f"http://{host}:{srv.server_address[1]}")
        srv.serve_forever()
    else:
        threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
