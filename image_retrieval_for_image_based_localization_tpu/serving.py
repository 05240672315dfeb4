"""Production serving endpoint: the retrieval stack behind one HTTP port.

The reference is a batch CLI; deployment needs a long-lived process that
keeps the model compiled and the gallery HBM-resident and answers queries
at interactive latency. This module is that process — dependency-free
(stdlib ``http.server``), JSON/binary protocol:

  GET  /healthz            -> {"ok": true, "gallery": N, "dim": D, ...}
  GET  /statz              -> per-endpoint rolling latency percentiles
                              (p50/p95/p99 over the last 2048 requests)
                              + micro-batching counters
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
  POST /admin/reload       -> hot-swap the index/ivf/pq artifacts from
                              the paths the server was STARTED with
                              (operator republishes files; clients can't
                              point the server at arbitrary paths)

Device discipline: JAX dispatch is not thread-safe per-request here — a
single lock serializes device work (one TPU chip = one compute stream;
HTTP threads only overlap host I/O and JSON encoding). The first request
of each (shape, k) pays the jit compile; operators should warm the pod
with a canary query.

Overload contract (``max_inflight`` / ``request_timeout_s``): at most
``max_inflight`` requests may be inside the service at once (waiting +
executing) — excess requests are shed immediately with **503 +
Retry-After** instead of queueing unboundedly on the device lock, and a
request that waits longer than ``request_timeout_s`` for device access
(lock or batch queue) gets **504**. ``/statz`` reports both counters.
``/healthz`` and ``/admin/reload`` bypass admission (operators must be
able to observe and republish DURING overload).

Micro-batching (``serve(batch_window_ms=...)`` / ``--batch-window-ms``):
concurrent default-knob plain queries coalesce into ONE device dispatch
(``MicroBatcher``) — at high concurrency the per-dispatch latency floor,
not device compute, caps QPS, and batching amortizes it across the burst.
Results are exact and per-request k is honored by slicing.
"""

from __future__ import annotations

import collections
import contextlib
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class ServiceOverloaded(RuntimeError):
    """Admission queue full — mapped to HTTP 503 (+ Retry-After) so load
    sheds at the edge instead of queueing unboundedly on the device lock."""


class ServiceTimeout(RuntimeError):
    """Request waited past its deadline for device access — HTTP 504.

    The deadline covers WAITING (admission, device-lock acquisition, the
    micro-batcher queue). Once a request holds the lock and dispatches,
    device work is not aborted — XLA programs are not cancelable — so a
    pathological single dispatch can still exceed the deadline; the bound
    this enforces is queue time, the part that grows without limit under
    overload."""


class EndpointStats:
    """Rolling per-endpoint latency window (deque append is atomic under
    the GIL, so recording needs no lock; summaries copy-then-compute)."""

    def __init__(self, window: int = 2048):
        self._lat = collections.defaultdict(
            lambda: collections.deque(maxlen=window))
        self._count = collections.Counter()

    def record(self, endpoint: str, seconds: float) -> None:
        self._lat[endpoint].append(seconds)
        self._count[endpoint] += 1

    def summary(self) -> dict:
        from image_retrieval_for_image_based_localization_tpu.utils.metrics import (
            percentile_summary,
        )

        out = {}
        for ep, dq in list(self._lat.items()):
            # list() snapshots atomically under the GIL; iterating the live
            # deque races concurrent record() appends (RuntimeError: deque
            # mutated during iteration — exactly under the load /statz
            # exists to observe)
            lat = np.asarray(list(dq), np.float64)
            if lat.size == 0:
                continue
            out[ep] = {
                "count": int(self._count[ep]),
                "window": int(lat.size),
                **percentile_summary(lat, unit="ms"),
            }
        return out


class MicroBatcher:
    """Coalesce concurrent plain top-k queries into one device dispatch.

    A single query through a TPU dispatch pays a flat latency floor (~32 ms
    through this rig's tunnel; PERF.md) — at concurrency that floor, not
    device compute, caps QPS. Requests enqueue their descriptor rows; the
    collector thread drains whatever arrived (bounded by ``max_batch``,
    waiting at most ``max_wait_ms`` after the first arrival to let a burst
    accumulate), concatenates into ONE ``search_fn`` call, and scatters the
    row-slices back to the waiting requests. Per-request k varies: the
    batch runs at ``max(k)`` and each reply is sliced to its own k — exact
    results, identical to unbatched (pinned by tests).

    Only plain queries batch; re-ranked/exact-knob requests keep their own
    dispatch (they run different programs per request).
    """

    def __init__(self, search_fn, max_batch: int = 64,
                 max_wait_ms: float = 2.0):
        self._search_fn = search_fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self._lock = threading.Condition()
        self._pending = []  # [(q [n,D], k, event, result_slot)]
        self._stop = False
        self.batches = 0      # observability: dispatches issued
        self.batched_reqs = 0
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, q: np.ndarray, k: int,
               timeout: Optional[float] = None):
        ev = threading.Event()
        slot = {}
        entry = (q, k, ev, slot)
        with self._lock:
            self._pending.append(entry)
            self._lock.notify()
        if not ev.wait(timeout):
            # the deadline covers QUEUE time only: still queued -> withdraw
            # (no wasted dispatch rows) and time out; already drained into a
            # dispatch -> the request is executing, wait for its result (an
            # in-flight XLA program is not cancelable; see ServiceTimeout)
            with self._lock:
                # identity match, never tuple ==: entries hold numpy rows,
                # and comparing two DIFFERENT entries would hit
                # ndarray.__eq__ -> bool(array) ValueError whenever another
                # request is queued ahead (the normal overload case)
                withdrawn = False
                for i, e in enumerate(self._pending):
                    if e is entry:
                        del self._pending[i]
                        withdrawn = True
                        break
            if withdrawn:
                raise ServiceTimeout(
                    f"query timed out after {timeout:.1f}s in the batch "
                    "queue")
            ev.wait()
        if "error" in slot:
            raise slot["error"]
        return slot["scores"], slot["idx"]

    def close(self):
        with self._lock:
            self._stop = True
            self._lock.notify()

    def _run(self):
        while True:
            with self._lock:
                while not self._pending and not self._stop:
                    self._lock.wait()
                if self._stop:
                    # fail any stragglers rather than hang their threads
                    for _, _, ev, slot in self._pending:
                        slot["error"] = RuntimeError("batcher closed")
                        ev.set()
                    return
                deadline = time.monotonic() + self.max_wait
                while (len(self._pending) < self.max_batch
                       and not self._stop):
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    self._lock.wait(timeout=left)
                batch = self._pending[: self.max_batch]
                del self._pending[: self.max_batch]
            try:
                qs = np.concatenate([b[0] for b in batch], axis=0)
                kmax = max(b[1] for b in batch)
                # bucket the dispatch shape: a burst produces arbitrary
                # (rows, k) combinations, and every novel shape is a fresh
                # jit compile — pad rows and k to powers of two so at most
                # O(log max_batch * log k) programs ever compile
                B = qs.shape[0]
                Bpad = 1 << (B - 1).bit_length()
                if Bpad > B:
                    qs = np.concatenate(
                        [qs, np.zeros((Bpad - B, qs.shape[1]), qs.dtype)])
                k_run = 1 << (kmax - 1).bit_length()
                scores, idx = self._search_fn(qs, k_run)
                scores, idx = scores[:B], idx[:B]
                self.batches += 1
                self.batched_reqs += len(batch)
                row = 0
                for q, k, ev, slot in batch:
                    n = q.shape[0]
                    slot["scores"] = scores[row : row + n, :k]
                    slot["idx"] = idx[row : row + n, :k]
                    row += n
                    ev.set()
            except Exception as e:  # noqa: BLE001 - propagate per-request
                for _, _, ev, slot in batch:
                    slot["error"] = e
                    ev.set()


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
                 ivf=None, nprobe: int = 8, pq=None, refine: int = 0,
                 batch_window_ms: float = 0.0, max_batch: int = 64,
                 max_inflight: int = 64, request_timeout_s: float = 30.0):
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
        # admission control: at most max_inflight requests concurrently
        # inside the service (waiting + executing); the rest are shed with
        # ServiceOverloaded/503 so overload degrades to fast rejections, not
        # an unbounded queue of threads on the device lock (0 = unlimited)
        self.max_inflight = max_inflight
        self.request_timeout_s = request_timeout_s
        self._admit = (threading.BoundedSemaphore(max_inflight)
                       if max_inflight else None)
        self.rejected = 0   # ServiceOverloaded count (observability)
        self.timed_out = 0  # ServiceTimeout count
        # guards the two counters above: they are incremented from many
        # handler threads, and an unsynchronized read-modify-write loses
        # increments under exactly the load /statz exists to observe
        self._counter_lock = threading.Lock()
        self.stats = EndpointStats()
        # micro-batching (batch_window_ms > 0): default-knob plain queries
        # coalesce into one dispatch; knob-overriding requests keep their own
        self.batcher = None
        if batch_window_ms > 0:
            self.batcher = MicroBatcher(
                self._plain_search, max_batch=max_batch,
                max_wait_ms=batch_window_ms)
        # one-hop /extract_query programs keyed by k (jax.jit shape-caches
        # the rest); cleared on reload — they close over the device gallery
        self._one_hop_cache = {}

    def reload_from_paths(self, paths: dict) -> dict:
        """Hot-swap the servable from the artifact paths the server was
        STARTED with (the operator republishes files on disk; clients
        cannot point the server at arbitrary paths). New artifacts load
        outside the lock; the swap itself is atomic under it, so in-flight
        queries finish against the old gallery and the next dispatch sees
        the new one."""
        from image_retrieval_for_image_based_localization_tpu.retrieval.index import (
            Index,
        )

        new_index = Index.load(paths["index"])
        new_ivf = new_pq = None
        if paths.get("ivf"):
            from image_retrieval_for_image_based_localization_tpu.retrieval.ivf import (
                IVFIndex,
            )

            new_ivf = IVFIndex.load(paths["ivf"])
        if paths.get("pq"):
            from image_retrieval_for_image_based_localization_tpu.retrieval.pq import (
                load_pq_artifact,
            )

            new_pq = load_pq_artifact(paths["pq"])
        new_names = self.db_names
        if paths.get("db_names"):
            new_names = [l.strip() for l in open(paths["db_names"])
                         if l.strip()]
        if new_names is not None and len(new_names) != new_index.gallery.shape[0]:
            # a stale name list would mis-label (or IndexError on) every
            # row the old list doesn't cover — refuse the swap
            raise ValueError(
                f"db_names has {len(new_names)} entries but the republished "
                f"gallery has {new_index.gallery.shape[0]} rows — republish "
                "the names file too")
        with self._lock:
            self.index = new_index
            self.ivf = new_ivf
            self.pq = new_pq
            self.db_names = new_names
            self._one_hop_cache = {}  # closed over the old device gallery
        return {"gallery": int(new_index.gallery.shape[0]),
                "dim": int(new_index.gallery.shape[1]),
                "ivf": new_ivf is not None, "pq": new_pq is not None}

    @contextlib.contextmanager
    def _admitted(self):
        """Admission slot for one request (counts queued + executing)."""
        if self._admit is not None and not self._admit.acquire(blocking=False):
            with self._counter_lock:
                self.rejected += 1
            raise ServiceOverloaded(
                f"{self.max_inflight} requests already in flight")
        try:
            yield
        finally:
            if self._admit is not None:
                self._admit.release()

    @contextlib.contextmanager
    def _device(self, deadline: float):
        """Device lock with a wait deadline (see ServiceTimeout)."""
        if not self._lock.acquire(timeout=max(deadline - time.monotonic(), 0)):
            with self._counter_lock:
                self.timed_out += 1
            raise ServiceTimeout(
                f"timed out after {self.request_timeout_s:.1f}s waiting "
                "for the device")
        try:
            yield
        finally:
            self._lock.release()

    def _plain_search(self, q: np.ndarray, k: int):
        """The default-knob search program (what the batcher dispatches)."""
        with self._lock:
            if self.pq is not None:
                from image_retrieval_for_image_based_localization_tpu.retrieval.pq import (
                    IVFPQIndex,
                )

                kw = dict(k=k, refine=self.refine,
                          gallery=self.index.gallery if self.refine else None)
                if isinstance(self.pq, IVFPQIndex):
                    kw["nprobe"] = self.nprobe
                return self.pq.search(self.index.transform_queries(q), **kw)
            if self.ivf is not None:
                return self.ivf.search(self.index.transform_queries(q), k=k,
                                       nprobe=self.nprobe)
            return self.index.query(q, k=k)

    def query(self, q: np.ndarray, k: int = 10, qe_nqe: int = 0,
              qe_alpha: float = 3.0, diffusion: bool = False,
              nprobe: Optional[int] = None, exact: bool = False,
              refine: Optional[int] = None):
        q = np.atleast_2d(np.asarray(q, np.float32))
        approx_ok = not exact and not diffusion and not qe_nqe
        with self._admitted():
            return self._query_admitted(
                q, k, qe_nqe, qe_alpha, diffusion, nprobe, exact, refine,
                approx_ok)

    def _query_admitted(self, q, k, qe_nqe, qe_alpha, diffusion, nprobe,
                        exact, refine, approx_ok):
        deadline = time.monotonic() + self.request_timeout_s
        if (self.batcher is not None and approx_ok
                and nprobe is None and refine is None):
            # default-knob plain query: coalesce into the shared dispatch
            try:
                scores, idx = self.batcher.submit(
                    q, k, timeout=self.request_timeout_s)
            except ServiceTimeout:
                with self._counter_lock:
                    self.timed_out += 1
                raise
            return scores, idx, self._names(idx)
        use_ivf = self.ivf is not None and approx_ok
        use_pq = self.pq is not None and approx_ok
        with self._device(deadline):
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
        return scores, idx, self._names(idx)

    def _names(self, idx):
        # fill slots (under-filled approximate search) carry row -1
        def name(i):
            i = int(i)
            if i < 0:
                return None
            if self.db_names is not None:
                return self.db_names[i]
            return str(self.index.ids[i])

        if self.db_names is None and self.index.ids is None:
            return None
        return [[name(i) for i in row] for row in idx]

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
            with self._admitted(), self._device(
                    time.monotonic() + self.request_timeout_s):
                d = self.extractor.extract([path])
        finally:
            os.unlink(path)
        return np.asarray(d)[0]

    def _one_hop_program(self, k: int):
        """Jitted image->top-k program: trunk forward + whiten + score +
        select in ONE dispatch. The descriptor never leaves the device —
        the two-dispatch path (extract, then query) pays an extra relay
        round trip plus a device->host->device descriptor bounce, ~35% of
        the endpoint's latency through this rig's tunnel."""
        # key by the CLAMPED k: raw client-supplied k would compile and
        # permanently cache one trunk-sized program per distinct k > N
        # (an unbounded compile-stall amplifier from query-string input)
        kk = min(int(k), self.index.gallery.shape[0])
        prog = self._one_hop_cache.get(kk)
        if prog is not None:
            return prog
        import jax
        import jax.numpy as jnp

        from image_retrieval_for_image_based_localization_tpu.retrieval.index import (
            _fused_query_plain,
            _fused_query_whitened,
        )

        idx = self.index
        g = idx.device_gallery()
        # the raw forward closure: the jitted _forward_u8 carries
        # compiler_options, which jax rejects inside a nested jit
        fwd = getattr(self.extractor, "_forward_u8_fn", None)
        if fwd is None:
            raise RuntimeError(
                "extractor lacks _forward_u8_fn (the raw forward closure) — "
                "the jitted _forward_u8 cannot nest under the one-hop jit "
                "(it carries compiler_options); rebuild the Extractor")
        if idx.P is not None:
            if idx._device_mP is None:
                idx._device_mP = (jnp.asarray(idx.m), jnp.asarray(idx.P))
            m, P = idx._device_mP
            dims = idx.dims

            def run(v, px, sz):
                return _fused_query_whitened(
                    g, fwd(v, px, sz), m, P, k=kk, dims=dims)
        else:
            def run(v, px, sz):
                return _fused_query_plain(g, fwd(v, px, sz), k=kk)

        from image_retrieval_for_image_based_localization_tpu.utils.tuning import (
            tpu_compiler_options,
        )

        prog = jax.jit(run, compiler_options=tpu_compiler_options())
        self._one_hop_cache[kk] = prog
        return prog

    def extract_query(self, image_bytes: bytes, k: int = 10):
        """One-hop image bytes -> (scores, ids, names), single dispatch.

        Host preprocessing mirrors ``Extractor.extract`` exactly (same
        resize filter/upscale/bucketing via ``make_batches``), so the
        descriptor — and therefore the ranking — is identical to calling
        /extract then /query."""
        if self.extractor is None:
            raise RuntimeError("no model loaded (start with --network or "
                               "--checkpoint to serve /extract_query)")
        if self.ivf is not None or self.pq is not None:
            # an approximate-search service keeps its IVF/PQ routing (the
            # fused program is exact search); two-hop path as before
            d = self.extract(image_bytes)
            return self.query(d[None], k=k)
        import os
        import tempfile

        import jax.numpy as jnp
        from PIL import Image

        # identical host preprocessing to /extract: a temp path through the
        # Extractor's own batch builder (native C++ resize when available;
        # an in-memory array would silently take the PIL path instead and
        # produce different pixels for resized inputs)
        img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
            img.save(f, format="PNG")
            path = f.name
        try:
            batch = next(iter(
                self.extractor.make_input_batches([path], batch_size=1)))
        finally:
            os.unlink(path)
        with self._admitted(), self._device(
                time.monotonic() + self.request_timeout_s):
            scores, idx = self._one_hop_program(k)(
                self.extractor.variables,
                jnp.asarray(batch.pixels_u8),
                jnp.asarray(batch.sizes),
            )
            scores, idx = np.asarray(scores), np.asarray(idx)
        return scores, idx, self._names(idx)


def _make_handler(service: RetrievalService, reload_paths: dict = None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; metrics go to the JSON replies
            pass

        def _send(self, code: int, obj, extra_headers=None) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in (extra_headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.rstrip("/") == "/statz":
                self._send(200, {
                    "endpoints": service.stats.summary(),
                    "admission": {
                        "max_inflight": service.max_inflight,
                        "rejected": service.rejected,
                        "timed_out": service.timed_out,
                        "timeout_s": service.request_timeout_s,
                    },
                    "batching": None if service.batcher is None else {
                        "batches": service.batcher.batches,
                        "batched_requests": service.batcher.batched_reqs,
                    },
                })
            elif self.path.rstrip("/") in ("", "/healthz"):
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
                    "batching": None if service.batcher is None else {
                        "max_batch": service.batcher.max_batch,
                        "window_ms": service.batcher.max_wait * 1e3,
                        "batches": service.batcher.batches,
                        "batched_requests": service.batcher.batched_reqs,
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
                if path == "/admin/reload":
                    if not reload_paths:
                        self._send(400, {"error": "server started without "
                                                  "reloadable paths"})
                        return
                    info = service.reload_from_paths(reload_paths)
                    self._send(200, {"reloaded": True, **info})
                elif path == "/query":
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
                    service.stats.record("/query", time.time() - t0)
                    self._send(200, {
                        "ids": idx.tolist(),
                        "scores": np.asarray(scores, np.float64).tolist(),
                        "names": names,
                        "latency_ms": round((time.time() - t0) * 1e3, 2),
                    })
                elif path == "/extract":
                    d = service.extract(self._body())
                    service.stats.record(path, time.time() - t0)
                    self._send(200, {
                        "descriptor": d.astype(np.float64).tolist(),
                        "latency_ms": round((time.time() - t0) * 1e3, 2),
                    })
                elif path == "/extract_query":
                    k = int(params.get("k", 10))
                    scores, idx, names = service.extract_query(
                        self._body(), k=k)
                    service.stats.record(path, time.time() - t0)
                    self._send(200, {
                        "ids": idx[0].tolist(),
                        "scores": np.asarray(
                            scores[0], np.float64).tolist(),
                        "names": None if names is None else names[0],
                        "latency_ms": round((time.time() - t0) * 1e3, 2),
                    })
                else:
                    self._send(404, {"error": f"unknown path {path}"})
            except ServiceOverloaded as e:
                # shed load at the edge: clients back off and retry
                self._send(503, {"error": str(e)},
                           extra_headers={"Retry-After": "1"})
            except ServiceTimeout as e:
                self._send(504, {"error": str(e)})
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
    batch_window_ms: float = 0.0,
    max_batch: int = 64,
    reload_paths: dict = None,
    max_inflight: int = 64,
    request_timeout_s: float = 30.0,
) -> ThreadingHTTPServer:
    """Start the retrieval service; returns the server (non-blocking mode
    runs it on a daemon thread — used by tests and embedders).

    ``reload_paths`` ({"index": path, "ivf": path|None, "pq": path|None})
    enables ``POST /admin/reload``: hot-swap the servable from those same
    on-disk paths after the operator republishes them."""
    service = RetrievalService(index, extractor=extractor, db_names=db_names,
                               ivf=ivf, nprobe=nprobe, pq=pq, refine=refine,
                               batch_window_ms=batch_window_ms,
                               max_batch=max_batch, max_inflight=max_inflight,
                               request_timeout_s=request_timeout_s)
    class _Server(ThreadingHTTPServer):
        # stdlib default listen backlog is 5 — a concurrent burst (the
        # micro-batching case) gets connection resets under load
        request_queue_size = 128
        daemon_threads = True

    srv = _Server((host, port), _make_handler(service, reload_paths))
    srv.service = service  # embedders/benches: reach the batcher for close()
    if block:
        print(f"serving gallery[{index.gallery.shape[0]}] on "
              f"http://{host}:{srv.server_address[1]}")
        srv.serve_forever()
    else:
        threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
