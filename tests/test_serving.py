"""Serving endpoint tests: health, JSON + raw-binary /query, re-ranked
queries, /extract + /extract_query with a real model, and error replies."""

import json
import urllib.request

import numpy as np
import pytest

from irtpu.retrieval.index import Index
from irtpu.serving import serve
from irtpu.utils.config import IndexConfig


@pytest.fixture()
def service_url():
    rng = np.random.RandomState(13)
    db = rng.randn(40, 16).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    index = Index.build(db, IndexConfig(whitening=None),
                        ids=[f"db/{i:03d}.jpg" for i in range(40)])
    srv = serve(index, block=False, port=0)
    host, port = srv.server_address
    yield f"http://{host}:{port}", db
    srv.shutdown()


def _post(url, data, headers=None):
    req = urllib.request.Request(url, data=data, headers=headers or {})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_healthz(service_url):
    url, db = service_url
    with urllib.request.urlopen(f"{url}/healthz") as r:
        h = json.loads(r.read())
    assert h["ok"] and h["gallery"] == 40 and h["dim"] == 16
    assert h["model"] is False


def test_query_json(service_url):
    url, db = service_url
    q = db[[3, 7]] + 0.01
    res = _post(f"{url}/query",
                json.dumps({"descriptors": q.tolist(), "k": 5}).encode())
    assert res["ids"][0][0] == 3 and res["ids"][1][0] == 7
    assert res["names"][0][0] == "db/003.jpg"
    assert len(res["scores"][0]) == 5 and res["latency_ms"] >= 0


def test_query_raw_binary(service_url):
    url, db = service_url
    q = np.ascontiguousarray(db[[5]], np.float32)
    res = _post(f"{url}/query?k=3", q.tobytes(),
                headers={"X-Shape": "1,16"})
    assert res["ids"][0][0] == 5


def test_query_reranked(service_url):
    url, db = service_url
    q = db[[3]]
    for extra in ({"qe_nqe": 5}, {"diffusion": True}):
        res = _post(f"{url}/query", json.dumps(
            {"descriptors": q.tolist(), "k": 5, **extra}).encode())
        assert res["ids"][0][0] == 3, extra


def test_error_reply(service_url):
    url, _ = service_url
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{url}/query", b"not json")
    assert ei.value.code == 400
    assert "error" in json.loads(ei.value.read())
    # /extract without a model -> clean 400, not a dead server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{url}/extract", b"\xff\xd8bogus")
    assert ei.value.code == 400


def test_extract_and_extract_query(tmp_path):
    """Image-in, top-k-out through a real (random-weight) extractor."""
    import io

    from PIL import Image

    from irtpu.api import Extractor
    from irtpu.utils.config import ExtractConfig, ModelConfig

    ex = Extractor(ExtractConfig(model=ModelConfig(arch="resnet18"),
                                 image_size=64, batch_size=2))
    rng = np.random.RandomState(0)
    imgs = [(rng.rand(48, 64, 3) * 255).astype(np.uint8) for _ in range(3)]
    paths = []
    for i, a in enumerate(imgs):
        p = tmp_path / f"im{i}.png"
        Image.fromarray(a).save(p)
        paths.append(str(p))
    db = ex.extract(paths)
    index = Index.build(db, IndexConfig(whitening=None))
    srv = serve(index, extractor=ex, block=False, port=0)
    try:
        host, port = srv.server_address
        url = f"http://{host}:{port}"
        buf = io.BytesIO()
        Image.fromarray(imgs[1]).save(buf, format="PNG")
        res = _post(f"{url}/extract", buf.getvalue())
        d = np.asarray(res["descriptor"], np.float32)
        np.testing.assert_allclose(d, db[1], atol=1e-4)
        res = _post(f"{url}/extract_query?k=2", buf.getvalue())
        assert res["ids"][0] == 1  # self-match first
        # one-hop (fused single-dispatch) == extract-then-query exactly:
        # same host preprocessing, same whiten/score/select program
        s2, i2 = index.query(d[None], k=2)
        assert res["ids"] == i2[0].tolist()
        np.testing.assert_allclose(
            np.asarray(res["scores"], np.float32), s2[0], atol=1e-5)
    finally:
        srv.shutdown()


def test_extract_query_one_hop_whitened_index(tmp_path):
    """The one-hop program composes the index's whitening on device —
    results identical to service.extract + service.query."""
    import io

    from PIL import Image

    from irtpu.api import Extractor
    from irtpu.serving import RetrievalService
    from irtpu.utils.config import ExtractConfig, ModelConfig

    ex = Extractor(ExtractConfig(model=ModelConfig(arch="resnet18"),
                                 image_size=64, batch_size=2))
    rng = np.random.RandomState(3)
    imgs = [(rng.rand(64, 48, 3) * 255).astype(np.uint8) for _ in range(6)]
    paths = []
    for i, a in enumerate(imgs):
        p = tmp_path / f"w{i}.png"
        Image.fromarray(a).save(p)
        paths.append(str(p))
    db = ex.extract(paths)
    index = Index.build(db, IndexConfig(whitening="pca"))
    svc = RetrievalService(index, extractor=ex)
    buf = io.BytesIO()
    Image.fromarray(imgs[2]).save(buf, format="PNG")
    s1, i1, _ = svc.extract_query(buf.getvalue(), k=3)
    d = svc.extract(buf.getvalue())
    s2, i2, _ = svc.query(d[None], k=3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)
    assert i1[0, 0] == 2  # self-match through the whitened gallery


def test_ivf_serving():
    """IVF-backed /query: approximate by default, exact=1 bypass, healthz
    reports the quantizer, QE requests fall back to the exact path."""
    from irtpu.retrieval.ivf import IVFIndex

    rng = np.random.RandomState(21)
    db = rng.randn(120, 16).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    index = Index.build(db, IndexConfig(whitening=None))
    ivf = IVFIndex.build(db, n_clusters=6)
    srv = serve(index, ivf=ivf, nprobe=6, block=False, port=0)
    try:
        host, port = srv.server_address
        url = f"http://{host}:{port}"
        with urllib.request.urlopen(f"{url}/healthz") as r:
            h = json.loads(r.read())
        assert h["ivf"] == {"clusters": 6, "nprobe": 6,
                            "pad_ratio": h["ivf"]["pad_ratio"]}
        q = db[[3, 9]] + 0.01
        body = json.dumps({"descriptors": q.tolist(), "k": 5}).encode()
        res = _post(f"{url}/query", body)  # full probe == exact (CPU)
        ex = _post(f"{url}/query?exact=1", body)
        assert res["ids"] == ex["ids"]
        assert res["ids"][0][0] == 3 and res["ids"][1][0] == 9
        # per-request nprobe narrows the probe but keeps self-match
        res1 = _post(f"{url}/query?nprobe=1", body)
        assert res1["ids"][0][0] == 3
        # QE forces the exact path (needs the full gallery): same answer
        # as the exact QE query through the index
        qe = _post(f"{url}/query", json.dumps(
            {"descriptors": q.tolist(), "k": 5, "qe_nqe": 2}).encode())
        s_ref, i_ref = index.query(q, k=5, qe_nqe=2)
        assert qe["ids"] == i_ref.tolist()
    finally:
        srv.shutdown()


def test_pq_serving():
    """PQ-backed /query: ADC by default, full refine == exact, per-request
    refine override, exact=1 bypass, healthz reports the codec."""
    from irtpu.retrieval.pq import PQIndex

    rng = np.random.RandomState(33)
    db = rng.randn(120, 16).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    index = Index.build(db, IndexConfig(whitening=None))
    pq = PQIndex.build(index.gallery, m=4)
    srv = serve(index, pq=pq, refine=0, block=False, port=0)
    try:
        host, port = srv.server_address
        url = f"http://{host}:{port}"
        with urllib.request.urlopen(f"{url}/healthz") as r:
            h = json.loads(r.read())
        assert h["pq"] == {"m": 4, "refine": 0, "ivf": False}
        q = db[[3, 9]] + 0.01
        body = json.dumps({"descriptors": q.tolist(), "k": 5}).encode()
        ex = _post(f"{url}/query?exact=1", body)
        assert ex["ids"][0][0] == 3 and ex["ids"][1][0] == 9
        # full refine rescoring reproduces the exact ranking + scores
        rf = _post(f"{url}/query?refine=120", body)
        assert rf["ids"] == ex["ids"]
        np.testing.assert_allclose(rf["scores"], ex["scores"], atol=1e-5)
        # pure ADC answers (scores are reconstruction products, ids may
        # differ) — just sanity: well-separated self-match survives m=4
        adc = _post(f"{url}/query", body)
        assert len(adc["ids"][0]) == 5
    finally:
        srv.shutdown()


def test_serving_pq_ivf_exclusive():
    from irtpu.retrieval.ivf import IVFIndex
    from irtpu.retrieval.pq import PQIndex
    from irtpu.serving import RetrievalService

    rng = np.random.RandomState(3)
    db = rng.randn(64, 16).astype(np.float32)
    index = Index.build(db, IndexConfig(whitening=None))
    ivf = IVFIndex.build(index.gallery, n_clusters=4)
    pq = PQIndex.build(index.gallery, m=4)
    with pytest.raises(ValueError, match="exclusive"):
        RetrievalService(index, ivf=ivf, pq=pq)


def test_micro_batching_exactness_and_coalescing():
    """Concurrent plain queries through the batcher return EXACTLY the
    unbatched results (per-request k slicing included), and genuinely
    coalesce (#dispatches < #requests under a burst)."""
    import concurrent.futures

    from irtpu.serving import RetrievalService

    rng = np.random.RandomState(8)
    db = rng.randn(200, 32).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    index = Index.build(db, IndexConfig(whitening=None))
    svc = RetrievalService(index, batch_window_ms=20.0, max_batch=64)
    plain = RetrievalService(index)

    reqs = [(db[[i, i + 1]] + 0.01, 3 + (i % 4)) for i in range(0, 32, 2)]
    with concurrent.futures.ThreadPoolExecutor(max_workers=16) as exe:
        futs = [exe.submit(svc.query, q, k) for q, k in reqs]
        got = [f.result() for f in futs]
    for (q, k), (s, i, _) in zip(reqs, got):
        se, ie, _ = plain.query(q, k=k)
        np.testing.assert_array_equal(i, ie)
        np.testing.assert_allclose(s, se, atol=1e-5)
        assert i.shape == (2, k)
    assert svc.batcher.batched_reqs == len(reqs)
    assert svc.batcher.batches < len(reqs), svc.batcher.batches
    svc.batcher.close()


def test_micro_batching_skips_knob_overrides():
    """qe/exact/nprobe/refine requests bypass the batcher (their programs
    differ per request); batcher counters must not move."""
    from irtpu.serving import RetrievalService

    rng = np.random.RandomState(9)
    db = rng.randn(64, 16).astype(np.float32)
    index = Index.build(db, IndexConfig(whitening=None))
    svc = RetrievalService(index, batch_window_ms=5.0)
    q = db[[3]]
    s, i, _ = svc.query(q, k=5, qe_nqe=2)
    s2, i2, _ = svc.query(q, k=5, exact=True)
    assert svc.batcher.batches == 0
    s3, i3, _ = svc.query(q, k=5)  # plain -> batched path
    assert svc.batcher.batches == 1
    np.testing.assert_array_equal(i2, i3)
    svc.batcher.close()


def test_micro_batching_http_end_to_end():
    """Burst over real HTTP against a --batch-window server: healthz shows
    coalescing, replies match the exact path."""
    import concurrent.futures

    rng = np.random.RandomState(10)
    db = rng.randn(100, 16).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    index = Index.build(db, IndexConfig(whitening=None))
    srv = serve(index, block=False, port=0, batch_window_ms=25.0)
    try:
        host, port = srv.server_address
        url = f"http://{host}:{port}"

        def one(i):
            body = json.dumps(
                {"descriptors": (db[[i]] + 0.01).tolist(), "k": 4}).encode()
            return i, _post(f"{url}/query", body)

        with concurrent.futures.ThreadPoolExecutor(max_workers=12) as exe:
            res = list(exe.map(one, range(12)))
        for i, r in res:
            assert r["ids"][0][0] == i, (i, r["ids"])
        with urllib.request.urlopen(f"{url}/healthz") as rh:
            h = json.loads(rh.read())
        assert h["batching"]["batched_requests"] == 12
        assert h["batching"]["batches"] <= 12
    finally:
        srv.shutdown()


def test_statz_latency_percentiles(service_url):
    """GET /statz reports per-endpoint rolling latency percentiles."""
    url, db = service_url
    body = json.dumps({"descriptors": db[[1]].tolist(), "k": 3}).encode()
    for _ in range(5):
        _post(f"{url}/query", body)
    with urllib.request.urlopen(f"{url}/statz") as r:
        st = json.loads(r.read())
    q = st["endpoints"]["/query"]
    assert q["count"] == 5 and q["window"] == 5
    assert 0 <= q["p50_ms"] <= q["p95_ms"] <= q["p99_ms"]
    assert st["batching"] is None


def test_serving_bench_small(capsys):
    """bench-serve runs tiny and reports coherent rows for both modes."""
    from irtpu.cli import main

    rc = main(["bench-serve", "-n", "500", "-d", "32",
               "--concurrency", "4", "--requests", "24"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "unbatched" in out and "batched" in out and "qps ratio" in out


def test_admin_reload_hot_swaps_index(tmp_path):
    """POST /admin/reload re-loads the servable from the startup paths:
    the operator republishes the index file, the server swaps atomically."""
    from irtpu.serving import serve as serve_fn

    rng = np.random.RandomState(60)
    g1 = rng.randn(30, 16).astype(np.float32)
    g1 /= np.linalg.norm(g1, axis=1, keepdims=True)
    ipath = str(tmp_path / "live.npz")
    Index.build(g1, IndexConfig(whitening=None)).save(ipath)
    srv = serve_fn(Index.load(ipath), block=False, port=0,
                   reload_paths={"index": ipath})
    try:
        host, port = srv.server_address
        url = f"http://{host}:{port}"
        body = json.dumps({"descriptors": g1[[7]].tolist(), "k": 3}).encode()
        assert _post(f"{url}/query", body)["ids"][0][0] == 7

        # republish a bigger gallery at the same path, then reload
        g2 = rng.randn(50, 16).astype(np.float32)
        g2 /= np.linalg.norm(g2, axis=1, keepdims=True)
        Index.build(g2, IndexConfig(whitening=None)).save(ipath)
        res = _post(f"{url}/admin/reload", b"")
        assert res == {"reloaded": True, "gallery": 50, "dim": 16,
                       "ivf": False, "pq": False}
        body2 = json.dumps({"descriptors": g2[[41]].tolist(),
                            "k": 3}).encode()
        assert _post(f"{url}/query", body2)["ids"][0][0] == 41
        with urllib.request.urlopen(f"{url}/healthz") as r:
            assert json.loads(r.read())["gallery"] == 50
    finally:
        srv.shutdown()


def test_admin_reload_without_paths_is_400():
    rng = np.random.RandomState(61)
    db = rng.randn(20, 16).astype(np.float32)
    srv = serve(Index.build(db, IndexConfig(whitening=None)),
                block=False, port=0)
    try:
        host, port = srv.server_address
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"http://{host}:{port}/admin/reload", b"")
        assert ei.value.code == 400
    finally:
        srv.shutdown()


def test_admin_reload_rejects_stale_db_names(tmp_path):
    """Reloading a differently-sized gallery with a stale names list must
    refuse the swap (400) instead of mis-labeling rows later."""
    rng = np.random.RandomState(62)
    g1 = rng.randn(20, 16).astype(np.float32)
    ipath = str(tmp_path / "live.npz")
    Index.build(g1, IndexConfig(whitening=None)).save(ipath)
    names = [f"db{i}" for i in range(20)]
    srv = serve(Index.load(ipath), db_names=names, block=False, port=0,
                reload_paths={"index": ipath})
    try:
        host, port = srv.server_address
        url = f"http://{host}:{port}"
        Index.build(rng.randn(30, 16).astype(np.float32),
                    IndexConfig(whitening=None)).save(ipath)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{url}/admin/reload", b"")
        assert ei.value.code == 400
        assert "db_names" in json.loads(ei.value.read())["error"]
        # old servable still intact
        with urllib.request.urlopen(f"{url}/healthz") as r:
            assert json.loads(r.read())["gallery"] == 20
    finally:
        srv.shutdown()
        srv.server_close()


def test_admin_reload_with_names_path(tmp_path):
    """db_names given as a reload path: republished names swap together
    with the gallery."""
    rng = np.random.RandomState(63)
    ipath = str(tmp_path / "live.npz")
    npath = str(tmp_path / "names.txt")
    g1 = rng.randn(10, 16).astype(np.float32)
    Index.build(g1, IndexConfig(whitening=None)).save(ipath)
    open(npath, "w").write("\n".join(f"a{i}" for i in range(10)) + "\n")
    srv = serve(Index.load(ipath),
                db_names=[f"a{i}" for i in range(10)], block=False, port=0,
                reload_paths={"index": ipath, "db_names": npath})
    try:
        host, port = srv.server_address
        url = f"http://{host}:{port}"
        g2 = rng.randn(12, 16).astype(np.float32)
        g2 /= np.linalg.norm(g2, axis=1, keepdims=True)
        Index.build(g2, IndexConfig(whitening=None)).save(ipath)
        open(npath, "w").write("\n".join(f"b{i}" for i in range(12)) + "\n")
        assert _post(f"{url}/admin/reload", b"")["gallery"] == 12
        body = json.dumps({"descriptors": g2[[5]].tolist(), "k": 1}).encode()
        res = _post(f"{url}/query", body)
        assert res["names"][0][0] == "b5"
    finally:
        srv.shutdown()
        srv.server_close()


class _SlowIndex:
    """Index whose query blocks — stands in for a long device dispatch."""

    def __init__(self, index, delay_s):
        self._index = index
        self.delay = delay_s
        self.gallery = index.gallery
        self.ids = index.ids

    def transform_queries(self, q):
        return self._index.transform_queries(q)

    def query(self, q, **kw):
        import time

        time.sleep(self.delay)
        return self._index.query(q, **kw)


def test_overload_sheds_with_503():
    """Admission cap: a burst beyond max_inflight gets immediate 503 +
    Retry-After instead of queueing on the device lock; admitted requests
    complete and the server answers normally afterwards."""
    import concurrent.futures
    import urllib.error

    rng = np.random.RandomState(70)
    db = rng.randn(40, 16).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    index = _SlowIndex(Index.build(db, IndexConfig(whitening=None)), 0.3)
    srv = serve(index, block=False, port=0, max_inflight=2)
    try:
        host, port = srv.server_address
        url = f"http://{host}:{port}"
        body = json.dumps({"descriptors": db[[3]].tolist(), "k": 5}).encode()

        def one():
            try:
                return 200, _post(f"{url}/query", body), None
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read()), e.headers

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as exe:
            got = [f.result() for f in [exe.submit(one) for _ in range(8)]]
        codes = [c for c, _, _ in got]
        assert 200 in codes and 503 in codes, codes
        shed = next(g for g in got if g[0] == 503)
        assert shed[2]["Retry-After"] == "1"
        assert "in flight" in shed[1]["error"]
        # server healthy after the burst drains
        assert _post(f"{url}/query", body)["ids"][0][0] == 3
        with urllib.request.urlopen(f"{url}/statz") as r:
            adm = json.loads(r.read())["admission"]
        assert adm["rejected"] == codes.count(503)
        assert adm["max_inflight"] == 2
        # healthz bypasses admission (observable during overload)
        with urllib.request.urlopen(f"{url}/healthz") as r:
            assert json.loads(r.read())["ok"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_request_wait_timeout_504():
    """A request that waits longer than request_timeout_s for the device
    lock gets 504 (the lock HOLDER's long dispatch is unaffected)."""
    import concurrent.futures
    import time
    import urllib.error

    rng = np.random.RandomState(71)
    db = rng.randn(30, 16).astype(np.float32)
    index = _SlowIndex(Index.build(db, IndexConfig(whitening=None)), 0.5)
    srv = serve(index, block=False, port=0, request_timeout_s=0.05)
    try:
        host, port = srv.server_address
        url = f"http://{host}:{port}"
        body = json.dumps({"descriptors": db[[1]].tolist(), "k": 3}).encode()
        with concurrent.futures.ThreadPoolExecutor(max_workers=2) as exe:
            holder = exe.submit(_post, f"{url}/query", body)
            time.sleep(0.1)  # holder is inside the 0.5s dispatch
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(f"{url}/query", body)
            assert ei.value.code == 504
            assert "waiting" in json.loads(ei.value.read())["error"]
            assert holder.result()["ids"][0][0] == 1  # holder unaffected
        with urllib.request.urlopen(f"{url}/statz") as r:
            assert json.loads(r.read())["admission"]["timed_out"] == 1
    finally:
        srv.shutdown()
        srv.server_close()


def test_batch_queue_timeout_withdraws_request():
    """A batched query that times out in the queue raises ServiceTimeout
    and is WITHDRAWN from the pending list (no wasted dispatch rows)."""
    import threading
    import time

    from irtpu.serving import RetrievalService, ServiceTimeout

    rng = np.random.RandomState(72)
    db = rng.randn(30, 16).astype(np.float32)
    index = _SlowIndex(Index.build(db, IndexConfig(whitening=None)), 0.4)
    svc = RetrievalService(index, batch_window_ms=2.0,
                           request_timeout_s=0.05)
    try:
        t = threading.Thread(target=svc.query, args=(db[[2]],), daemon=True)
        t.start()  # first query: dispatched alone, holds the collector 0.4s
        time.sleep(0.15)
        with pytest.raises(ServiceTimeout):
            svc.query(db[[3]], k=3)  # queued behind the slow dispatch
        assert svc.timed_out == 1
        with svc.batcher._lock:
            assert not svc.batcher._pending  # withdrawn, not abandoned
        t.join()
    finally:
        svc.batcher.close()


def test_batch_queue_timeout_withdraw_with_other_entries_queued():
    """Withdraw must use IDENTITY matching: the timing-out entry is a tuple
    holding a numpy array, and with ANOTHER entry queued ahead (the normal
    overload case) tuple ``==`` would hit ndarray.__eq__ ->
    bool(array) ValueError — the client then got a 400 instead of the 504
    contract and the entry was never withdrawn (ADVICE r4, high)."""
    import threading
    import time

    from irtpu.serving import RetrievalService, ServiceTimeout

    rng = np.random.RandomState(73)
    db = rng.randn(30, 16).astype(np.float32)
    index = _SlowIndex(Index.build(db, IndexConfig(whitening=None)), 0.6)
    svc = RetrievalService(index, batch_window_ms=2.0,
                           request_timeout_s=10.0)
    try:
        t0 = threading.Thread(target=svc.query, args=(db[[1]],), daemon=True)
        t0.start()  # dispatched alone, holds the collector 0.6s
        time.sleep(0.15)
        # second query queues AHEAD of ours and outlives our deadline
        t1 = threading.Thread(target=svc.query, args=(db[[2]],), daemon=True)
        t1.start()
        time.sleep(0.05)
        with pytest.raises(ServiceTimeout):
            # ours is pending at index 1 — identity withdraw must skip the
            # ndarray-bearing entry ahead of it without comparing tuples
            svc.batcher.submit(db[[3]], 3, timeout=0.05)
        with svc.batcher._lock:
            assert len(svc.batcher._pending) <= 1  # ours gone, theirs kept
            for e in svc.batcher._pending:
                # only the timed-out entry (k=3) may be withdrawn — the
                # other queued request (default k) must still be pending
                assert e[1] != 3, "withdraw removed the wrong entry"
        t0.join()
        t1.join()
    finally:
        svc.batcher.close()


def test_reload_under_load_race(tmp_path):
    """Hot-swap while the batcher is mid-flight: queries racing several
    reloads (gallery size flapping 30<->50) all succeed with ids valid for
    SOME published gallery — no 5xx, no resets, no torn state."""
    import concurrent.futures
    import time

    from irtpu.serving import serve as serve_fn

    rng = np.random.RandomState(73)
    g_small = rng.randn(30, 16).astype(np.float32)
    g_small /= np.linalg.norm(g_small, axis=1, keepdims=True)
    g_big = rng.randn(50, 16).astype(np.float32)
    g_big /= np.linalg.norm(g_big, axis=1, keepdims=True)
    ipath = str(tmp_path / "live.npz")
    Index.build(g_small, IndexConfig(whitening=None)).save(ipath)
    srv = serve_fn(Index.load(ipath), block=False, port=0,
                   batch_window_ms=2.0, reload_paths={"index": ipath})
    try:
        host, port = srv.server_address
        url = f"http://{host}:{port}"
        stop = [False]
        errors = []

        def hammer():
            q = rng.randn(1, 16).astype(np.float32)
            body = json.dumps({"descriptors": q.tolist(), "k": 5}).encode()
            n = 0
            while not stop[0] or n == 0:
                try:
                    res = _post(f"{url}/query", body)
                    ids = res["ids"][0]
                    assert len(ids) == 5
                    assert all(0 <= i < 50 for i in ids), ids
                    n += 1
                except Exception as e:  # noqa: BLE001 - collect, fail below
                    errors.append(e)
                    return n
            return n

        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as exe:
            futs = [exe.submit(hammer) for _ in range(4)]
            for i in range(6):  # 6 republish+reload cycles under load
                g = g_big if i % 2 == 0 else g_small
                Index.build(g, IndexConfig(whitening=None)).save(ipath)
                assert _post(f"{url}/admin/reload", b"")["reloaded"]
                time.sleep(0.05)
            stop[0] = True
            done = sum(f.result() for f in futs)
        assert not errors, errors[:3]
        assert done >= 4  # every worker completed at least one query
        with urllib.request.urlopen(f"{url}/healthz") as r:
            assert json.loads(r.read())["gallery"] == 30  # last publish
    finally:
        srv.service.batcher.close()
        srv.shutdown()
        srv.server_close()


def test_extract_query_keeps_ivf_routing(tmp_path):
    """An IVF-backed service's /extract_query must keep the approximate
    routing (the round-5 one-hop fused program is exact search — it may
    only replace the plain-exact path)."""
    import io

    from PIL import Image

    from irtpu.api import Extractor
    from irtpu.retrieval.ivf import IVFIndex
    from irtpu.serving import RetrievalService
    from irtpu.utils.config import ExtractConfig, ModelConfig

    ex = Extractor(ExtractConfig(model=ModelConfig(arch="resnet18"),
                                 image_size=64, batch_size=2))
    rng = np.random.RandomState(9)
    imgs = [(rng.rand(48, 64, 3) * 255).astype(np.uint8) for _ in range(8)]
    paths = []
    for i, a in enumerate(imgs):
        p = tmp_path / f"v{i}.png"
        Image.fromarray(a).save(p)
        paths.append(str(p))
    db = ex.extract(paths)
    index = Index.build(db, IndexConfig(whitening=None))
    ivf = IVFIndex.build(db, n_clusters=2)
    svc = RetrievalService(index, extractor=ex, ivf=ivf, nprobe=1)
    called = {}
    orig = ivf.search

    def spy(*a, **kw):
        called["ivf"] = True
        return orig(*a, **kw)

    ivf.search = spy
    buf = io.BytesIO()
    Image.fromarray(imgs[0]).save(buf, format="PNG")
    s, i, _ = svc.extract_query(buf.getvalue(), k=2)
    assert called.get("ivf"), "one-hop bypassed the IVF routing"
    assert i.shape == (1, 2)
