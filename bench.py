"""Headline benchmark: descriptor-extraction throughput on the real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric (BASELINE.json:2): images/sec descriptor extraction. The north-star
target is >= 5000 img/s on a v5e-8 (BASELINE.json:5) == 625 img/s per chip;
``vs_baseline`` is measured-per-chip / 625 so 1.0 == on-target pod-scale
throughput. Also measures exact-kNN queries/sec on a 100k-descriptor
gallery (aux field).

Configuration: ResNet-50 + GeM (graded config 2's model), 1024x1024 input,
bfloat16 trunk compute, fused Pallas GeM+L2N head, scoped-VMEM compiler
options (utils.tuning — measured +7% on this rig), steady-state timing.

As of round 4 the measured program is the PRODUCTION ingestion path — the
Extractor's jitted uint8 forward (u8 pixels + valid extents -> mask ->
fused normalize-into-bf16 -> trunk -> head), exactly what `extract()`
dispatches per batch. Rounds 1-3 timed `model.apply` on f32 pixels, which
is neither cheaper nor more honest: it excludes the normalize but pays an
f32->bf16 convert + layout pass the production path doesn't have
(PERF.md round-4 stem notes). The reference pipeline normalizes on the
host (PIL/torchvision), so charging normalization to the measured system
is conservative vs the baseline.

Methodology notes (hard-won on this rig):
  * inputs are generated ON DEVICE (host->device of 100MB batches through
    the axon tunnel would dominate and isn't the steady-state shape of the
    pipeline, which double-buffers uploads);
  * through the tunnel ``block_until_ready`` does not actually wait —
    completion is forced by device->host transfer of every output
    (descriptors land on host in real retrieval anyway);
  * 16 iterations per timed group: queue depth amortizes the tunnel's
    non-pipelining dispatch cost (measured: 4 iters -> ~525 img/s, 16 ->
    ~556, both with identical device time per iter);
  * throughput numbers are the MEDIAN over several timed groups; the
    cross-round drift normalizer is ``hbm_stream_gbs`` — a 2 GB-working-set
    pure-streaming probe matching the extraction trace's methodology
    (PERF.md round-5 note) — while the legacy ``hbm_probe_gbs``
    (dense-kNN-derived, small-phase, ~5x under true streaming) is kept
    only for continuity with rounds 3-4;
  * persistent compilation cache keeps repeated runs fast.
"""

from __future__ import annotations

import json
import os
import statistics
import time

import numpy as np


def _spec_peak_tflops_bf16():
    """Datasheet bf16 peak for the ACTUAL attached TPU generation (TF/s),
    keyed on device_kind — hardcoding one generation's number would make
    extract_mfu_vs_spec silently wrong on any other chip. None when the
    generation is unknown (the field is then omitted)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for pat, tf in (("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0),
                    ("v6 lite", 918.0), ("v6e", 918.0), ("v4", 275.0),
                    ("v3", 123.0), ("v2", 45.0)):
        if pat in kind:
            return tf
    return None


def _accelerator_responsive(timeout_s: float = 300.0) -> bool:
    """Probe backend init in a SUBPROCESS: the tunneled axon TPU, when its
    relay is down, hangs `jax.devices()` forever (observed this round) —
    an in-process attempt would wedge the whole benchmark. The probe child
    inherits the same sitecustomize/backend registration; if it can't
    produce devices within the window, the parent forces CPU before
    touching jax."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    tpu_ok = _accelerator_responsive()
    import jax

    if not tpu_ok:
        # sitecustomize pins jax_platforms='axon,cpu'; override after import
        # (backends init lazily) so the bench reports a CPU number instead
        # of hanging the driver
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from image_retrieval_for_image_based_localization_tpu.api import Extractor
    from image_retrieval_for_image_based_localization_tpu.retrieval.knn import (
        knn_search,
    )
    from image_retrieval_for_image_based_localization_tpu.utils.config import (
        ExtractConfig,
        ModelConfig,
    )

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # batch 128 is the measured throughput peak on this rig (PERF.md
        # batch-scaling table); 16 iters/group amortizes dispatch
        batch, size, iters, groups = 128, 1024, 16, 3
        Ng, D, nq, knn_reps = 100_000, 2048, 256, 5
    else:  # CPU fallback keeps the script runnable anywhere
        batch, size, iters, groups = 2, 128, 3, 2
        Ng, D, nq, knn_reps = 2_000, 256, 16, 3

    ex = Extractor(
        ExtractConfig(
            model=ModelConfig(
                arch="resnet50", pooling="gem",
                dtype="bfloat16" if on_tpu else "float32",
                use_pallas=on_tpu,
            ),
            image_size=size, batch_size=batch,
        ),
        rng=1,
    )
    forward = ex._forward_u8  # the jitted per-batch production program
    variables = ex.variables
    # inputs generated on device: uint8 pixels + full-frame valid extents
    key = jax.random.PRNGKey(0)
    pixels = jax.random.randint(
        key, (batch, size, size, 3), 0, 256, jnp.uint8)
    sizes = jnp.full((batch, 2), size, jnp.int32)

    np.asarray(forward(variables, pixels, sizes))  # compile + warm

    rates = []
    for _ in range(groups):
        t0 = time.perf_counter()
        outs = [forward(variables, pixels, sizes) for _ in range(iters)]
        outs = [np.asarray(o) for o in outs]  # overlapped dispatch, full drain
        rates.append(batch * iters / (time.perf_counter() - t0))
    img_per_sec = statistics.median(rates)

    # MFU / roofline aux (VERDICT r3 #8): effective TFLOP/s of the
    # extraction phase, as a fraction of (a) the rig's bf16 matmul peak
    # measured in this same process and (b) v5e spec (197 TF bf16) — makes
    # vs_baseline interpretable across day-to-day rig-speed drift without
    # cross-referencing PERF.md.
    ext_tflops = mfu_rig = mfu_spec = rig_peak_tf = None
    try:
        ca = forward.lower(variables, pixels, sizes).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_iter = float(ca.get("flops", 0.0))
    except Exception:
        flops_per_iter = 0.0
    if flops_per_iter > 0:
        ext_tflops = flops_per_iter * (img_per_sec / batch) / 1e12
        spec_tf = _spec_peak_tflops_bf16()
        if spec_tf:
            mfu_spec = ext_tflops / spec_tf
    hbm_stream_gbs = None
    if on_tpu:
        mk = jax.random.normal(jax.random.PRNGKey(3), (8192, 8192), jnp.bfloat16)

        @jax.jit
        def _peak(x):
            def body(_, y):
                return (y @ x) * jnp.bfloat16(1.0 / 8192)

            return jax.lax.fori_loop(0, 16, body, x).astype(jnp.float32).sum()

        np.asarray(_peak(mk))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(_peak(mk))
        rig_peak_tf = 16 * 2 * 8192**3 / (time.perf_counter() - t0) / 1e12
        if ext_tflops is not None:
            mfu_rig = ext_tflops / rig_peak_tf
        del mk

        # Streaming-HBM probe at EXTRACTION working-set scale (round 5,
        # VERDICT r4 weak #3): the old `hbm_probe_gbs` (dense-kNN-derived,
        # kept below for cross-round continuity) measures a matmul phase,
        # not raw streaming, and lands ~5x under the rate the extraction
        # trace itself sustains (191 vs 922 GB/s) — so it cannot normalize
        # extraction numbers. This probe makes 16 full passes over a 2 GB
        # resident array inside ONE jitted fori_loop (32 GB of reads,
        # ~35-60 ms device — well past the ~32 ms dispatch floor). Each
        # pass folds the previous scalar through abs() so nothing can be
        # hoisted or CSE'd across passes; the scalar result is the only
        # transfer. Probe-design A/B on hardware (PERF.md round 5):
        # chunked scan+dynamic-slice variants measure loop/dispatch
        # overhead (74-91 GB/s), full-array fori passes measure streaming
        # (548 GB/s same day) — this is the fori design.
        stream_elems, n_pass = 512 * 1024 * 1024, 16  # 2 GB f32
        stream_src = jax.random.normal(
            jax.random.PRNGKey(9), (stream_elems,), jnp.float32)

        @jax.jit
        def _stream(x):
            def body(_, acc):
                return jnp.sum(jnp.abs(x - acc)) / stream_elems

            return jax.lax.fori_loop(0, n_pass, body, jnp.float32(0.0))

        np.asarray(_stream(stream_src))  # compile + warm
        stream_bytes = stream_elems * 4 * n_pass
        s_reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [_stream(stream_src) for _ in range(4)]
            for s in outs:
                np.asarray(s)
            s_reps.append(4 * stream_bytes / (time.perf_counter() - t0) / 1e9)
        hbm_stream_gbs = statistics.median(s_reps)
        del stream_src

    # free the conv working set before the kNN phase (large batches + the
    # 100k gallery together can exhaust HBM on a long-lived process)
    del pixels, sizes, variables, outs, ex
    import gc

    gc.collect()

    # auxiliary: exact kNN queries/sec over a large gallery (median of reps)
    kg, kq = jax.random.split(jax.random.PRNGKey(2))
    gallery = jax.random.normal(kg, (Ng, D), jnp.float32)
    queries = jax.random.normal(kq, (nq, D), jnp.float32)
    np.asarray(knn_search(gallery, queries, k=100)[0])  # compile
    qps_reps = []
    for _ in range(knn_reps):
        t0 = time.perf_counter()
        rs = [knn_search(gallery, queries, k=100) for _ in range(3)]
        rs = [np.asarray(s) for s, _ in rs]
        qps_reps.append(nq * 3 / (time.perf_counter() - t0))
    qps = statistics.median(qps_reps)

    # serving concurrency-1 latency: ONE query through the round-5 fused
    # single-dispatch program (whiten-less here; score+select in one jit).
    # Through the relay this is dominated by the flat dispatch floor —
    # the staged per-op path it replaced measured ~9x worse (PERF.md r5).
    from image_retrieval_for_image_based_localization_tpu.retrieval.index import (
        _fused_query_plain,
    )

    q1 = queries[:1]
    np.asarray(_fused_query_plain(gallery, q1, k=10)[0])  # compile
    lat1 = []
    for _ in range(30):
        t0 = time.perf_counter()
        s1, i1 = _fused_query_plain(gallery, q1, k=10)
        np.asarray(s1), np.asarray(i1)
        lat1.append(time.perf_counter() - t0)
    fused_query_p50_ms = statistics.median(lat1) * 1e3

    # dispatch-amortized variants: several query batches inside ONE jitted
    # program (lax.map) — a single 256-query call through this rig's tunnel
    # costs a flat ~32 ms dispatch vs ~12 ms device compute, so the
    # single-call q/s mostly measures relay latency (that is why identical
    # code benched 20.7k q/s in round 1 and 5.8-8.4k in round 2).
    #   knn_qps_amortized: device search capability, dispatch amortized 8x.
    #   dense_floor_qps / hbm_probe_gbs: the same map over the PLAIN score
    #   matmul (max-reduced) — the selection-free upper bound, whose
    #   gallery-streaming rate doubles as the HBM drift normalizer.
    from image_retrieval_for_image_based_localization_tpu.retrieval.knn import (
        score_matrix,
        streaming_topk,
    )

    n_stack = 8 if on_tpu else 2
    qstack = jax.random.normal(jax.random.PRNGKey(7), (n_stack, nq, D), jnp.float32)

    # The amortized metrics drain a TINY in-jit checksum (sum of scores +
    # indices) instead of the full (stack, 256, 100) result tensors: the
    # metric's purpose is DEVICE search capability with dispatch amortized,
    # and pulling ~0.8 MB of top-k per stack through the tunnel's
    # tens-of-MB/s serializes ~100 ms of transfer into a device measurement
    # (the checksum still forces full materialization of both outputs —
    # nothing is dead-code-eliminated). End-to-end cost including result
    # return stays covered by knn_qps_median (single-call, full payload).
    @jax.jit
    def multi_search(g, qs):
        s, i = jax.lax.map(lambda q: streaming_topk(g, q, k=100), qs)
        return s.sum() + i.sum().astype(jnp.float32)

    @jax.jit
    def multi_dense(g, qs):
        return jax.lax.map(
            lambda q: jnp.max(score_matrix(g, q), axis=-1), qs).sum()

    np.asarray(multi_search(gallery, qstack))
    np.asarray(multi_dense(gallery, qstack))
    # pipelined drain (round 4): issue `depth` stacks before draining so
    # the flat ~32 ms/call dispatch overlaps device compute (the checksum
    # return above keeps the drain itself to 8 bytes/stack). depth swept
    # 3/6/10 on hardware with full-payload drains: 28k/37.6k/28k q/s — 6
    # kept the transfer overlapped without over-queueing the relay.
    depth = 6 if on_tpu else 1
    amort_reps, dense_reps = [], []
    for _ in range(knn_reps):
        t0 = time.perf_counter()
        outs = [multi_search(gallery, qstack) for _ in range(depth)]
        for s in outs:
            np.asarray(s)
        amort_reps.append(depth * n_stack * nq / (time.perf_counter() - t0))
        t0 = time.perf_counter()
        outs = [multi_dense(gallery, qstack) for _ in range(depth)]
        for o in outs:
            np.asarray(o)
        dense_reps.append(depth * n_stack * nq / (time.perf_counter() - t0))
    qps_amort = statistics.median(amort_reps)
    dense_qps = statistics.median(dense_reps)
    hbm_gbs = dense_qps / nq * Ng * D * 4 / 1e9  # gallery bytes per second

    # PQ ADC throughput over the same gallery SHAPE (synthesized codes —
    # gather+sum cost is content-independent, and this avoids pulling the
    # 800MB device gallery through the tunnel for a k-means build). M=D/32
    # is the default 128x-compression operating point.
    from image_retrieval_for_image_based_localization_tpu.retrieval.pq import (
        _adc_search,
    )

    M = max(4, D // 32)
    rng = np.random.RandomState(3)
    books = jnp.asarray(rng.randn(M, 256, D // M).astype(np.float32))
    codes = jnp.asarray(
        rng.randint(0, 256, size=(Ng, M), dtype=np.uint8))

    @jax.jit
    def multi_adc(bk, cd, qs):
        s, i = jax.lax.map(
            lambda q: _adc_search(bk, cd, q, k=100, chunk=min(65536, Ng)), qs)
        return s.sum() + i.sum().astype(jnp.float32)

    np.asarray(multi_adc(books, codes, qstack))
    adc_reps = []
    for _ in range(knn_reps):
        t0 = time.perf_counter()
        outs = [multi_adc(books, codes, qstack) for _ in range(depth)]
        for s in outs:
            np.asarray(s)
        adc_reps.append(depth * n_stack * nq / (time.perf_counter() - t0))
    adc_qps = statistics.median(adc_reps)

    target_per_chip = 5000.0 / 8.0  # BASELINE.json:5 north star, per chip
    print(
        json.dumps(
            {
                "metric": "descriptor_extract_images_per_sec",
                "value": round(img_per_sec, 2),
                "unit": "images/sec (1 chip, resnet50+gem bf16 @1024px)",
                "vs_baseline": round(img_per_sec / target_per_chip, 4),
                "aux": {
                    "extract_group_rates": [round(r, 1) for r in rates],
                    "knn_qps_median": round(qps, 1),
                    "knn_qps_reps": [round(r, 1) for r in qps_reps],
                    "knn_qps_amortized": round(qps_amort, 1),
                    "fused_query_p50_ms": round(fused_query_p50_ms, 2),
                    "dense_floor_qps": round(dense_qps, 1),
                    "hbm_probe_gbs": round(hbm_gbs, 1),
                    "hbm_stream_gbs": (
                        round(hbm_stream_gbs, 1) if hbm_stream_gbs else None
                    ),
                    "pq_adc_qps": round(adc_qps, 1),
                    "extract_tflops_effective": (
                        round(ext_tflops, 1) if ext_tflops else None
                    ),
                    "rig_peak_tflops_bf16": (
                        round(rig_peak_tf, 1) if rig_peak_tf else None
                    ),
                    "extract_mfu_vs_rig": (
                        round(mfu_rig, 3) if mfu_rig else None
                    ),
                    "extract_mfu_vs_spec": (
                        round(mfu_spec, 3) if mfu_spec else None
                    ),
                    "backend": jax.default_backend(),
                    "batch": batch,
                    "image_size": size,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
