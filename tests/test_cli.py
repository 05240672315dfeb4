"""CLI surface on CPU: synth -> extract -> build-index -> query -> evaluate."""

import os

import numpy as np
import pytest

from irtpu.cli import main


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_ds"))
    rc = main(["synth", "--root", root, "--name", "clitest", "--scenes", "2",
               "--views", "2", "--distractors", "2"])
    assert rc == 0
    return root


def test_cli_usage_error():
    assert main([]) == 2
    assert main(["not-a-command"]) == 2


def test_cli_extract_build_query(synth_root, tmp_path):
    jpg = os.path.join(synth_root, "clitest", "jpg")
    imgs = [os.path.join(jpg, f) for f in sorted(os.listdir(jpg))[:3]]
    descs = str(tmp_path / "d.npy")
    rc = main(["extract", "--images", *imgs, "--arch", "resnet18",
               "--image-size", "64", "--batch-size", "2", "--out", descs])
    assert rc == 0
    d = np.load(descs)
    assert d.shape == (3, 512)

    index = str(tmp_path / "i.npz")
    rc = main(["build-index", "--descriptors", descs, "--out", index,
               "--whitening", "none"])
    assert rc == 0

    out = str(tmp_path / "r.npz")
    rc = main(["query", "--index", index, "--queries", descs, "-k", "2",
               "--out", out])
    assert rc == 0
    z = np.load(out)
    np.testing.assert_array_equal(z["indices"][:, 0], np.arange(3))


def test_cli_evaluate(synth_root, capsys):
    rc = main(["evaluate", "--dataset", "clitest", "--data-root", synth_root,
               "--arch", "resnet18", "--image-size", "64", "--batch-size", "2",
               "--whitening", "none"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mAP" in out


def test_cli_shortlist(synth_root, tmp_path):
    """shortlist: query images -> hloc-style pairs file via the index."""
    jpg = os.path.join(synth_root, "clitest", "jpg")
    all_imgs = [os.path.join(jpg, f) for f in sorted(os.listdir(jpg))]
    db_imgs, q_imgs = all_imgs[:4], all_imgs[4:6]

    descs = str(tmp_path / "db.npy")
    assert main(["extract", "--images", *db_imgs, "--arch", "resnet18",
                 "--image-size", "64", "--batch-size", "2", "--out", descs]) == 0
    index = str(tmp_path / "i.npz")
    assert main(["build-index", "--descriptors", descs, "--out", index,
                 "--whitening", "none"]) == 0

    names = str(tmp_path / "names.txt")
    with open(names, "w") as f:
        f.write("\n".join(os.path.basename(p) for p in db_imgs) + "\n")
    pairs = str(tmp_path / "pairs.txt")
    rc = main(["shortlist", "--index", index, "--images", *q_imgs,
               "--arch", "resnet18", "--image-size", "64", "--batch-size", "2",
               "-k", "3", "--db-names", names, "--out", pairs])
    assert rc == 0
    lines = [l.split() for l in open(pairs) if l.strip()]
    assert len(lines) == 2 * 3  # Nq * k
    db_basenames = {os.path.basename(p) for p in db_imgs}
    for qn, dn in lines:
        assert qn in {os.path.basename(p) for p in q_imgs}
        assert dn in db_basenames
    # queries grouped in order, k lines each
    assert [l[0] for l in lines[:3]] == [os.path.basename(q_imgs[0])] * 3


def test_localization_pairs_roundtrip(tmp_path):
    from irtpu.localization import localize_shortlist, retrieval_pairs
    from irtpu.retrieval.index import Index
    from irtpu.utils.config import IndexConfig

    rng = np.random.RandomState(30)
    db = rng.randn(20, 16).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    index = Index.build(db, IndexConfig(whitening=None))
    q = db[[3, 7]] + rng.randn(2, 16).astype(np.float32) * 0.01
    pairs, scores = localize_shortlist(
        index, q, ["qa", "qb"], db_names=[f"db{i}" for i in range(20)],
        k=2, out_path=str(tmp_path / "p.txt"),
    )
    assert pairs[0] == ("qa", "db3") and pairs[2] == ("qb", "db7")
    on_disk = [tuple(l.split()) for l in open(tmp_path / "p.txt")]
    assert on_disk == pairs


def test_cli_evaluate_whitening_file(synth_root, tmp_path):
    """--whitening-file: pre-learned whitening applied at eval (reference
    test-time semantics); runs end-to-end and prints mAP."""
    rng = np.random.RandomState(32)
    d = rng.randn(50, 512).astype(np.float32)
    from irtpu.ops.whitening import pca_whiten_learn

    m, P = pca_whiten_learn(d)
    wf = str(tmp_path / "w.npz")
    np.savez(wf, m=m.astype(np.float32), P=P.astype(np.float32))
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["evaluate", "--dataset", "clitest", "--data-root",
                   synth_root, "--arch", "resnet18", "--image-size", "64",
                   "--batch-size", "2", "--whitening", "pca",
                   "--whitening-file", wf])
    assert rc == 0
    assert "mAP" in buf.getvalue()


def test_full_system_bench_small():
    """decode->device->descriptor harness runs and reports coherent rates
    (tiny corpus; asserts structure and the decode-alone measurement)."""
    from irtpu.benchmarks import run_full_system_bench
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        res = run_full_system_bench(
            n_images=6, image_size=64, src_hw=(96, 128), arch="resnet18",
            batch_size=3, nthreads_list=(1, 0), reps=2, root=td,
        )
    assert res["e2e_img_per_sec"] > 0
    assert res["device_img_per_sec"] > 0
    assert 0 < res["overlap_efficiency"]
    if res["native"]:
        # nthreads labels resolve to actual counts; on a 1-core host the
        # (1, 0) request list collapses to a single label
        assert len(res["decode_img_per_sec"]) >= 1
        assert all(v > 0 for v in res["decode_img_per_sec"].values())


def test_cli_pq_build_and_query(tmp_path):
    """build-index --pq emits PQ artifacts; query --pq --refine=N matches
    exact search (full rescore makes ranking independent of ADC error)."""
    rng = np.random.RandomState(7)
    g = rng.randn(96, 32).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = g[:5] + 0.05 * rng.randn(5, 32).astype(np.float32)
    descs = str(tmp_path / "d.npy")
    qpath = str(tmp_path / "q.npy")
    np.save(descs, g)
    np.save(qpath, q)

    index = str(tmp_path / "i.npz")
    rc = main(["build-index", "--descriptors", descs, "--out", index,
               "--whitening", "none", "--pq", "8"])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "i.pq.npz"))

    exact = str(tmp_path / "exact.npz")
    assert main(["query", "--index", index, "--queries", qpath, "-k", "3",
                 "--out", exact]) == 0
    got = str(tmp_path / "pq.npz")
    assert main(["query", "--index", index, "--queries", qpath, "-k", "3",
                 "--pq", str(tmp_path / "i.pq.npz"), "--refine", "96",
                 "--out", got]) == 0
    ze, zg = np.load(exact), np.load(got)
    np.testing.assert_array_equal(ze["indices"], zg["indices"])
    np.testing.assert_allclose(ze["scores"], zg["scores"], atol=1e-5)

    # IVF-PQ artifact: probe everything + full refine == exact again
    rc = main(["build-index", "--descriptors", descs, "--out", index,
               "--whitening", "none", "--ivf", "4", "--pq", "8"])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "i.ivfpq.npz"))
    got2 = str(tmp_path / "ivfpq.npz")
    assert main(["query", "--index", index, "--queries", qpath, "-k", "3",
                 "--pq", str(tmp_path / "i.ivfpq.npz"), "--nprobe", "4",
                 "--refine", "96", "--out", got2]) == 0
    z2 = np.load(got2)
    np.testing.assert_array_equal(ze["indices"], z2["indices"])
    np.testing.assert_allclose(ze["scores"], z2["scores"], atol=1e-5)

    # --pq and --ivf together on the query side is a usage error
    with pytest.raises(SystemExit):
        main(["query", "--index", index, "--queries", qpath,
              "--pq", str(tmp_path / "i.ivfpq.npz"),
              "--ivf", str(tmp_path / "i.ivf.npz")])

    # sharded ADC over the virtual mesh: full refine still == exact
    got3 = str(tmp_path / "pq_sharded.npz")
    assert main(["query", "--index", index, "--queries", qpath, "-k", "3",
                 "--pq", str(tmp_path / "i.pq.npz"), "--sharded",
                 "--refine", "96", "--out", got3]) == 0
    z3 = np.load(got3)
    np.testing.assert_array_equal(ze["indices"], z3["indices"])
    # sharding an .ivfpq.npz artifact is a usage error
    with pytest.raises(SystemExit):
        main(["query", "--index", index, "--queries", qpath, "--sharded",
              "--pq", str(tmp_path / "i.ivfpq.npz")])

    # OPQ flat build: rotation persisted, refined query still == exact
    assert main(["build-index", "--descriptors", descs, "--out", index,
                 "--whitening", "none", "--pq", "8", "--opq", "3"]) == 0
    got4 = str(tmp_path / "opq.npz")
    assert main(["query", "--index", index, "--queries", qpath, "-k", "3",
                 "--pq", str(tmp_path / "i.pq.npz"), "--refine", "96",
                 "--out", got4]) == 0
    z4 = np.load(got4)
    np.testing.assert_array_equal(ze["indices"], z4["indices"])
    # --opq with --ivf: rotation learned over residuals; full probe +
    # full refine still == exact
    assert main(["build-index", "--descriptors", descs, "--out", index,
                 "--whitening", "none", "--ivf", "4", "--pq", "8",
                 "--opq", "3"]) == 0
    got5 = str(tmp_path / "opq_ivfpq.npz")
    assert main(["query", "--index", index, "--queries", qpath, "-k", "3",
                 "--pq", str(tmp_path / "i.ivfpq.npz"), "--nprobe", "4",
                 "--refine", "96", "--out", got5]) == 0
    z5 = np.load(got5)
    np.testing.assert_array_equal(ze["indices"], z5["indices"])


def test_cli_bench_ann_small(capsys):
    """ANN sweep runs tiny and reports coherent rows: exact recall 1.0,
    full-probe IVF == exact, refined variants beat pure ADC."""
    rc = main(["bench-ann", "-n", "1500", "-d", "32", "--nq", "24",
               "--clusters", "8", "-m", "4", "--reps", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "exact" in out and "ivf_nprobe8" in out and "opq_adc" in out

    from irtpu.benchmarks import run_ann_bench

    res = run_ann_bench(n=1500, d=32, nq=24, n_clusters=8, m=4, reps=2)
    assert res["exact"]["recall_at_k"] == 1.0
    assert res["ivf_nprobe8"]["recall_at_k"] == 1.0  # full probe
    assert (res["pq_refine100"]["recall_at_k"]
            >= res["pq_adc"]["recall_at_k"])


def test_cli_query_qe_with_approximate_is_usage_error(tmp_path):
    """--qe silently did nothing with --ivf/--pq; it is now a loud error."""
    rng = np.random.RandomState(50)
    g = rng.randn(64, 32).astype(np.float32)
    descs = str(tmp_path / "d.npy")
    np.save(descs, g)
    index = str(tmp_path / "i.npz")
    assert main(["build-index", "--descriptors", descs, "--out", index,
                 "--whitening", "none", "--ivf", "4", "--pq", "8"]) == 0
    for extra in (["--ivf", str(tmp_path / "i.ivf.npz")],
                  ["--pq", str(tmp_path / "i.pq.npz")]):
        with pytest.raises(SystemExit):
            main(["query", "--index", index, "--queries", descs,
                  "--qe", "5", *extra])


def test_cli_bench_train_tiny(capsys):
    """Training bench runs tiny on CPU and reports coherent throughput:
    positive rates, images/s == tuples/s * (2 + n_neg), finite loss."""
    rc = main(["bench-train", "--arch", "resnet18", "--image-size", "64",
               "--batch-tuples", "2", "--n-neg", "2", "--reps", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "tuples/s=" in out and "resnet18+gem" in out

    from irtpu.benchmarks import run_training_bench

    res = run_training_bench(arch="resnet18", image_size=64, batch_tuples=2,
                             n_neg=2, reps=2, warmup=1)
    assert res["tuples_per_sec"] > 0
    assert res["images_per_sec"] == pytest.approx(
        res["tuples_per_sec"] * 4, rel=0.02)
    assert np.isfinite(res["loss"])
    assert res["lat_p95_ms"] >= res["lat_p50_ms"]
