"""Dataset layer: synthetic corpus, gnd contract, configdataset, harness."""

import os

import pytest

from irtpu.data.test_datasets import configdataset, make_synthetic_dataset
from irtpu.data.download import download_test, check_test_dataset


def test_synthetic_dataset_contract(tmp_path):
    ds = make_synthetic_dataset(str(tmp_path), n_scenes=2, views_per_scene=3,
                                n_distractors=2, image_hw=(48, 64))
    assert ds.n == 2 * (3 + 1) + 2  # views + junk per scene + distractors
    assert ds.nq == 2
    for p in ds.image_paths + ds.query_paths:
        assert os.path.exists(p), p
    g = ds.gnd[0]
    assert "easy" in g and "hard" in g and "junk" in g and "bbx" in g


def test_configdataset_roundtrip(tmp_path):
    make_synthetic_dataset(str(tmp_path), name="synthx", n_scenes=2,
                           views_per_scene=2, n_distractors=0, image_hw=(48, 64))
    ds = configdataset("synthx", str(tmp_path))
    assert ds.n > 0 and ds.nq > 0
    assert ds.query_bbxs is not None


def test_configdataset_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="no network"):
        configdataset("roxford5k", str(tmp_path))


def test_download_stub(tmp_path):
    assert not check_test_dataset(str(tmp_path), "roxford5k")
    with pytest.raises(FileNotFoundError):
        download_test(str(tmp_path), "roxford5k")


def test_harness_end_to_end(tmp_path):
    """Full test.py-equivalent stack on the synthetic corpus (tiny model)."""
    from irtpu.evaluation import evaluate_dataset
    from irtpu.utils.config import ExtractConfig, IndexConfig, ModelConfig

    ds = make_synthetic_dataset(str(tmp_path), n_scenes=3, views_per_scene=4,
                                n_distractors=4, image_hw=(64, 80), seed=1)
    cfg = ExtractConfig(
        model=ModelConfig(arch="resnet18", pooling="gem"),
        image_size=80, batch_size=4,
    )
    out = evaluate_dataset(ds, cfg, IndexConfig(whitening=None))
    res = out["results"]
    # random weights on structured textures: identity-preserving jitters must
    # still retrieve their scene far above chance
    assert res["medium"]["map"] > 0.5, res["medium"]["map"]
    assert out["db"].shape[0] == ds.n


def test_harness_sharded_matches_dense(tmp_path):
    from irtpu.evaluation import evaluate_dataset
    from irtpu.parallel import create_mesh
    from irtpu.utils.config import ExtractConfig, IndexConfig, ModelConfig

    ds = make_synthetic_dataset(str(tmp_path), n_scenes=2, views_per_scene=3,
                                n_distractors=2, image_hw=(64, 80), seed=2)
    cfg = ExtractConfig(
        model=ModelConfig(arch="resnet18", pooling="gem"),
        image_size=80, batch_size=4,
    )
    out1 = evaluate_dataset(ds, cfg, IndexConfig(whitening=None),
                            recall_ks=(1, 5))
    out2 = evaluate_dataset(
        ds, cfg, IndexConfig(whitening=None),
        mesh=create_mesh([1, 8]), use_sharded_index=True,
        recall_ks=(1, 5),
    )
    assert abs(out1["results"]["medium"]["map"] - out2["results"]["medium"]["map"]) < 1e-9
    # localization recall@k: the dense-shortlist and streaming
    # candidate-rank derivations must agree exactly on the same ranking
    assert out1["recall"]["recall"] == out2["recall"]["recall"]
    assert out1["recall"]["n_queries"] == out2["recall"]["n_queries"] > 0
