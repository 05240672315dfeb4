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
