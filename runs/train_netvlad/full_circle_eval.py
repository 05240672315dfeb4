"""Full-circle eval of the train_netvlad campaign: trained NetVLAD
checkpoint + its own Lw whitening, raw vs whitened mAP from one
extraction pass (same scheme as runs/train_ref_geom/full_circle_eval.py)."""
import time

import numpy as np
import jax

print("devices:", jax.devices(), flush=True)

from irtpu.api import Extractor
from irtpu.data.test_datasets import configdataset
from irtpu.evaluation.map import compute_map_and_print
from irtpu.models import RetrievalNet
from irtpu.retrieval.index import Index
from irtpu.retrieval.knn import full_ranks
from irtpu.training import TrainConfig, create_train_state
from irtpu.utils.checkpoint import load_checkpoint
from irtpu.utils.config import ExtractConfig, IndexConfig, ModelConfig

ds = configdataset("synthtrain", "/tmp/irtpu_nv")
print(f"dataset: {ds.n} db, {ds.nq} queries", flush=True)

model = RetrievalNet(arch="resnet18", pooling="netvlad")
state, _ = create_train_state(model, jax.random.PRNGKey(0),
                              input_shape=(64, 64, 3), cfg=TrainConfig())
tree, meta = load_checkpoint("runs/train_netvlad", name="latest", target=state)
print("checkpoint meta:", meta, flush=True)
variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}

cfg = ExtractConfig(
    model=ModelConfig(arch="resnet18", pooling="netvlad"),
    image_size=256, batch_size=16,
)
ex = Extractor(cfg, variables=variables)

t0 = time.time()
db = ex.extract(ds.image_paths)
print(f"db extracted: {db.shape} in {time.time()-t0:.1f}s", flush=True)
qd = ex.extract(ds.query_paths, bbxs=ds.query_bbxs)
print(f"queries extracted: {qd.shape}", flush=True)

print("== raw descriptors ==", flush=True)
compute_map_and_print(ds.name, np.asarray(full_ranks(db, qd)), ds.gnd)

print("== Lw-whitened (training's whitening.npz) ==", flush=True)
z = np.load("runs/train_netvlad/whitening.npz")
idx = Index.build(db, IndexConfig(whitening=None),
                  whitening_mP=(z["m"], z["P"]))
qw = idx.transform_queries(qd)
compute_map_and_print(ds.name + "+lw",
                      np.asarray(full_ranks(idx.gallery, qw)), ds.gnd)
print("EVAL DONE", flush=True)
