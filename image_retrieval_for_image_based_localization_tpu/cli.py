"""Command-line entry points mirroring the reference's `test.py` / `train.py`
(SURVEY.md §3.1/§3.2 L5 layer).

Usage:
    python -m image_retrieval_for_image_based_localization_tpu.cli evaluate \
        --dataset roxford5k --data-root /data --arch resnet50 --pooling gem \
        --image-size 1024 --multiscale --whitening pca
    python -m image_retrieval_for_image_based_localization_tpu.cli extract \
        --images img1.jpg img2.jpg --arch resnet50 --out descs.npy
    python -m image_retrieval_for_image_based_localization_tpu.cli train ...
    python -m image_retrieval_for_image_based_localization_tpu.cli synth \
        --root /tmp/synth  # generate the offline synthetic dataset
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _model_args(p: argparse.ArgumentParser):
    p.add_argument("--arch", default="resnet50")
    p.add_argument("--pooling", default="gem",
                   choices=["gem", "gemmp", "mac", "spoc", "rmac", "netvlad"])
    p.add_argument("--regional", action="store_true",
                   help="cirtorch Rpool: base pool per R-MAC region, "
                        "per-region L2N (+whitening if --whiten-dim), "
                        "region sum (forces exact-shape extraction)")
    p.add_argument("--whiten-dim", type=int, default=None,
                   help="learned FC whitening output dim")
    p.add_argument("--netvlad-clusters", type=int, default=64,
                   help="NetVLAD cluster count K (descriptor dim = K*C)")
    p.add_argument("--image-size", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--multiscale", action="store_true",
                   help="use the [1, 1/sqrt2, 1/2] pyramid")
    p.add_argument("--exact", action="store_true",
                   help="exact-shape extraction (no spatial padding; "
                        "reference bs=1 semantics, one compile per shape)")
    p.add_argument("--upscale", action="store_true",
                   help="also grow small images to --image-size (default: "
                        "shrink-only, reference thumbnail semantics)")
    p.add_argument("--resize-filter", default="lanczos",
                   choices=["lanczos", "bilinear"],
                   help="host resize filter (lanczos = reference parity)")
    p.add_argument("--bf16", action="store_true", help="bfloat16 trunk compute")
    p.add_argument("--pallas", action="store_true", help="use fused Pallas head")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir (or torch state_dict .pth) to load")
    p.add_argument("--network", default=None,
                   help="pretrained zoo network name (reference "
                        "--network-path flow): verify-or-fetch the .pth, "
                        "rebuild the model from its meta, port the weights, "
                        "and use its pre-learned Lw whitening if present")


def _build_extract_cfg(args):
    from image_retrieval_for_image_based_localization_tpu.utils.config import (
        DEFAULT_SCALES,
        ExtractConfig,
        ModelConfig,
    )

    return ExtractConfig(
        model=ModelConfig(
            arch=args.arch,
            pooling=args.pooling,
            regional=getattr(args, "regional", False),
            whiten_dim=args.whiten_dim,
            netvlad_clusters=getattr(args, "netvlad_clusters", 64),
            dtype="bfloat16" if args.bf16 else "float32",
            use_pallas=args.pallas,
        ),
        image_size=args.image_size,
        batch_size=args.batch_size,
        scales=DEFAULT_SCALES if args.multiscale else (1.0,),
        exact=args.exact,
        upscale=args.upscale,
        resize_filter=args.resize_filter,
    )


def _resolve_network(args):
    """--network NAME: verify-or-fetch a pretrained zoo .pth and port it.

    Mutates args.arch/pooling/whiten_dim to the checkpoint meta's values
    (so _build_extract_cfg builds the matching model) and returns
    (variables, whitening_mP_or_None).
    """
    if getattr(args, "network", None) is None:
        return None, None
    from image_retrieval_for_image_based_localization_tpu.models.zoo import (
        load_pretrained,
    )

    root = getattr(args, "data_root", None) or "data"
    model, variables, mP = load_pretrained(
        args.network,
        data_root=root,
        whitening_scale="ms" if getattr(args, "multiscale", False) else "ss",
    )
    args.arch = model.arch
    args.pooling = model.pooling
    args.regional = model.regional
    args.whiten_dim = model.whiten_dim
    # checkpoint metas carry K (older zoo nets use 16/32/64); without this
    # a K!=64 NetVLAD checkpoint fails to port into the default-K model
    args.netvlad_clusters = model.netvlad_clusters
    return variables, mP


def _load_variables(args, model):
    if args.checkpoint is None:
        return None
    if args.checkpoint.endswith((".pth", ".pt")):
        import torch

        from image_retrieval_for_image_based_localization_tpu.models.torch_port import (
            port_retrieval_net,
        )

        sd = torch.load(args.checkpoint, map_location="cpu")
        sd = sd.get("state_dict", sd)
        return port_retrieval_net(sd, args.arch)
    from image_retrieval_for_image_based_localization_tpu.utils.checkpoint import (
        load_checkpoint,
    )

    tree, _ = load_checkpoint(args.checkpoint, name="best")
    return {"params": tree["params"], "batch_stats": tree.get("batch_stats", {})}


def cmd_extract(argv):
    p = argparse.ArgumentParser(prog="extract")
    _model_args(p)
    p.add_argument("--images", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--data-root", default="data",
                   help="cache root for --network checkpoint fetch")
    args = p.parse_args(argv)

    from image_retrieval_for_image_based_localization_tpu.api import Extractor

    net_vars, _ = _resolve_network(args)
    cfg = _build_extract_cfg(args)
    ex = Extractor(cfg)
    variables = _load_variables(args, ex.model) or net_vars
    if variables is not None:
        ex = Extractor(cfg, variables=variables)
    descs = ex.extract(args.images, progress=True)
    np.save(args.out, descs)
    print(f"wrote {descs.shape} descriptors to {args.out}")


def cmd_evaluate(argv):
    p = argparse.ArgumentParser(prog="evaluate")
    _model_args(p)
    p.add_argument("--dataset", required=True)
    p.add_argument("--data-root", required=True)
    p.add_argument("--whitening", default="none", choices=["pca", "lw", "none"])
    p.add_argument("--whiten-dims", type=int, default=None)
    p.add_argument("--strict-whitening", action="store_true",
                   help="strict-reference PCA (no auto-shrinkage/floor)")
    p.add_argument("--whitening-file", default=None,
                   help="npz with pre-learned m/P (e.g. training's "
                        "whitening.npz) applied instead of learning from "
                        "the eval gallery (reference test-time semantics)")
    p.add_argument("--qe", type=int, default=0, metavar="NQE",
                   help="alpha-query-expansion neighbor count (0 = off); "
                        "beyond-reference mAP booster")
    p.add_argument("--qe-alpha", type=float, default=3.0,
                   help="alphaQE weight exponent (0 = average QE)")
    p.add_argument("--dba", type=int, default=0, metavar="NQE",
                   help="database-side augmentation neighbor count at "
                        "index build (0 = off)")
    p.add_argument("--dba-alpha", type=float, default=3.0)
    p.add_argument("--diffusion", action="store_true",
                   help="kNN-graph diffusion re-ranking (manifold "
                        "search); dense ranking path only")
    p.add_argument("--diffusion-k", type=int, default=50,
                   help="graph neighbors per gallery item")
    p.add_argument("--diffusion-seeds", type=int, default=10,
                   help="seed matches per query")
    p.add_argument("--ann", default=None, choices=["ivf", "pq", "approx"],
                   help="evaluate from an APPROXIMATE top-K shortlist "
                        "(honest mAP lower bound: missing positives count "
                        "as never retrieved) — prices nprobe/M in mAP "
                        "points on this corpus; 'approx' = full-precision "
                        "scoring with TPU hardware approximate selection "
                        "(lax.approx_max_k)")
    p.add_argument("--shortlist-k", type=int, default=100,
                   help="ANN shortlist depth K for --ann")
    p.add_argument("--recall-ks", default=None, metavar="K1,K2,...",
                   help="also report localization recall@k (fraction of "
                        "queries with a correct db image in the top-k "
                        "shortlist) at these depths, e.g. 1,5,10,20")
    p.add_argument("--ann-nprobe", type=int, default=8)
    p.add_argument("--ann-clusters", type=int, default=None)
    p.add_argument("--ann-m", type=int, default=None,
                   help="PQ code bytes/row (default D/32)")
    p.add_argument("--ann-refine", type=int, default=0)
    p.add_argument("--ann-opq", type=int, default=0)
    p.add_argument("--ann-recall-target", type=float, default=0.95,
                   help="per-element expected recall for --ann approx")
    p.add_argument("--sharded", action="store_true",
                   help="use the multi-chip sharded gallery")
    p.add_argument("--mesh", default=None, metavar="DxG",
                   help="mesh shape data x gallery, e.g. 2x4 (default: all "
                        "devices on the gallery axis)")
    p.add_argument("--metrics-out", default=None)
    args = p.parse_args(argv)

    from image_retrieval_for_image_based_localization_tpu.api import Extractor
    from image_retrieval_for_image_based_localization_tpu.data.test_datasets import (
        configdataset,
    )
    from image_retrieval_for_image_based_localization_tpu.evaluation.harness import (
        evaluate_dataset,
    )
    from image_retrieval_for_image_based_localization_tpu.utils.config import IndexConfig
    from image_retrieval_for_image_based_localization_tpu.utils.metrics import (
        MetricsLogger,
    )

    mesh = None
    if args.mesh:
        from image_retrieval_for_image_based_localization_tpu.parallel.mesh import (
            create_mesh,
        )

        d, g = (int(v) for v in args.mesh.lower().split("x"))
        mesh = create_mesh([d, g])

    net_vars, net_mP = _resolve_network(args)
    whitening_mP = net_mP
    if args.whitening_file:
        z = np.load(args.whitening_file)
        whitening_mP = (z["m"], z["P"])  # overrides the network's Lw

    from image_retrieval_for_image_based_localization_tpu.data.download import (
        TEST_MANIFESTS,
        download_test,
    )

    if args.dataset in TEST_MANIFESTS:
        # reference test.py startup semantics: fetch the dataset if absent
        # (verify-or-fetch; offline -> actionable error listing paths)
        download_test(args.data_root, args.dataset)
    dataset = configdataset(args.dataset, args.data_root)
    cfg = _build_extract_cfg(args)
    ex = Extractor(cfg, mesh=mesh)
    variables = _load_variables(args, ex.model) or net_vars
    if variables is not None:
        ex = Extractor(cfg, variables=variables, mesh=mesh)
    evaluate_dataset(
        dataset,
        cfg,
        IndexConfig(
            whitening=None if args.whitening == "none" else args.whitening,
            whiten_dims=args.whiten_dims,
            strict_whitening=args.strict_whitening,
            dba_nqe=args.dba,
            dba_alpha=args.dba_alpha,
        ),
        extractor=ex,
        logger=MetricsLogger(args.metrics_out, echo=True),
        mesh=mesh,
        use_sharded_index=args.sharded,
        whitening_mP=whitening_mP,
        qe_nqe=args.qe,
        qe_alpha=args.qe_alpha,
        diffusion=args.diffusion,
        diffusion_kwargs={"k_graph": args.diffusion_k,
                          "k_seed": args.diffusion_seeds},
        ann=args.ann,
        ann_kwargs=(
            {"nprobe": args.ann_nprobe, "n_clusters": args.ann_clusters}
            if args.ann == "ivf" else
            {"m": args.ann_m, "refine": args.ann_refine,
             "opq_iters": args.ann_opq}
            if args.ann == "pq" else
            {"recall_target": args.ann_recall_target}
            if args.ann == "approx" else None
        ),
        shortlist_k=args.shortlist_k,
        recall_ks=(None if args.recall_ks is None else
                   [int(v) for v in args.recall_ks.split(",") if v]),
    )


def cmd_train(argv):
    p = argparse.ArgumentParser(prog="train")
    _model_args(p)
    p.add_argument("--loss", default="contrastive", choices=["contrastive", "triplet"])
    p.add_argument("--margin", type=float, default=0.7)
    p.add_argument("--lr", type=float, default=1e-6)
    p.add_argument("--optimizer", default="adam", choices=["adam", "sgd"],
                   help="reference train.py's --optimizer choice")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="trunk compute dtype; bfloat16 = TPU mixed "
                        "precision (params/optimizer stay f32)")
    p.add_argument("--momentum", type=float, default=0.9,
                   help="SGD momentum (torch.optim semantics)")
    p.add_argument("--update-every", type=int, default=1,
                   help="gradient accumulation: apply the optimizer every "
                        "k-th tuple batch (reference --update-every; "
                        "gradients are AVERAGED across the k batches)")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--n-neg", type=int, default=5)
    p.add_argument("--batch-tuples", type=int, default=5)
    p.add_argument("--qsize", type=int, default=None,
                   help="query pairs sampled per epoch (reference: 2000)")
    p.add_argument("--poolsize", type=int, default=None,
                   help="negative-pool images sampled per epoch "
                        "(reference: 20000)")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--resume", default=None,
                   help="checkpoint dir to resume from (loads 'latest')")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize trunk activations in backward "
                        "(enables large tuple batches at 1024px)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the generated synthetic corpus (offline mode)")
    p.add_argument("--synth-scenes", type=int, default=12)
    p.add_argument("--synth-views", type=int, default=4)
    p.add_argument("--data-root", default="/tmp/irtpu_data")
    args = p.parse_args(argv)

    from image_retrieval_for_image_based_localization_tpu.training.loop import (
        run_training,
    )

    run_training(args)


def cmd_synth(argv):
    p = argparse.ArgumentParser(prog="synth")
    p.add_argument("--root", required=True)
    p.add_argument("--name", default="synthcity")
    p.add_argument("--scenes", type=int, default=8)
    p.add_argument("--views", type=int, default=5)
    p.add_argument("--distractors", type=int, default=10)
    args = p.parse_args(argv)

    from image_retrieval_for_image_based_localization_tpu.data.test_datasets import (
        make_synthetic_dataset,
    )

    ds = make_synthetic_dataset(
        args.root,
        name=args.name,
        n_scenes=args.scenes,
        views_per_scene=args.views,
        n_distractors=args.distractors,
    )
    print(f"created {ds.name}: {ds.n} db images, {ds.nq} queries at {ds.images_dir}")


def cmd_parity(argv):
    p = argparse.ArgumentParser(prog="parity")
    p.add_argument("--arch", default="resnet50")
    p.add_argument("--image-size", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--synth-root", default="/tmp/irtpu_synth")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir or torch .pth for the model "
                        "(random init without it — noisy deltas)")
    args = p.parse_args(argv)

    from image_retrieval_for_image_based_localization_tpu.benchmarks import (
        measure_bucketing_delta,
    )

    variables = _load_variables(args, None)
    res = measure_bucketing_delta(
        arch=args.arch, image_size=args.image_size,
        batch_size=args.batch_size, synth_root=args.synth_root,
        variables=variables,
    )
    print(res)


def cmd_build_index(argv):
    p = argparse.ArgumentParser(prog="build-index")
    p.add_argument("--descriptors", required=True, help=".npy [N, D] file")
    p.add_argument("--out", required=True, help="output index .npz")
    p.add_argument("--whitening", default="pca", choices=["pca", "lw", "none"])
    p.add_argument("--whiten-dims", type=int, default=None)
    p.add_argument("--whitening-file", default=None,
                   help="npz with pre-learned m/P (e.g. training's "
                        "whitening.npz) applied instead of learning")
    p.add_argument("--dba", type=int, default=0, metavar="NQE",
                   help="database-side augmentation neighbor count "
                        "(0 = off); beyond-reference mAP booster")
    p.add_argument("--dba-alpha", type=float, default=3.0)
    p.add_argument("--ivf", type=int, default=None, nargs="?", const=0,
                   metavar="C",
                   help="ALSO build an IVF coarse quantizer with C "
                        "partitions (bare --ivf = auto sqrt(N)) and save "
                        "it next to the index as <out>.ivf.npz "
                        "(approximate search for huge galleries)")
    p.add_argument("--ivf-dtype", default="f32",
                   choices=("f32", "bf16", "int8"),
                   help="IVF partition storage: bf16 halves / int8 "
                        "quarters per-probe HBM traffic")
    p.add_argument("--pq", type=int, default=None, nargs="?", const=0,
                   metavar="M",
                   help="ALSO build a product-quantized gallery with M "
                        "code bytes/row (bare --pq = auto D/32, 128x "
                        "compression); combined with --ivf (f32) this "
                        "becomes an IVF-PQ residual index "
                        "(<out>.ivfpq.npz), alone a flat ADC index "
                        "(<out>.pq.npz)")
    p.add_argument("--external-gallery", action="store_true",
                   help="store the gallery as an uncompressed "
                        "<out>.gallery.npy sidecar, loaded back "
                        "memory-mapped (the 1M-row/8GB shape: no "
                        "decompress-into-RAM on load)")
    p.add_argument("--opq", type=int, default=0, metavar="ITERS",
                   help="with --pq: learn an OPQ rotation with this many "
                        "alternation iterations before encoding (better "
                        "codebook fit, identical search cost; with --ivf "
                        "the rotation is learned over residuals)")
    args = p.parse_args(argv)

    from image_retrieval_for_image_based_localization_tpu.retrieval.index import Index
    from image_retrieval_for_image_based_localization_tpu.utils.config import IndexConfig

    descs = np.load(args.descriptors)
    wh = None if args.whitening == "none" else args.whitening
    whitening_mP = None
    if args.whitening_file:
        z = np.load(args.whitening_file)
        whitening_mP = (z["m"], z["P"])
    elif wh == "lw":
        p.error("lw whitening needs matching pairs; pass the training "
                "loop's saved whitening via --whitening-file, or use "
                "Index.build(pairs=...) directly")
    index = Index.build(
        descs,
        IndexConfig(whitening=wh, whiten_dims=args.whiten_dims,
                    dba_nqe=args.dba, dba_alpha=args.dba_alpha),
        whitening_mP=whitening_mP,
    )
    index.save(args.out, external_gallery=args.external_gallery)
    print(f"built index over {descs.shape} -> {args.out}")
    ivf = None
    if args.ivf is not None:
        from image_retrieval_for_image_based_localization_tpu.retrieval.ivf import (
            IVFIndex,
        )

        ivf = IVFIndex.build(index.gallery,
                             n_clusters=args.ivf or None,
                             dtype=args.ivf_dtype)
        ivf_path = args.out.removesuffix(".npz") + ".ivf.npz"
        ivf.save(ivf_path)
        print(f"built IVF quantizer: C={ivf.centroids.shape[0]} "
              f"pad_ratio={ivf.pad_ratio:.2f} -> {ivf_path}")
    if args.pq is not None:
        from image_retrieval_for_image_based_localization_tpu.retrieval.pq import (
            IVFPQIndex, PQIndex,
        )

        if ivf is not None:
            if args.ivf_dtype != "f32":
                p.error("--pq with --ivf needs --ivf-dtype f32 "
                        "(residuals of quantized rows double-compress)")
            pq = IVFPQIndex.from_ivf(ivf, m=args.pq or None,
                                     opq_iters=args.opq)
            pq_path = args.out.removesuffix(".npz") + ".ivfpq.npz"
        else:
            pq = PQIndex.build(index.gallery, m=args.pq or None,
                               opq_iters=args.opq)
            pq_path = args.out.removesuffix(".npz") + ".pq.npz"
        pq.save(pq_path)
        M = pq.codebooks.shape[0]
        D = index.gallery.shape[1]
        print(f"built PQ codes: M={M} ({D * 4 / M:.0f}x compression) "
              f"-> {pq_path}")


def cmd_query(argv):
    p = argparse.ArgumentParser(prog="query")
    p.add_argument("--index", required=True, help="index .npz from build-index")
    p.add_argument("--queries", required=True, help=".npy [Nq, D] query descriptors")
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--sharded", action="store_true")
    p.add_argument("--qe", type=int, default=0, metavar="NQE",
                   help="alpha-query-expansion neighbor count (0 = off)")
    p.add_argument("--qe-alpha", type=float, default=3.0,
                   help="alphaQE weight exponent (0 = average QE)")
    p.add_argument("--ivf", default=None, metavar="IVF_NPZ",
                   help="IVF quantizer from build-index --ivf: "
                        "approximate probe search instead of exact")
    p.add_argument("--nprobe", type=int, default=8)
    p.add_argument("--pq", default=None, metavar="PQ_NPZ",
                   help="PQ artifact from build-index --pq (.pq.npz or "
                        ".ivfpq.npz, auto-detected): ADC search over the "
                        "compressed gallery")
    p.add_argument("--refine", type=int, default=0, metavar="R",
                   help="with --pq: exact-rescore the top-R ADC candidates "
                        "against the f32 gallery (0 = pure ADC scores)")
    p.add_argument("--approx", type=float, default=None, metavar="RECALL",
                   nargs="?", const=0.95,
                   help="full-precision scoring with TPU hardware "
                        "approximate selection (lax.approx_max_k) at this "
                        "per-element recall target (bare flag = 0.95); "
                        "needs no side artifact, unlike --ivf/--pq")
    p.add_argument("--out", default=None, help="optional .npz for scores/indices")
    args = p.parse_args(argv)

    from image_retrieval_for_image_based_localization_tpu.retrieval.index import Index

    if args.approx is not None and (args.pq or args.ivf or args.sharded):
        p.error("--approx is the single-device full-gallery selection knob "
                "(QE composes: expansion stays exact, the final selection "
                "is approximate); drop --ivf/--pq/--sharded")
    if args.qe and (args.pq or args.ivf):
        p.error("--qe re-ranks against the FULL gallery (exact path, same "
                "rule the serving endpoint applies); drop --ivf/--pq or "
                "drop --qe")

    index = Index.load(args.index)
    qd = np.load(args.queries)
    if args.pq:
        if args.ivf:
            p.error("--pq and --ivf are exclusive (an .ivfpq.npz artifact "
                    "already embeds its coarse quantizer)")
        from image_retrieval_for_image_based_localization_tpu.retrieval.pq import (
            IVFPQIndex,
            load_pq_artifact,
        )

        pq = load_pq_artifact(args.pq)
        qt = np.asarray(index.transform_queries(qd))
        kw = dict(k=args.k, refine=args.refine,
                  gallery=index.gallery if args.refine else None)
        if args.sharded:  # codes row-sharded over the gallery mesh axis
            if isinstance(pq, IVFPQIndex):
                p.error("--sharded --pq takes a flat .pq.npz artifact "
                        "(cluster-sharded approximate search is "
                        "--ivf --sharded)")
            from image_retrieval_for_image_based_localization_tpu.parallel.sharded_pq import (
                ShardedPQ,
            )

            pq = ShardedPQ(pq)
        elif isinstance(pq, IVFPQIndex):
            kw["nprobe"] = args.nprobe
        scores, idx = pq.search(qt, **kw)
    elif args.ivf:
        from image_retrieval_for_image_based_localization_tpu.retrieval.ivf import (
            IVFIndex,
        )

        ivf = IVFIndex.load(args.ivf)
        qt = index.transform_queries(qd)
        if args.sharded:  # cluster-sharded probe across the mesh
            from image_retrieval_for_image_based_localization_tpu.parallel.sharded_ivf import (
                ShardedIVF,
            )

            ivf = ShardedIVF(ivf)
        scores, idx = ivf.search(qt, k=args.k, nprobe=args.nprobe)
    elif args.sharded:
        from image_retrieval_for_image_based_localization_tpu.parallel.sharded_index import (
            ShardedIndex,
        )
        from image_retrieval_for_image_based_localization_tpu.retrieval.query_expansion import (
            expand_via_sharded,
        )

        sindex = ShardedIndex.from_index(index)
        if args.qe:
            qx = expand_via_sharded(sindex, index.gallery, qd, args.qe,
                                    alpha=args.qe_alpha)
            scores, idx = sindex.query(qx, k=args.k, pre_transformed=True)
        else:
            scores, idx = sindex.query(qd, k=args.k)
    else:
        scores, idx = index.query(
            qd, k=args.k, qe_nqe=args.qe, qe_alpha=args.qe_alpha,
            method="exact" if args.approx is None else "approx",
            recall_target=args.approx if args.approx is not None else 0.95)
    if args.out:
        np.savez(args.out, scores=scores, indices=idx)
        print(f"wrote {args.out}")
    for qi in range(min(len(idx), 10)):
        print(f"q{qi}: " + " ".join(f"{i}:{s:.4f}" for s, i in zip(scores[qi], idx[qi])))


def cmd_shortlist(argv):
    """Retrieval-as-localization hand-off: query images -> top-k shortlist
    pairs file for a downstream 6-DoF pose pipeline (the reference's actual
    purpose, SURVEY.md §1; hloc-style `<query> <db>` lines)."""
    p = argparse.ArgumentParser(prog="shortlist")
    _model_args(p)
    p.add_argument("--index", required=True, help="index .npz from build-index")
    p.add_argument("--images", nargs="+", required=True, help="query image paths")
    p.add_argument("-k", type=int, default=20)
    p.add_argument("--db-names", default=None,
                   help="optional text file, one db image name per line")
    p.add_argument("--out", required=True, help="pairs file to write")
    p.add_argument("--data-root", default="data",
                   help="cache root for --network checkpoint fetch")
    p.add_argument("--qe", type=int, default=0, metavar="NQE",
                   help="alphaQE expansion before the shortlist cut")
    p.add_argument("--qe-alpha", type=float, default=3.0)
    p.add_argument("--diffusion", action="store_true",
                   help="diffusion re-ranking before the shortlist cut")
    args = p.parse_args(argv)

    from image_retrieval_for_image_based_localization_tpu.api import Extractor
    from image_retrieval_for_image_based_localization_tpu.localization import (
        localize_shortlist,
    )
    from image_retrieval_for_image_based_localization_tpu.retrieval.index import Index

    index = Index.load(args.index)
    net_vars, _ = _resolve_network(args)
    cfg = _build_extract_cfg(args)
    ex = Extractor(cfg)
    variables = _load_variables(args, ex.model) or net_vars
    if variables is not None:
        ex = Extractor(cfg, variables=variables)
    qd = ex.extract(args.images)
    db_names = None
    if args.db_names:
        db_names = [l.strip() for l in open(args.db_names) if l.strip()]
    import os as _os

    qnames = [_os.path.basename(p) for p in args.images]
    pairs, _ = localize_shortlist(
        index, qd, qnames, db_names=db_names, k=args.k, out_path=args.out,
        qe_nqe=args.qe, qe_alpha=args.qe_alpha, diffusion=args.diffusion,
    )
    print(f"wrote {len(pairs)} pairs ({len(qnames)} queries x k={args.k}) "
          f"to {args.out}")


def cmd_config(argv):
    p = argparse.ArgumentParser(prog="config")
    p.add_argument("n", type=int, choices=[1, 2, 3, 4, 5],
                   help="graded benchmark config (BASELINE.json)")
    p.add_argument("--data-root", default="/tmp/irtpu_data")
    p.add_argument("--synth-root", default="/tmp/irtpu_synth")
    p.add_argument("--log", default=None,
                   help="JSONL path for the run's metrics (evidence pack)")
    p.add_argument("--out-dir", default=None,
                   help="config 5: directory for the mmap index artifact + "
                        "localization pairs file")
    args = p.parse_args(argv)

    from image_retrieval_for_image_based_localization_tpu.benchmarks import (
        run_graded_config,
    )
    from image_retrieval_for_image_based_localization_tpu.utils.metrics import (
        MetricsLogger,
    )

    logger = MetricsLogger(path=args.log, echo=True) if args.log else None
    run_graded_config(args.n, data_root=args.data_root,
                      synth_root=args.synth_root, logger=logger,
                      out_dir=args.out_dir)


def cmd_fullsystem(argv):
    p = argparse.ArgumentParser(
        prog="fullsystem",
        description="disk JPEG -> decode -> device -> descriptor throughput "
                    "harness (decode-alone rates per thread count recorded)",
    )
    p.add_argument("--n-images", type=int, default=64)
    p.add_argument("--image-size", type=int, default=1024)
    p.add_argument("--arch", default="resnet50")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--root", default="/tmp/irtpu_fullsys")
    args = p.parse_args(argv)

    import json

    from image_retrieval_for_image_based_localization_tpu.benchmarks import (
        run_full_system_bench,
    )

    res = run_full_system_bench(
        n_images=args.n_images, image_size=args.image_size, arch=args.arch,
        batch_size=args.batch_size, root=args.root,
    )
    print(json.dumps(res))


def cmd_serve(argv):
    """Long-lived serving process: gallery HBM-resident, model compiled
    once, JSON-over-HTTP query/extract endpoints (``serving.py``)."""
    p = argparse.ArgumentParser(prog="serve")
    _model_args(p)
    p.add_argument("--index", required=True, help="index .npz from build-index")
    p.add_argument("--db-names", default=None,
                   help="optional text file, one db image name per line")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7878)
    p.add_argument("--no-model", action="store_true",
                   help="serve /query only (skip loading the extractor)")
    p.add_argument("--data-root", default="data",
                   help="cache root for --network checkpoint fetch")
    p.add_argument("--ivf", default=None, metavar="IVF_NPZ",
                   help="IVF quantizer from build-index --ivf: serve "
                        "approximate probe search by default (per-request "
                        "exact=1 still forces exact)")
    p.add_argument("--nprobe", type=int, default=8,
                   help="default partitions probed per IVF(-PQ) query")
    p.add_argument("--pq", default=None, metavar="PQ_NPZ",
                   help="PQ artifact from build-index --pq (.pq.npz or "
                        ".ivfpq.npz): serve ADC search over the compressed "
                        "gallery (exclusive with --ivf; per-request exact=1 "
                        "still forces exact)")
    p.add_argument("--refine", type=int, default=0, metavar="R",
                   help="default exact-rescore depth for --pq queries")
    p.add_argument("--batch-window-ms", type=float, default=0.0,
                   help="micro-batching: coalesce concurrent plain queries "
                        "arriving within this window into one device "
                        "dispatch (0 = off)")
    p.add_argument("--max-batch", type=int, default=64,
                   help="micro-batching cap per dispatch")
    p.add_argument("--max-inflight", type=int, default=64,
                   help="admission cap: requests concurrently inside the "
                        "service (waiting + executing); excess get 503 + "
                        "Retry-After instead of queueing (0 = unlimited)")
    p.add_argument("--request-timeout-s", type=float, default=30.0,
                   help="max seconds a request may WAIT for device access "
                        "(lock / batch queue) before 504")
    args = p.parse_args(argv)
    if args.pq and args.ivf:
        p.error("--pq and --ivf are exclusive (an .ivfpq.npz artifact "
                "already embeds its coarse quantizer)")

    from image_retrieval_for_image_based_localization_tpu.retrieval.index import Index
    from image_retrieval_for_image_based_localization_tpu.serving import serve

    index = Index.load(args.index)
    ex = None
    if not args.no_model:
        from image_retrieval_for_image_based_localization_tpu.api import Extractor

        net_vars, _ = _resolve_network(args)
        cfg = _build_extract_cfg(args)
        ex = Extractor(cfg)
        variables = _load_variables(args, ex.model) or net_vars
        if variables is not None:
            ex = Extractor(cfg, variables=variables)
    db_names = None
    if args.db_names:
        db_names = [l.strip() for l in open(args.db_names) if l.strip()]
    ivf = None
    if args.ivf:
        from image_retrieval_for_image_based_localization_tpu.retrieval.ivf import (
            IVFIndex,
        )

        ivf = IVFIndex.load(args.ivf)
    pq = None
    if args.pq:
        from image_retrieval_for_image_based_localization_tpu.retrieval.pq import (
            load_pq_artifact,
        )

        pq = load_pq_artifact(args.pq)
    serve(index, extractor=ex, db_names=db_names,
          host=args.host, port=args.port, ivf=ivf, nprobe=args.nprobe,
          pq=pq, refine=args.refine,
          batch_window_ms=args.batch_window_ms, max_batch=args.max_batch,
          max_inflight=args.max_inflight,
          request_timeout_s=args.request_timeout_s,
          reload_paths={"index": args.index, "ivf": args.ivf,
                        "pq": args.pq, "db_names": args.db_names})


def cmd_download(argv):
    p = argparse.ArgumentParser(
        prog="download",
        description="verify-or-fetch datasets / pretrained networks "
                    "(reference utils/download.py semantics; set "
                    "IRTPU_OFFLINE=1 to only verify)",
    )
    p.add_argument("names", nargs="+",
                   help="dataset names (roxford5k, rparis6k, oxford5k, "
                        "paris6k, retrieval-SfM-120k) or zoo network names")
    p.add_argument("--data-root", default="data")
    args = p.parse_args(argv)

    from image_retrieval_for_image_based_localization_tpu.data.download import (
        TEST_MANIFESTS,
        TRAIN_MANIFESTS,
        ZOO_MANIFESTS,
        download_network,
        download_test,
        download_train,
    )

    for name in args.names:
        if name in TEST_MANIFESTS:
            download_test(args.data_root, name)
        elif name in TRAIN_MANIFESTS:
            download_train(args.data_root, name)
        elif name in ZOO_MANIFESTS:
            download_network(args.data_root, name)
        else:
            raise SystemExit(
                f"unknown artifact '{name}'; known: "
                f"{sorted([*TEST_MANIFESTS, *TRAIN_MANIFESTS, *ZOO_MANIFESTS])}"
            )
        print(f"{name}: present under {args.data_root}")


def cmd_bench_ann(argv):
    """Recall-vs-QPS sweep across the search family (exact / IVF / PQ /
    OPQ / IVF-PQ) on a clustered synthetic corpus — the deployment-tuning
    table for picking an operating point."""
    p = argparse.ArgumentParser(prog="bench-ann")
    p.add_argument("-n", type=int, default=20_000, help="gallery rows")
    p.add_argument("-d", type=int, default=256, help="descriptor dim")
    p.add_argument("--nq", type=int, default=256)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--clusters", type=int, default=None)
    p.add_argument("-m", type=int, default=None, help="PQ code bytes/row")
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args(argv)

    from image_retrieval_for_image_based_localization_tpu.benchmarks import (
        run_ann_bench,
    )

    out = run_ann_bench(n=args.n, d=args.d, nq=args.nq, k=args.k,
                        n_clusters=args.clusters, m=args.m, reps=args.reps)
    w = max(len(s) for s in out)
    print(f"{'method':{w}s}  recall@{args.k:<3d} qps")
    for name, row in out.items():
        print(f"{name:{w}s}  {row['recall_at_k']:8.4f}  {row['qps']:10.1f}")


def cmd_bench_serve(argv):
    """Closed-loop load test of the serving endpoint: QPS + client latency
    percentiles, unbatched vs micro-batched, on one in-process server."""
    p = argparse.ArgumentParser(prog="bench-serve")
    p.add_argument("-n", type=int, default=10_000, help="gallery rows")
    p.add_argument("-d", type=int, default=256)
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--requests", type=int, default=200)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--batch-window-ms", type=float, default=5.0)
    args = p.parse_args(argv)

    from image_retrieval_for_image_based_localization_tpu.benchmarks import (
        run_serving_bench,
    )

    out = run_serving_bench(
        n=args.n, d=args.d, concurrency=args.concurrency,
        requests=args.requests, k=args.k,
        batch_window_ms=args.batch_window_ms)
    for mode in ("unbatched", "batched"):
        r = out[mode]
        print(f"{mode:10s} qps={r['qps']:8.1f}  p50={r['lat_p50_ms']:7.2f}ms"
              f"  p95={r['lat_p95_ms']:7.2f}ms  p99={r['lat_p99_ms']:7.2f}ms")
    print(f"micro-batching qps ratio: {out['speedup']['qps_ratio']}x")


def cmd_bench_train(argv):
    """Training-step throughput (tuples/sec, images/sec) through the
    production fused train step at reference training geometry."""
    p = argparse.ArgumentParser(prog="bench-train")
    p.add_argument("--arch", default="resnet50")
    p.add_argument("--pooling", default="gem")
    p.add_argument("--image-size", type=int, default=362)
    p.add_argument("--batch-tuples", type=int, default=5)
    p.add_argument("--n-neg", type=int, default=5)
    p.add_argument("--loss", default="contrastive",
                   choices=("contrastive", "triplet"))
    p.add_argument("--remat", action="store_true")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--reps", type=int, default=10)
    args = p.parse_args(argv)

    from image_retrieval_for_image_based_localization_tpu.benchmarks import (
        run_training_bench,
    )

    out = run_training_bench(
        arch=args.arch, pooling=args.pooling, image_size=args.image_size,
        batch_tuples=args.batch_tuples, n_neg=args.n_neg, loss=args.loss,
        remat=args.remat, dtype=args.dtype, reps=args.reps)
    print(f"{out['arch']}+{out['pooling']} @{out['image_size']}px "
          f"b{out['batch_tuples']}x{2 + out['n_neg']} remat={out['remat']} "
          f"dtype={out['dtype']}")
    print(f"tuples/s={out['tuples_per_sec']:.2f}  "
          f"images/s={out['images_per_sec']:.2f}  "
          f"step p50={out['lat_p50_ms']:.1f}ms p95={out['lat_p95_ms']:.1f}ms")


COMMANDS = {
    "download": cmd_download,
    "extract": cmd_extract,
    "fullsystem": cmd_fullsystem,
    "bench-ann": cmd_bench_ann,
    "bench-serve": cmd_bench_serve,
    "bench-train": cmd_bench_train,
    "evaluate": cmd_evaluate,
    "train": cmd_train,
    "synth": cmd_synth,
    "config": cmd_config,
    "parity": cmd_parity,
    "build-index": cmd_build_index,
    "query": cmd_query,
    "serve": cmd_serve,
    "shortlist": cmd_shortlist,
}


def main(argv=None):
    # Honor an explicitly-set JAX_PLATFORMS even when a sitecustomize has
    # already pinned jax_platforms (e.g. a managed host that force-registers
    # its accelerator backend): the user's env request wins.
    import os

    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax

        if jax.config.jax_platforms != plats:
            jax.config.update("jax_platforms", plats)

    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in COMMANDS:
        print(f"usage: ... {{{'|'.join(COMMANDS)}}} [args]", file=sys.stderr)
        return 2
    return COMMANDS[argv[0]](argv[1:]) or 0


if __name__ == "__main__":
    sys.exit(main())
