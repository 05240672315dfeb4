"""Model zoo and checkpoint-meta factory.

The reference rebuilds its net from the checkpoint ``meta`` dict
(``init_network(meta)``, SURVEY.md §3.1) and ships a pretrained-model zoo as
regression anchors (SURVEY.md §4). Offline equivalent: named presets that
pair a ModelConfig with an optional local checkpoint path (torch ``.pth``
state_dicts port through ``models.torch_port``; orbax dirs load directly).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from image_retrieval_for_image_based_localization_tpu.models.retrieval_net import (
    RetrievalNet,
)
from image_retrieval_for_image_based_localization_tpu.utils.config import ModelConfig

# Named presets mirroring the cirtorch-lineage zoo the reference derives from.
MODEL_ZOO: Dict[str, ModelConfig] = {
    "resnet18-gem": ModelConfig(arch="resnet18", pooling="gem"),
    "resnet50-gem": ModelConfig(arch="resnet50", pooling="gem"),
    "resnet101-gem": ModelConfig(arch="resnet101", pooling="gem"),
    "resnet101-gem-whiten": ModelConfig(arch="resnet101", pooling="gem", whiten_dim=2048),
    "vgg16-gem": ModelConfig(arch="vgg16", pooling="gem"),
    "vgg16-mac": ModelConfig(arch="vgg16", pooling="mac"),
    "vgg16-rmac": ModelConfig(arch="vgg16", pooling="rmac"),
    "vgg16-netvlad64": ModelConfig(arch="vgg16", pooling="netvlad", netvlad_clusters=64),
    "alexnet-gem": ModelConfig(arch="alexnet", pooling="gem"),
    "alexnet-mac": ModelConfig(arch="alexnet", pooling="mac"),
    "squeezenet1_1-gem": ModelConfig(arch="squeezenet1_1", pooling="gem"),
    "densenet121-gem": ModelConfig(arch="densenet121", pooling="gem"),
}


def model_to_meta(model: RetrievalNet) -> Dict[str, Any]:
    """Serializable hyperparameter dict (the checkpoint 'meta' contract)."""
    return {
        "arch": model.arch,
        "pooling": model.pooling,
        "whiten_dim": model.whiten_dim,
        "netvlad_clusters": model.netvlad_clusters,
        "gem_p": model.gem_p,
    }


def create_model_from_meta(meta: Dict[str, Any], **overrides) -> RetrievalNet:
    """Rebuild a RetrievalNet from a checkpoint meta dict."""
    kw = dict(
        arch=meta.get("arch", "resnet50"),
        pooling=meta.get("pooling", "gem"),
        regional=bool(meta.get("regional", False)),
        whiten_dim=meta.get("whiten_dim"),
        netvlad_clusters=meta.get("netvlad_clusters", 64),
        gem_p=meta.get("gem_p", 3.0),
    )
    kw.update(overrides)
    return RetrievalNet(**kw)


def create_model_from_zoo(name: str, **overrides) -> RetrievalNet:
    if name not in MODEL_ZOO:
        raise KeyError(f"unknown zoo model {name!r}; have {sorted(MODEL_ZOO)}")
    mc = MODEL_ZOO[name]
    kw = dict(
        arch=mc.arch,
        pooling=mc.pooling,
        whiten_dim=mc.whiten_dim,
        netvlad_clusters=mc.netvlad_clusters,
        gem_p=mc.gem_p,
    )
    kw.update(overrides)
    return RetrievalNet(**kw)


def load_model(
    name_or_meta,
    checkpoint: Optional[str] = None,
    arch_hint: Optional[str] = None,
):
    """(model, variables|None) from a zoo name or meta dict (+ checkpoint).

    ``checkpoint`` may be a torch ``.pth``/``.pt`` state_dict file or an
    orbax checkpoint directory saved by ``utils.checkpoint``.
    """
    if isinstance(name_or_meta, str):
        model = create_model_from_zoo(name_or_meta)
    else:
        model = create_model_from_meta(name_or_meta)

    variables = None
    if checkpoint:
        if checkpoint.endswith((".pth", ".pt")):
            import torch

            from image_retrieval_for_image_based_localization_tpu.models.torch_port import (
                port_retrieval_net,
            )

            sd = torch.load(checkpoint, map_location="cpu", weights_only=False)
            sd = sd.get("state_dict", sd)
            variables = port_retrieval_net(sd, arch_hint or model.arch)
        else:
            from image_retrieval_for_image_based_localization_tpu.utils.checkpoint import (
                load_checkpoint,
            )

            tree, meta = load_checkpoint(checkpoint, name="best")
            variables = {
                "params": tree["params"],
                "batch_stats": tree.get("batch_stats", {}),
            }
    return model, variables


def meta_from_cirtorch(meta: Dict[str, Any]) -> Dict[str, Any]:
    """cirtorch checkpoint ``meta`` dict -> this framework's meta contract.

    cirtorch stores {'architecture', 'pooling', 'whitening'(bool),
    'outputdim', 'mean', 'std', 'regional', optionally 'Lw'}; the pooling
    field may itself be a dict for NetVLAD variants.
    """
    arch = meta.get("architecture", meta.get("arch", "resnet101"))
    pooling = meta.get("pooling", "gem")
    clusters = None
    if isinstance(pooling, dict):  # older layouts: {'name': ..., ...}
        clusters = pooling.get("clusters", pooling.get("num_clusters"))
        pooling = pooling.get("name", "gem")
    out: Dict[str, Any] = {"arch": arch, "pooling": pooling}
    if clusters is not None:
        out["netvlad_clusters"] = int(clusters)
    if meta.get("whitening"):
        out["whiten_dim"] = int(meta.get("outputdim", 0)) or None
    return out


def cirtorch_Lw(
    meta: Dict[str, Any],
    dataset: str = "retrieval-SfM-120k",
    scale: str = "ss",
):
    """Extract pre-learned supervised whitening (m, P) from a cirtorch
    checkpoint's ``meta['Lw']``, reference test-time semantics: applied to
    descriptors at eval (``Index.build(..., whitening_mP=...)``). Returns
    None when the checkpoint carries no Lw.

    Real cirtorch zoo checkpoints nest one more level than {'m','P'}:
    ``meta['Lw'][dataset]['ss'|'ms']`` for single- vs multi-scale
    extraction (cirtorch test.py reads ``net.meta['Lw'][whitening][
    'ms' if multiscale else 'ss']``); ``scale`` picks that level, falling
    back to whichever is present, and flat {'m','P'} entries still work.
    """
    import numpy as np

    lw = meta.get("Lw") or {}
    entry = lw.get(dataset) if isinstance(lw, dict) else None
    if entry is None and isinstance(lw, dict) and lw:
        entry = next(iter(lw.values()))  # any dataset's Lw
    if isinstance(entry, dict) and not ("m" in entry and "P" in entry):
        # the ss/ms nesting level
        entry = entry.get(scale) or entry.get("ss") or entry.get("ms")
    if not isinstance(entry, dict) or "m" not in entry or "P" not in entry:
        return None
    m = np.asarray(entry["m"], dtype=np.float64).reshape(-1)
    P = np.asarray(entry["P"], dtype=np.float64)
    return m, P


def _torch_load_untrusted(path: str):
    """torch.load for downloaded checkpoints: try the restricted
    ``weights_only`` unpickler first (cirtorch metas carry numpy arrays, so
    allowlist numpy reconstruction); only fall back to the full pickle VM
    with a loud warning — a spoofed download must not get silent code
    execution (zoo URLs have no recordable sha pins from this zero-egress
    rig)."""
    import torch

    try:
        import numpy as np

        allow = [np.ndarray, np.dtype]
        for mod in ("numpy.core.multiarray", "numpy._core.multiarray"):
            try:
                import importlib

                allow.append(importlib.import_module(mod)._reconstruct)
            except (ImportError, AttributeError):
                pass
        allow += [type(np.dtype(t)) for t in ("float32", "float64", "int64")]
        with torch.serialization.safe_globals(allow):
            return torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:  # noqa: BLE001 - any unpickler rejection
        import warnings

        warnings.warn(
            f"restricted unpickle of {path} failed ({type(e).__name__}: {e}); "
            "falling back to weights_only=False — only do this for "
            "checkpoints you trust",
            stacklevel=2,
        )
        return torch.load(path, map_location="cpu", weights_only=False)


def load_pretrained(
    name: str,
    data_root: str = "data",
    whitening_dataset: str = "retrieval-SfM-120k",
    whitening_scale: str = "ss",
    zoo_manifests=None,
):
    """Fetch (or verify on disk) a pretrained zoo checkpoint and port it.

    The reference's `init_network(pretrained-name)` + download flow in one
    call: ``data.download.download_network`` resolves/downloads the ``.pth``,
    the cirtorch ``meta`` dict rebuilds the model, the ``state_dict`` ports
    to Flax variables, and any pre-learned Lw whitening comes back as
    ``(m, P)`` ready for ``retrieval.index.Index.build(whitening_mP=...)``.

    ``whitening_scale``: 'ss' or 'ms' — which of the checkpoint's
    single-/multi-scale Lw variants to use (cirtorch picks by whether
    extraction is multiscale).

    Returns ``(model, variables, whitening_mP_or_None)``.
    """
    from image_retrieval_for_image_based_localization_tpu.data.download import (
        download_network,
    )
    from image_retrieval_for_image_based_localization_tpu.models.torch_port import (
        port_retrieval_net,
    )

    path = download_network(data_root, name, manifests=zoo_manifests)
    ckpt = _torch_load_untrusted(path)
    meta = ckpt.get("meta", {}) if isinstance(ckpt, dict) else {}
    sd = ckpt.get("state_dict", ckpt)
    model = create_model_from_meta(meta_from_cirtorch(meta))
    variables = port_retrieval_net(sd, model.arch)
    return model, variables, cirtorch_Lw(meta, whitening_dataset,
                                         scale=whitening_scale)
