"""Retrieval-as-coarse-localization output.

The reference's purpose (its title, SURVEY.md §1): retrieval produces the
top-k database images per query, which a downstream 6-DoF pose pipeline
(Aachen-style) consumes. This module emits that hand-off artifact in the
standard visual-localization "pairs" text format::

    <query_name> <db_name>
    ...

one line per (query, retrieved) pair, queries in order, k lines each — the
format structure-from-motion localizers (hloc and kin) ingest.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def retrieval_pairs(
    query_names: Sequence[str],
    db_names: Sequence[str],
    indices: np.ndarray,
) -> list[Tuple[str, str]]:
    """Flatten a top-k index matrix [Nq, k] into (query, db) name pairs."""
    pairs = []
    for qi, row in enumerate(indices):
        for db_i in row:
            pairs.append((query_names[qi], db_names[int(db_i)]))
    return pairs


def write_pairs_file(
    path: str,
    query_names: Sequence[str],
    db_names: Sequence[str],
    indices: np.ndarray,
) -> str:
    """Write the localization shortlist; returns the path."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for q, d in retrieval_pairs(query_names, db_names, indices):
            f.write(f"{q} {d}\n")
    return path


def localize_shortlist(
    index,
    qdescriptors: np.ndarray,
    query_names: Sequence[str],
    db_names: Optional[Sequence[str]] = None,
    k: int = 20,
    out_path: Optional[str] = None,
    qe_nqe: int = 0,
    qe_alpha: float = 3.0,
    diffusion: bool = False,
):
    """End-to-end: query the index, return (pairs, scores); optionally write
    the pairs file. ``db_names`` defaults to the index's stored ids.

    ``qe_nqe``/``diffusion`` apply the re-ranking family before the top-k
    cut — a better shortlist costs the pose pipeline nothing downstream.
    """
    if diffusion:
        ranks = index.diffusion_ranks(qdescriptors, qe_nqe=qe_nqe,
                                      qe_alpha=qe_alpha)
        idx = ranks[:k].T  # [Nq, k]
        scores = None
    else:
        scores, idx = index.query(qdescriptors, k=k,
                                  qe_nqe=qe_nqe, qe_alpha=qe_alpha)
    if db_names is None:
        if index.ids is None:
            db_names = [str(i) for i in range(index.gallery.shape[0])]
        else:
            db_names = [str(i) for i in index.ids]
    pairs = retrieval_pairs(query_names, db_names, idx)
    if out_path:
        write_pairs_file(out_path, query_names, db_names, idx)
    return pairs, scores
