"""Mean-average-precision evaluation with revisited Oxford/Paris protocols.

Reimplements the reference's `utils/evaluate.py` semantics (SURVEY.md §2/§3.1;
reference mount empty — semantics from the cirtorch / "Revisiting Oxford and
Paris" (Radenović et al., CVPR 2018) lineage it derives from):

  * ``compute_ap``: trapezoidal AP from 0-based ranks of positives.
  * ``compute_map``: junk images are removed from the ranking (positions of
    positives are shifted up past preceding junk), per-query AP averaged over
    non-empty queries, plus mP@k.
  * Revisited protocols: Easy (ok=easy, junk=junk+hard), Medium
    (ok=easy+hard, junk=junk), Hard (ok=hard, junk=junk+easy).

Host-side NumPy: evaluation is cheap and irregular (per-query variable-length
junk lists); the device side ends at the ranks matrix.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def compute_ap(ranks: np.ndarray, nres: int) -> float:
    """AP from 0-based ranks (ascending) of positive images; ``nres`` = #positives."""
    nimgranks = len(ranks)
    ap = 0.0
    recall_step = 1.0 / nres
    for j in range(nimgranks):
        rank = ranks[j]
        precision_0 = 1.0 if rank == 0 else float(j) / rank
        precision_1 = float(j + 1) / (rank + 1)
        ap += (precision_0 + precision_1) * recall_step / 2.0
    return ap


def _ap_pr_from_positions(
    pos: np.ndarray, junk: np.ndarray, nres: int, kappas: Sequence[int]
) -> Tuple[float, np.ndarray]:
    """(AP, P@kappas) from ascending 0-based rank positions of positives
    (``pos``) and junk (``junk``); ``nres`` = #positives. Junk positions are
    shifted out of the ranking exactly as the reference does."""
    pos = np.asarray(pos, np.int64).copy()
    junk = np.asarray(junk, np.int64)
    k = 0
    ij = 0
    if len(junk):
        ip = 0
        while ip < len(pos):
            while ij < len(junk) and pos[ip] > junk[ij]:
                k += 1
                ij += 1
            pos[ip] = pos[ip] - k
            ip += 1

    ap = compute_ap(pos, nres)

    pos_1 = pos + 1  # 1-based for precision@k
    prs = np.zeros(len(kappas))
    for j, kappa in enumerate(kappas):
        kq = min(max(pos_1), kappa) if len(pos_1) else kappa
        prs[j] = (pos_1 <= kq).sum() / kq
    return ap, prs


def compute_map(
    ranks: np.ndarray,
    gnd: Sequence[Dict[str, np.ndarray]],
    kappas: Sequence[int] = (),
) -> Tuple[float, np.ndarray, np.ndarray, np.ndarray]:
    """mAP over queries with junk-image filtering.

    Args:
      ranks: ``[n_db, n_q]`` — ranks[r, q] is the db index at rank r for query q.
      gnd: per-query dicts with 'ok' (positive db indices) and optional 'junk'.
      kappas: precision@k cutoffs.

    Returns: (map, aps[nq], pr[len(kappas)], prs[nq, len(kappas)]).
    """
    nq = len(gnd)
    aps = np.zeros(nq)
    pr = np.zeros(len(kappas))
    prs = np.zeros((nq, len(kappas)))
    nempty = 0
    map_ = 0.0

    for i in range(nq):
        qgnd = np.array(gnd[i]["ok"])
        if qgnd.shape[0] == 0:
            aps[i] = float("nan")
            prs[i, :] = float("nan")
            nempty += 1
            continue
        qgndj = np.array(gnd[i].get("junk", []))

        pos = np.arange(ranks.shape[0])[np.isin(ranks[:, i], qgnd)]
        junk = np.arange(ranks.shape[0])[np.isin(ranks[:, i], qgndj)]

        ap, prs[i, :] = _ap_pr_from_positions(pos, junk, len(qgnd), kappas)
        map_ += ap
        aps[i] = ap
        pr = pr + prs[i, :]

    denom = max(nq - nempty, 1)
    return map_ / denom, aps, pr / denom, prs


def compute_map_streaming(
    candidate_ranks,
    gnd: Sequence[Dict[str, np.ndarray]],
    kappas: Sequence[int] = (),
) -> Tuple[float, np.ndarray, np.ndarray, np.ndarray]:
    """mAP from per-candidate global ranks — the scale-correct eval path.

    Instead of a full ``[n_db, n_q]`` rank matrix (which needs the whole
    score matrix on host), this consumes ``candidate_ranks[i]``: a dict with
    'ok' and 'junk' arrays holding the *global rank position* of each of
    query i's positive/junk images (as produced by
    ``retrieval.knn.rank_candidates`` / ``ShardedIndex.rank_candidates``,
    streamed over gallery chunks on device). Identical results to
    ``compute_map`` on the full ranking by construction: rank positions are
    the only thing the AP computation reads.
    """
    nq = len(gnd)
    aps = np.zeros(nq)
    pr = np.zeros(len(kappas))
    prs = np.zeros((nq, len(kappas)))
    nempty = 0
    map_ = 0.0

    for i in range(nq):
        qgnd = np.array(gnd[i]["ok"])
        if qgnd.shape[0] == 0:
            aps[i] = float("nan")
            prs[i, :] = float("nan")
            nempty += 1
            continue
        pos = np.sort(np.asarray(candidate_ranks[i]["ok"], np.int64))
        junk = np.sort(np.asarray(candidate_ranks[i].get("junk", []), np.int64))

        ap, prs[i, :] = _ap_pr_from_positions(pos, junk, len(qgnd), kappas)
        map_ += ap
        aps[i] = ap
        pr = pr + prs[i, :]

    denom = max(nq - nempty, 1)
    return map_ / denom, aps, pr / denom, prs


def _protocol_gnd(gnd: Sequence[Dict], protocol: str) -> List[Dict[str, np.ndarray]]:
    out = []
    for g in gnd:
        easy = np.asarray(g.get("easy", []), dtype=np.int64)
        hard = np.asarray(g.get("hard", []), dtype=np.int64)
        junk = np.asarray(g.get("junk", []), dtype=np.int64)
        if protocol == "easy":
            out.append({"ok": easy, "junk": np.concatenate([junk, hard])})
        elif protocol == "medium":
            out.append({"ok": np.concatenate([easy, hard]), "junk": junk})
        elif protocol == "hard":
            out.append({"ok": hard, "junk": np.concatenate([junk, easy])})
        else:
            raise ValueError(f"unknown protocol {protocol!r}")
    return out


def compute_map_revisited(
    ranks: np.ndarray,
    gnd: Sequence[Dict],
    kappas: Sequence[int] = (1, 5, 10),
) -> Dict[str, Dict[str, np.ndarray | float]]:
    """mAP/mP@k under the Easy / Medium / Hard revisited protocols."""
    results = {}
    for protocol in ("easy", "medium", "hard"):
        pgnd = _protocol_gnd(gnd, protocol)
        map_, aps, pr, prs = compute_map(ranks, pgnd, kappas)
        results[protocol] = {"map": map_, "aps": aps, "mprk": pr, "prks": prs}
    return results


def candidate_matrix(gnd: Sequence[Dict]) -> np.ndarray:
    """Pack each query's ground-truth db indices into a padded ``[Nq, C]``
    int32 matrix for ``rank_candidates``: revisited gnd rows are laid out
    ``easy | hard | junk``, classic rows ``ok | junk`` (pad = index 0; pad
    outputs are sliced away by length downstream)."""
    lists = []
    for g in gnd:
        if "easy" in g or "hard" in g:
            parts = [g.get("easy", []), g.get("hard", []), g.get("junk", [])]
        else:
            parts = [g.get("ok", []), g.get("junk", [])]
        lists.append(np.concatenate([np.asarray(p, np.int64) for p in parts]))
    C = max([len(l) for l in lists] + [1])
    cand = np.zeros((len(gnd), C), np.int32)
    for i, l in enumerate(lists):
        cand[i, : len(l)] = l
    return cand


def compute_map_streaming_and_print(
    dataset: str,
    ranks_all: np.ndarray,
    gnd: Sequence[Dict],
    kappas: Sequence[int] = (1, 5, 10),
) -> Dict:
    """Streaming analog of ``compute_map_and_print``: consumes the
    ``[Nq, C]`` candidate-rank matrix produced by
    ``knn.rank_candidates``/``ShardedIndex.rank_candidates`` over the
    ``candidate_matrix(gnd)`` layout. Bitwise-identical mAP to the full-rank
    path (same AP math on the same rank positions)."""
    revisited = bool(gnd) and ("easy" in gnd[0] or "hard" in gnd[0])
    fmt = lambda v: np.around(np.asarray(v) * 100, decimals=2)  # noqa: E731
    if revisited:
        results = {}
        for protocol in ("easy", "medium", "hard"):
            cr = []
            for i, g in enumerate(gnd):
                ne = len(g.get("easy", []))
                nh = len(g.get("hard", []))
                nj = len(g.get("junk", []))
                r = ranks_all[i]
                re_, rh, rj = r[:ne], r[ne : ne + nh], r[ne + nh : ne + nh + nj]
                if protocol == "easy":
                    ok, junk = re_, np.concatenate([rj, rh])
                elif protocol == "medium":
                    ok, junk = np.concatenate([re_, rh]), rj
                else:
                    ok, junk = rh, np.concatenate([rj, re_])
                cr.append({"ok": ok, "junk": junk})
            pgnd = _protocol_gnd(gnd, protocol)
            map_, aps, pr, prs = compute_map_streaming(cr, pgnd, kappas)
            results[protocol] = {"map": map_, "aps": aps, "mprk": pr, "prks": prs}
        print(
            f">> {dataset}: mAP E: {fmt(results['easy']['map'])}, "
            f"M: {fmt(results['medium']['map'])}, H: {fmt(results['hard']['map'])}"
        )
        print(
            f">> {dataset}: mP@k{list(kappas)} E: {fmt(results['easy']['mprk'])}, "
            f"M: {fmt(results['medium']['mprk'])}, H: {fmt(results['hard']['mprk'])}"
        )
        return results
    cr = []
    for i, g in enumerate(gnd):
        nok = len(np.asarray(g["ok"]))
        nj = len(np.asarray(g.get("junk", [])))
        r = ranks_all[i]
        cr.append({"ok": r[:nok], "junk": r[nok : nok + nj]})
    cgnd = [
        {"ok": np.asarray(g["ok"]), "junk": np.asarray(g.get("junk", []))}
        for g in gnd
    ]
    map_, aps, pr, prs = compute_map_streaming(cr, cgnd, kappas)
    print(f">> {dataset}: mAP {np.around(map_ * 100, decimals=2)}")
    return {"map": map_, "aps": aps, "mprk": pr, "prks": prs}


def compute_map_and_print(
    dataset: str,
    ranks: np.ndarray,
    gnd: Sequence[Dict],
    kappas: Sequence[int] = (1, 5, 10),
) -> Dict:
    """Print mAP like the reference's test CLI; returns the results dict."""
    if gnd and ("easy" in gnd[0] or "hard" in gnd[0]):
        res = compute_map_revisited(ranks, gnd, kappas)
        fmt = lambda v: np.around(np.asarray(v) * 100, decimals=2)  # noqa: E731
        print(
            f">> {dataset}: mAP E: {fmt(res['easy']['map'])}, "
            f"M: {fmt(res['medium']['map'])}, H: {fmt(res['hard']['map'])}"
        )
        print(
            f">> {dataset}: mP@k{list(kappas)} E: {fmt(res['easy']['mprk'])}, "
            f"M: {fmt(res['medium']['mprk'])}, H: {fmt(res['hard']['mprk'])}"
        )
        return res
    map_, aps, pr, prs = compute_map(
        ranks, [{"ok": np.asarray(g["ok"]), "junk": np.asarray(g.get("junk", []))} for g in gnd], kappas
    )
    print(f">> {dataset}: mAP {np.around(map_ * 100, decimals=2)}")
    return {"map": map_, "aps": aps, "mprk": pr, "prks": prs}
