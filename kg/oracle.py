"""Single-process pure-Python oracle (SURVEY.md §5 "Golden end-to-end").

An INDEPENDENT re-implementation of the full pipeline semantics —
extraction rules R1/R2/R3, blocking-key linking with min-entity
disambiguation and deterministic minting, union-find canonicalization,
and the stoichiometry/order edge aggregation — sharing no code with the
Spark stages.  This plays the role of "the reference" for the P/R ≥ 0.95
triple contract (BASELINE.json): the reference repo itself has zero tests
(SURVEY.md §5), so correctness is defined by rule-equivalence against
this executable spec.

Everything operates on plain pandas DataFrames (the same parquet fixtures
the Spark pipeline reads).
"""

from __future__ import annotations

import re

import pandas as pd

_MENTION = re.compile(r"\[\[(.*?)\]\]")
# ASCII-whitespace blankness, byte-identical to kg.extract.ASCII_WS (the
# shared Java\s ∩ RE2\s ∩ explicit-Python rule — ADVICE r3)
_ASCII_WS = " \t\n\r\f\x0b"


def _norm(s: str) -> str:
    return " ".join(s.lower().split())


# ---------------------------------------------------------------------------
# Stage 1: extraction
# ---------------------------------------------------------------------------
def oracle_extract(transcripts: pd.DataFrame) -> list[tuple]:
    """→ [(conv_id, turn_idx, span_start, subj_surface, pred, obj_surface)]"""
    out: list[tuple] = []
    for conv_id, grp in transcripts.groupby("conv_id", sort=True):
        grp = grp.sort_values("turn_idx", kind="mergesort")
        prev_last = None
        for r in grp.itertuples(index=False):
            text = r.text or ""
            ms = [
                (m.start(), m.group(1))
                for m in _MENTION.finditer(text)
                if m.group(1).strip(_ASCII_WS)
            ]
            for i in range(len(ms) - 1):
                out.append(
                    (conv_id, int(r.turn_idx), ms[i][0], ms[i][1], "co_occurs_with", ms[i + 1][1])
                )
            if prev_last is not None and ms:
                pt, ps, psurf = prev_last
                out.append((conv_id, pt, ps, psurf, "followed_by", ms[0][1]))
            if r.role == "tool" and r.tool:
                for s, m in ms:
                    out.append(
                        (conv_id, int(r.turn_idx), s, m, "produced_by", "tool::" + r.tool)
                    )
            if ms:
                prev_last = (int(r.turn_idx), ms[-1][0], ms[-1][1])
    return out


# ---------------------------------------------------------------------------
# Stage 2: linking
# ---------------------------------------------------------------------------
def oracle_link_index(catalog: pd.DataFrame) -> dict[str, str]:
    idx: dict[str, str] = {}
    for r in catalog.itertuples(index=False):
        for a in r.aliases:
            k = _norm(a)
            if k not in idx or r.entity_id < idx[k]:
                idx[k] = r.entity_id
    return idx


def oracle_resolve(surface: str, idx: dict[str, str]) -> str:
    k = _norm(surface)
    if k in idx:
        return idx[k]
    if k.startswith("tool::"):
        return "tool:" + k[len("tool::"):]
    return "new:" + k


# ---------------------------------------------------------------------------
# Stage 3: union-find canonicalization
# ---------------------------------------------------------------------------
def oracle_components(alias_pairs: pd.DataFrame) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep lexicographic min as the root
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    for r in alias_pairs.itertuples(index=False):
        union(r.src, r.dst)
    return {x: find(x) for x in list(parent)}


# ---------------------------------------------------------------------------
# Stage 4: edge aggregation
# ---------------------------------------------------------------------------
_SYMMETRIC = {"co_occurs_with"}
_REVERSED = {"produced_by": "produces"}


# provenance wiring (TrackingObjects.java:64-85 analog): Person -author->
# InstanceEdit -created-> DBInfo, stoichiometry = order = 1, no conv_id.
PROVENANCE_EDGE_ROWS = [
    ("person:kg-importer", "edit:kg-pipeline", "author", 1, 1, None),
    ("edit:kg-pipeline", "dbinfo:kg-pipeline", "created", 1, 1, None),
]


def oracle_edges(
    transcripts: pd.DataFrame,
    catalog: pd.DataFrame,
    alias_pairs: pd.DataFrame,
) -> pd.DataFrame:
    """Full pipeline → edge table (src, dst, rel_type, stoichiometry, order),
    including the run's two provenance edges."""
    idx = oracle_link_index(catalog)
    comp = oracle_components(alias_pairs)
    raw = oracle_extract(transcripts)

    occ: list[tuple] = []
    for conv_id, turn_idx, span, subj_s, pred, obj_s in raw:
        s = comp.get(oracle_resolve(subj_s, idx), oracle_resolve(subj_s, idx))
        o = comp.get(oracle_resolve(obj_s, idx), oracle_resolve(obj_s, idx))
        if s == o:
            continue
        if pred in _REVERSED:
            s, o, pred = o, s, _REVERSED[pred]
        if pred in _SYMMETRIC and o < s:
            s, o = o, s
        occ.append((s, pred, o, (conv_id, turn_idx, span)))

    groups: dict[tuple, dict] = {}
    for s, p, o, key in occ:
        g = groups.setdefault((s, p, o), {"stoichiometry": 0, "first": key})
        g["stoichiometry"] += 1
        if key < g["first"]:
            g["first"] = key

    rows = []
    for (s, p, o), g in groups.items():
        rows.append((s, o, p, g["stoichiometry"], g["first"]))
    cols = ["src", "dst", "rel_type", "stoichiometry", "order", "conv_id"]
    prov = pd.DataFrame(PROVENANCE_EDGE_ROWS, columns=cols)
    df = pd.DataFrame(rows, columns=["src", "dst", "rel_type", "stoichiometry", "first_occ"])
    if df.empty:
        return prov
    df = df.sort_values(
        ["src", "rel_type", "first_occ", "dst"], kind="mergesort"
    ).reset_index(drop=True)
    df["order"] = df.groupby(["src", "rel_type"]).cumcount() + 1
    df["conv_id"] = df["first_occ"].map(lambda t: t[0])
    return pd.concat([df[cols], prov], ignore_index=True)


def oracle_triples(
    transcripts: pd.DataFrame,
    catalog: pd.DataFrame,
    alias_pairs: pd.DataFrame,
) -> set[tuple[str, str, str]]:
    """Distinct (subj, pred, obj) after canonicalization — the P/R unit."""
    e = oracle_edges(transcripts, catalog, alias_pairs)
    return set(zip(e["src"], e["rel_type"], e["dst"]))


def precision_recall(
    got: set[tuple], expected: set[tuple]
) -> tuple[float, float]:
    if not got or not expected:
        return (0.0, 0.0) if expected or got else (1.0, 1.0)
    tp = len(got & expected)
    return tp / len(got), tp / len(expected)


__all__ = [
    "oracle_extract",
    "oracle_link_index",
    "oracle_resolve",
    "oracle_components",
    "oracle_edges",
    "oracle_triples",
    "precision_recall",
]
