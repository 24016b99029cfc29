"""Deterministic synthetic fixtures (FIXTURES.md §1-3, SURVEY.md §7 step 1).

Everything is seeded (numpy RandomState) and wall-clock-free, so the same
(seed, size) always produces byte-identical parquet — required for the
P/R-vs-oracle contract and the resumability tests.

Design points driven by the north_rule:
- entity mention frequency is Zipfian, so the Stage-2 skew/salting path is
  genuinely exercised (SURVEY.md §7 "Skew measurement honesty");
- mentions are embedded as ``[[Surface Form]]`` spans with known ground
  truth, at controlled ambiguity (some aliases shared by two entities);
- a controlled fraction of mentions use surfaces absent from the catalog,
  exercising the Stage-2 miss branch (InteractionImporter.java:115-137
  semantics: unknown interactor ⇒ create a new entity);
- alias_pairs include the CC unit fixtures: chain, star, two disjoint
  components, a symmetric duplicate pair, and a self-loop (FIXTURES.md §3).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SEED = 42

_ADJ = [
    "quantum", "rapid", "stable", "hidden", "formal", "linear", "sparse",
    "dense", "atomic", "lazy", "eager", "mutable", "sealed", "vivid",
    "plain", "solid", "prime", "outer", "inner", "local",
]
_NOUN = [
    "kernel", "lattice", "cache", "tensor", "router", "ledger", "parser",
    "beacon", "cursor", "vector", "socket", "bundle", "matrix", "schema",
    "buffer", "branch", "cipher", "module", "mirror", "portal",
]
_TOOLS = ["search", "calculator", "browser", "compiler", "profiler"]
_TYPES = ["person", "tool", "concept", "org"]

_TEMPLATES_2 = [
    "We compared {} against {} in the last run.",
    "Note that {} depends directly on {} here.",
    "The report links {} with {} for this release.",
    "Results for {} exceeded those of {} by a wide margin.",
]
_TEMPLATES_1 = [
    "Let's review {} before the deadline.",
    "The metrics for {} look stable.",
    "I re-ran the job for {} overnight.",
    "Please summarize the findings on {}.",
]


def norm_surface(s: str) -> str:
    """Blocking-key normalization: lower, trim, collapse whitespace.

    Analog of the reference's accession normalization
    (InteractionImporter.java:106,198-199: ``acc.trim().split(" ")[0]`` etc.)
    — ours keeps all tokens but canonicalizes spacing/case.
    """
    return " ".join(s.lower().split())


def synth_catalog(n_entities: int = 400, seed: int = SEED) -> pd.DataFrame:
    """Entity candidate catalog (FIXTURES.md §2), Zipfian freq_hint."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_entities):
        name = f"{_ADJ[i % len(_ADJ)]} {_NOUN[(i // len(_ADJ)) % len(_NOUN)]} {i}"
        canonical = name.title()
        aliases = [canonical]
        if rng.rand() < 0.6:
            aliases.append(canonical.upper())
        if rng.rand() < 0.4:
            aliases.append(canonical.split()[0] + f" #{i}")
        entity_type = _TYPES[i % len(_TYPES)]
        prefix = None if rng.rand() < 0.3 else f"pfx{i % 7}"
        # Zipf over rank: hot heads drive the skew path.
        freq = 1.0 / ((i + 1) ** 1.1)
        rows.append(
            {
                "entity_id": f"cat:Q{i:05d}",
                "canonical_name": canonical,
                "aliases": aliases,
                "blocking_key": norm_surface(canonical),
                "prefix": prefix,
                "entity_type": entity_type,
                "freq_hint": freq,
            }
        )
    # controlled ambiguity: every 37th entity also claims the previous
    # entity's canonical surface as an alias (two candidates per key; the
    # deterministic resolution rule picks min(entity_id)).
    for i in range(1, n_entities, 37):
        rows[i]["aliases"] = rows[i]["aliases"] + [rows[i - 1]["canonical_name"]]
    return pd.DataFrame(rows)


def synth_alias_pairs(n_entities: int = 400, seed: int = SEED) -> pd.DataFrame:
    """sameAs seed edges for CC (FIXTURES.md §3) with the unit fixtures."""
    rng = np.random.RandomState(seed + 1)
    eid = lambda i: f"cat:Q{i:05d}"  # noqa: E731
    pairs: list[tuple[str, str, str]] = []
    # chain: 0-1-2-3
    pairs += [(eid(0), eid(1), "sameAs"), (eid(1), eid(2), "sameAs"), (eid(2), eid(3), "sameAs")]
    # star: 10 <- 11,12,13
    pairs += [(eid(11), eid(10), "sameAs"), (eid(12), eid(10), "sameAs"), (eid(13), eid(10), "sameAs")]
    # two disjoint components: {20,21} and {30,31}
    pairs += [(eid(20), eid(21), "sameAs"), (eid(30), eid(31), "sameAs")]
    # symmetric duplicate pair (A->B and B->A)
    pairs += [(eid(40), eid(41), "sameAs"), (eid(41), eid(40), "sameAs")]
    # self-loop
    pairs += [(eid(50), eid(50), "sameAs")]
    # a sprinkle of random variantOf merges among the tail
    for _ in range(max(4, n_entities // 50)):
        a, b = rng.randint(60, n_entities, size=2)
        if a != b:
            pairs.append((eid(int(a)), eid(int(b)), "variantOf"))
    return pd.DataFrame(pairs, columns=["src", "dst", "kind"])


def _alias_pool(catalog: pd.DataFrame) -> tuple[list[str], np.ndarray]:
    """Flatten (alias, weight) with Zipfian weights from freq_hint."""
    surfaces: list[str] = []
    weights: list[float] = []
    for _, row in catalog.iterrows():
        for a in row["aliases"]:
            surfaces.append(a)
            weights.append(row["freq_hint"])
    w = np.asarray(weights)
    return surfaces, w / w.sum()


def synth_transcripts(
    catalog: pd.DataFrame,
    n_convs: int = 200,
    seed: int = SEED,
    unknown_rate: float = 0.08,
) -> pd.DataFrame:
    """Multi-turn transcripts embedding ``[[mention]]`` ground truth."""
    rng = np.random.RandomState(seed + 2)
    surfaces, probs = _alias_pool(catalog)
    n_pool = len(surfaces)
    base_ts = pd.Timestamp("2025-03-01 00:00:00")

    rows = []
    for c in range(n_convs):
        conv_id = f"conv-{c:06d}"
        n_turns = int(rng.randint(4, 12))
        for t in range(n_turns):
            role = ("user", "assistant", "tool")[t % 3]
            tool = _TOOLS[int(rng.randint(len(_TOOLS)))] if role == "tool" else None
            n_m = int(rng.randint(1, 3))
            picks = []
            for _ in range(n_m):
                if rng.rand() < unknown_rate:
                    picks.append(f"novel thing {int(rng.randint(5000))}")
                else:
                    picks.append(surfaces[int(rng.choice(n_pool, p=probs))])
            marked = [f"[[{p}]]" for p in picks]
            if len(marked) == 2:
                text = _TEMPLATES_2[int(rng.randint(len(_TEMPLATES_2)))].format(*marked)
            else:
                text = _TEMPLATES_1[int(rng.randint(len(_TEMPLATES_1)))].format(marked[0])
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": base_ts + pd.Timedelta(minutes=c, seconds=t),
                }
            )
    pdf = pd.DataFrame(rows)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def write_transcripts_chunked(
    out_path: str,
    catalog: pd.DataFrame,
    n_convs: int,
    seed: int = SEED,
    unknown_rate: float = 0.08,
    chunk_convs: int = 250_000,
) -> None:
    """Stream-generate a large transcript corpus into ONE parquet file via
    row-group appends — peak memory is one chunk, not the corpus.  Chunk
    seeds derive deterministically from (seed, chunk index), and conv_ids
    are globally unique via an offset, so output is reproducible."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    writer = None
    try:
        for ci, start in enumerate(range(0, n_convs, chunk_convs)):
            n = min(chunk_convs, n_convs - start)
            pdf = synth_transcripts(catalog, n, seed=seed + 1000 * ci, unknown_rate=unknown_rate)
            pdf["conv_id"] = pdf["conv_id"].map(
                lambda c, off=start: f"conv-{int(c[5:]) + off:08d}"
            )
            table = pa.Table.from_pandas(pdf, preserve_index=False)
            table = table.set_column(
                table.schema.get_field_index("ts"),
                "ts",
                table.column("ts").cast(pa.timestamp("us")),
            )
            if writer is None:
                writer = pq.ParquetWriter(out_path, table.schema)
            writer.write_table(table)
    finally:
        if writer is not None:
            writer.close()


def write_fixtures(
    out_dir: str,
    n_convs: int = 200,
    n_entities: int = 400,
    seed: int = SEED,
    unknown_rate: float = 0.08,
) -> dict[str, str]:
    """Write transcripts/entity_catalog/alias_pairs parquet; return paths."""
    os.makedirs(out_dir, exist_ok=True)
    catalog = synth_catalog(n_entities, seed)
    alias_pairs = synth_alias_pairs(n_entities, seed)
    transcripts = synth_transcripts(catalog, n_convs, seed, unknown_rate)
    paths = {
        "transcripts": os.path.join(out_dir, "transcripts.parquet"),
        "entity_catalog": os.path.join(out_dir, "entity_catalog.parquet"),
        "alias_pairs": os.path.join(out_dir, "alias_pairs.parquet"),
    }
    # microsecond timestamps: Spark rejects parquet TIMESTAMP(NANOS)
    transcripts.to_parquet(
        paths["transcripts"], index=False,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    catalog.to_parquet(paths["entity_catalog"], index=False)
    alias_pairs.to_parquet(paths["alias_pairs"], index=False)
    return paths
