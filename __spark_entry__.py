"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full four-stage KG pipeline (extract → link →
                 canonicalize → materialize) over the deterministic
                 synthetic transcript corpus (BASELINE.json input_hint
                 shape), returning the materialized edge table.
queries()      — one entry per implemented operator from SURVEY.md §2
                 (+ training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — matching DuckDB SQL with identical column aliases;
                 omitted for non-SQL-expressible ops (KG pipeline stages),
                 which get the driver's rows-only check — their strong
                 correctness gate is tests/test_golden.py (pure-Python
                 oracle, P=R=1.0 required).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kg import entry_queries
from kg.schema import ALIAS_PAIRS_SCHEMA, CATALOG_SCHEMA, TRANSCRIPTS_SCHEMA

_FIXTURE_CACHE: dict[str, dict[str, str]] = {}


def _fixture_paths(n_convs: int = 150, n_entities: int = 300) -> dict[str, str]:
    """Seeded transcript fixtures, cached on disk per size."""
    key = f"{n_convs}-{n_entities}"
    if key not in _FIXTURE_CACHE:
        from kg.synth import write_fixtures

        out = os.path.join(
            tempfile.gettempdir(), f"kg_fixtures_{key}"
        )
        # completeness sentinel written AFTER all three files: a crash
        # mid-generation can't leave a half-written cache that later runs
        # would trust (transcripts.parquet is written first, so it alone
        # is not a safe marker).
        marker = os.path.join(out, "_FIXTURES_OK")
        if not os.path.exists(marker):
            write_fixtures(out, n_convs=n_convs, n_entities=n_entities)
            with open(marker, "w") as fh:
                fh.write("ok\n")
        _FIXTURE_CACHE[key] = {
            "transcripts": os.path.join(out, "transcripts.parquet"),
            "entity_catalog": os.path.join(out, "entity_catalog.parquet"),
            "alias_pairs": os.path.join(out, "alias_pairs.parquet"),
        }
    return _FIXTURE_CACHE[key]


def _load_fixtures(spark: SparkSession, n_convs: int = 150):
    p = _fixture_paths(n_convs)
    tr = spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(p["transcripts"])
    cat = spark.read.schema(CATALOG_SCHEMA).parquet(p["entity_catalog"])
    ap = spark.read.schema(ALIAS_PAIRS_SCHEMA).parquet(p["alias_pairs"])
    return tr, cat, ap


_PIPELINE_CACHE: dict[tuple[int, int], dict] = {}


def _pipeline_result(spark: SparkSession, n_convs: int = 150) -> dict:
    """One pipeline run shared by every kg_* contract entry: kg_edges and
    kg_nodes would otherwise each re-run extract/link/CC and re-persist
    the same intermediates ('Asked to cache already cached data')."""
    key = (id(spark), n_convs)
    if key not in _PIPELINE_CACHE:
        from kg.pipeline import run_pipeline

        tr, cat, ap = _load_fixtures(spark, n_convs)
        _PIPELINE_CACHE[key] = run_pipeline(spark, tr, cat, ap)
    return _PIPELINE_CACHE[key]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: four-stage KG construction; returns kg.edges."""
    return _pipeline_result(spark)["edges"]


# --- KG pipeline stages as rows-only queries (non-SQL-expressible:
# conversation-window pandas-UDF extraction + iterative CC fixpoint) ------
def _kg_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kg.extract import extract_triples

    tr, _, _ = _load_fixtures(spark)
    return extract_triples(tr)


def _kg_linked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kg.extract import extract_triples
    from kg.link import link_triples

    tr, cat, _ = _load_fixtures(spark)
    return link_triples(extract_triples(tr), cat)


def _kg_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kg.canonicalize import connected_components

    _, _, ap = _load_fixtures(spark)
    return connected_components(ap)


def _kg_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return entry(spark)


def _kg_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node table projected to hashable/sortable columns: the driver's
    canonicalizer sorts values in pandas, and raw array<string> labels /
    map properties are unhashable there.  node_id (xxhash64) and the
    constant provenance columns are projected out so the row is fully
    oracle-checkable in DuckDB."""
    from pyspark.sql import functions as F

    nodes = _pipeline_result(spark)["nodes"]
    return nodes.select(
        "canonical_id",
        F.array_join("labels", "|").alias("labels"),
        "display_name",
        "schema_class",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = dict(entry_queries.queries())
    qs.update(
        {
            "kg_extract_triples": _kg_extract,
            "kg_linked_triples": _kg_linked,
            "kg_connected_components": _kg_components,
            "kg_edges": _kg_edges,
            "kg_nodes": _kg_nodes,
        }
    )
    return qs


def oracle_sql() -> dict[str, str]:
    return dict(entry_queries.oracle_sql())
