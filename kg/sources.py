"""Input connectors (SURVEY.md §2.1 S1/S6/S7/S8 analogs).

The reference reads from MySQL (GKInstance rows), tab-separated resource
files (trivialMolecules.txt, ReactomeBatchImporter.java:118-131), and a
SQLite interactions DB downloaded from a remote file
(InteractionImporter.java:284-302).  Our equivalents are declarative
Spark sources behind one interface, all schema-pinned (never
inferSchema in production paths):

- transcripts: parquet (default), CSV, or JSONL directories
- catalog: parquet or the reference-style TSV resource file
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg.schema import CATALOG_SCHEMA, TRANSCRIPTS_SCHEMA


def read_transcripts(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Schema-pinned transcript source. fmt: parquet | csv | json."""
    if fmt == "parquet":
        return spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path)
    if fmt == "csv":
        return (
            spark.read.schema(TRANSCRIPTS_SCHEMA)
            .options(header=True, escape='"', multiLine=True)
            .csv(path)
        )
    if fmt == "json":
        return spark.read.schema(TRANSCRIPTS_SCHEMA).json(path)
    raise ValueError(f"unsupported transcript format: {fmt}")


def read_catalog(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Candidate catalog source. fmt: parquet | tsv.

    The TSV shape mirrors the reference's resource files (S6: split on
    newline then tab, ReactomeBatchImporter.java:118-131): columns
    entity_id, canonical_name, aliases ('|'-separated), prefix,
    entity_type, freq_hint.
    """
    if fmt == "parquet":
        return spark.read.schema(CATALOG_SCHEMA).parquet(path)
    if fmt == "tsv":
        raw = spark.read.options(sep="\t", header=True).schema(
            "entity_id string, canonical_name string, aliases string, "
            "prefix string, entity_type string, freq_hint double"
        ).csv(path)
        from kg.link import norm_key

        return raw.select(
            "entity_id",
            "canonical_name",
            F.split("aliases", r"\|").alias("aliases"),
            norm_key(F.col("canonical_name")).alias("blocking_key"),
            "prefix",
            "entity_type",
            F.coalesce("freq_hint", F.lit(1.0)).alias("freq_hint"),
        )
    raise ValueError(f"unsupported catalog format: {fmt}")


def read_catalog_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """S7 analog of the reference's SQLite interactions DB probe
    (InteractionImporter.java:284-302) as a DECLARATIVE parallel read —
    the reference loops per-accession SQL queries; Spark's JDBC source
    issues one partitioned scan instead.

    partition_column/lower_bound/upper_bound/num_partitions split the
    table into range predicates executed in parallel — without them the
    whole table arrives through ONE connection on one executor, which is
    the classic JDBC-at-scale mistake.  Column projection and filter
    pushdown reach the remote engine via the JDBC dialect.

    The resulting frame is raw (remote schema); project it to
    CATALOG_SCHEMA columns at the call site.  Sandbox note: no JDBC
    driver jars ship in this environment, so this path is exercised only
    against a real database deployment — the parquet/TSV sources above
    are the tested stand-ins (SURVEY.md §2.1 mapping).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


__all__ = ["read_transcripts", "read_catalog", "read_catalog_jdbc"]
