"""Table-format abstraction: Iceberg when a catalog is configured, parquet
otherwise (SURVEY.md §7: the sandbox has no Iceberg runtime jar; the
DataFrame code paths are identical, only the writer/reader differ).

To run against Iceberg, start spark-submit with e.g.
  --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
  --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
  --conf spark.sql.catalog.lake.type=hadoop
  --conf spark.sql.catalog.lake.warehouse=<path>
and pass table identifiers like ``lake.db.turns`` (no path separator).
Identifiers containing '/' are treated as parquet paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _is_path(ident: str) -> bool:
    return "/" in ident or ident.endswith(".parquet")


def read_table(spark: SparkSession, ident: str) -> DataFrame:
    if _is_path(ident):
        return spark.read.parquet(ident)
    return spark.read.table(ident)


def write_table(
    df: DataFrame,
    ident: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    if _is_path(ident):
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(ident)
    else:
        if mode not in ("overwrite", "append"):
            # fail loudly: silently appending under error/ignore semantics
            # corrupts the table the caller asked NOT to touch
            raise ValueError(
                f"write_table mode {mode!r} is not supported for catalog "
                f"tables (use 'overwrite' or 'append')"
            )
        w = df.writeTo(ident)
        if mode == "overwrite":
            if partition_by:
                # requested layout must reach the catalog table too (the
                # parquet branch honors it; dropping it silently created
                # unpartitioned tables — round-4 review finding).
                # partitionedBy applies to create/replace only; appends
                # inherit the existing table's layout.
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
        else:
            w.append()
