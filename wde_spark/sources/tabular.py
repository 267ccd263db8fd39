"""Tabular sources/sinks — SURVEY.md §2.1 S3/S4/S6.

Reference parity:
  S3 TSV source   script/itemtoid.py:320-342; script/utils/idset.py:19-22
  S4 TSV sink     script/itemtoid.py:320-333
  S6 ID-list      script/sparql.py:388-389; script/utils/classes.py:48-55
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NAMETABLE_IN_SCHEMA = T.StructType([
    T.StructField("xml_id", T.StringType()),
    T.StructField("wd_id", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("trait", T.StringType()),
])

NAMETABLE_OUT_COLS = ["tei_xml_id", "wd_id", "tei_name", "wd_name",
                      "wd_snippet", "tei_trait", "wd_certitude"]


def read_tsv(spark: SparkSession, path: str,
             schema: T.StructType | None = None) -> DataFrame:
    """S3 — header'd, quoted, tab-separated scan (the reference's
    `csv.reader(delimiter='\\t', quotechar='"')` + header skip)."""
    reader = (
        spark.read.option("sep", "\t").option("header", True)
        .option("quote", '"').option("multiLine", False)
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S4 — TSV sink with header. The reference appends row-by-row with a
    header-iff-empty dance; a deterministic batch overwrite (or append of a
    new partition directory) replaces that bookkeeping."""
    df.write.mode(mode).option("sep", "\t").option("header", True).csv(path)


def read_id_list(spark: SparkSession, path: str,
                 col_name: str = "id") -> DataFrame:
    """S6 — whitespace-separated ID file → single-column table."""
    return (
        spark.read.text(path)
        .select(F.explode(F.split(F.col("value"), r"\s+")).alias(col_name))
        .filter(F.col(col_name) != "")
    )


def write_id_list(df: DataFrame, col_name: str, path: str) -> None:
    """S6 sink — one ID per line."""
    df.select(F.col(col_name).cast("string").alias("value")) \
        .write.mode("overwrite").text(path)
