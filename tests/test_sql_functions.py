"""Every registered SQL function equals its Column twin from strings.py —
on adversarial literals (quotes, accents, regex metacharacters, URIs,
timestamps) and on real document text."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from wde_spark.core.catalog import load_table
from wde_spark.functions import strings as S
from wde_spark.functions.sql_registry import register_sql_functions

ADVERSARIAL = [
    "<b>bold</b> and <i attr='x'>italic</i>",
    "http://www.wikidata.org/entity/Q123 born 1820-01-02T10:11:12Z",
    "  Dupont   (Jean-Baptiste) , N. 1727 M. 1806  ",
    "Louis XVIème, dit «le Grand» — Décapité 1793",
    "quote ' double \" backslash \\ braces {x} [y] (z)",
    "a a b b a c",
    "",
    "né 1854 morte 1902 Fusillé 1871 CAT_000123 Q42",
]

PAIRS = [
    ("wde_striptag", S.striptag),
    ("wde_clean_entity", S.clean_entity),
    ("wde_norm_ws", S.norm_ws),
    ("wde_norm_compare", S.norm_compare),
    ("wde_dedup_tokens", S.dedup_tokens),
    ("wde_clean_query", S.clean_query_string),
    ("wde_paren_extract", S.paren_extract),
    ("wde_birth_year", S.extract_birth_year),
    ("wde_death_year", S.extract_death_year),
    ("wde_violent_death_year", S.extract_violent_death_year),
    ("wde_roman_numeral", S.roman_numeral),
    ("wde_qid", S.qid_extract),
    ("wde_catalogue_id", S.catalogue_id_extract),
]


def test_sql_functions_equal_column_forms(spark):
    register_sql_functions(spark)
    docs = [r.text[:200] for r in
            load_table(spark, SF_SMOKE, "documents").limit(40).collect()]
    df = spark.createDataFrame([(s,) for s in ADVERSARIAL + docs], "s string")
    df.createOrReplaceTempView("sqlfn_inputs")

    sql_cols = ", ".join(f"{name}(s) AS {name}" for name, _ in PAIRS)
    via_sql = spark.sql(f"SELECT s, {sql_cols} FROM sqlfn_inputs").collect()
    via_col = df.select(
        "s", *[fn(F.col("s")).alias(name) for name, fn in PAIRS]
    ).collect()

    for rs, rc in zip(
        sorted(via_sql, key=lambda r: r.s), sorted(via_col, key=lambda r: r.s)
    ):
        for name, _ in PAIRS:
            assert rs[name] == rc[name], (name, rs.s, rs[name], rc[name])


def test_sql_tokens_function(spark):
    register_sql_functions(spark)
    row = spark.sql("SELECT wde_tokens('  Foo   BAR baz ') AS t").first()
    assert row.t == ["foo", "bar", "baz"]
