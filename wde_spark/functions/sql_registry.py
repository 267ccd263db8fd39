r"""The F1-F19 scalar library as named Spark SQL functions (SURVEY.md §4:
"registering the normalization functions as SQL functions so the inventory
is exercisable from spark.sql").

Spark 4 SQL scalar functions (CREATE FUNCTION ... RETURN <expr>) are pure
SQL expression macros: they inline into the calling plan, stay inside
whole-stage codegen, and cost nothing over the Column forms in
`strings.py`. Every SQL body comes from `strings.SPARK_SQL_EXPRS` — the
single place each expression is stated next to its Column twin — so the
two surfaces cannot drift independently. `tests/test_sql_functions.py`
proves each SQL function equal to its Column twin on adversarial inputs.

Escaping note: Spark SQL string literals process backslash escapes, so a
regex backslash is written `\\`-in-SQL-source → `\` in the regex; single
quotes inside character classes are doubled for SQL.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .strings import SPARK_SQL_EXPRS

# SQL function name -> (SPARK_SQL_EXPRS key, return type)
_REGISTRY = {
    "wde_striptag": ("striptag", "STRING"),                       # F1
    "wde_clean_entity": ("clean_entity", "STRING"),               # F2
    "wde_norm_ws": ("norm_ws", "STRING"),                         # F4
    "wde_norm_compare": ("norm_compare", "STRING"),               # F3
    "wde_dedup_tokens": ("dedup_tokens", "STRING"),               # A3
    "wde_clean_query": ("clean_query_string", "STRING"),          # F5
    "wde_paren_extract": ("paren_extract", "STRING"),             # F10
    "wde_birth_year": ("extract_birth_year", "STRING"),           # F14
    "wde_death_year": ("extract_death_year", "STRING"),           # F14
    "wde_violent_death_year": ("extract_violent_death_year", "STRING"),
    "wde_roman_numeral": ("roman_numeral", "STRING"),             # F16
    "wde_qid": ("qid_extract", "STRING"),                         # F17
    "wde_catalogue_id": ("catalogue_id_extract", "STRING"),       # F17
    "wde_tokens": ("tokens", "ARRAY<STRING>"),
}

SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    name: ("s STRING", ret, SPARK_SQL_EXPRS[key].format("s"))
    for name, (key, ret) in _REGISTRY.items()
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Create every library function as a TEMPORARY SQL function in the
    session; returns the registered names."""
    for name, (args, ret, body) in SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
            f"RETURNS {ret} RETURN {body}"
        )
    return list(SQL_FUNCTIONS)
