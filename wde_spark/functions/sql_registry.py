"""The F1-F19 scalar library as named Spark SQL functions (SURVEY.md §4:
"registering the normalization functions as SQL functions so the inventory
is exercisable from spark.sql").

Spark 4 SQL scalar functions (CREATE FUNCTION ... RETURN <expr>) are pure
SQL expression macros: they inline into the calling plan, stay inside
whole-stage codegen, and cost nothing over the Column forms in
`strings.py` — they are the same expressions, reachable from the SQL
surface. `tests/test_sql_functions.py` proves each one equal to its Column
twin on adversarial inputs.

Escaping note: Spark SQL string literals process backslash escapes, so a
regex backslash is written `\\\\`-in-Python → `\\`-in-SQL → `\` in the
regex. Single quotes inside character classes are doubled for SQL.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .strings import SPARK_SQL_EXPRS

# name -> (arg signature, return type, SQL body)
SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # F1
    "wde_striptag": ("s STRING", "STRING", SPARK_SQL_EXPRS["striptag"].format("s")),
    # F2
    "wde_clean_entity": (
        "s STRING", "STRING",
        r"regexp_replace(regexp_replace(s, 'http://www\\.wikidata\\.org/entity/', ''),"
        r" 'T\\d{2}:\\d{2}:\\d{2}Z$', '')",
    ),
    # F4
    "wde_norm_ws": ("s STRING", "STRING", SPARK_SQL_EXPRS["norm_ws"].format("s")),
    # F3
    "wde_norm_compare": (
        "s STRING", "STRING", SPARK_SQL_EXPRS["norm_compare"].format("s")),
    # A3
    "wde_dedup_tokens": (
        "s STRING", "STRING",
        "array_join(array_distinct(split(s, ' ')), ' ')",
    ),
    # F5 (lowercase → order-preserving token dedup → strip punct → collapse)
    "wde_clean_query": (
        "s STRING", "STRING",
        r"trim(regexp_replace(regexp_replace("
        r"array_join(array_distinct(split(lower(s), ' ')), ' '), "
        r"'[!\\.?;/\\\\:&\\(\\)\\[\\]#\",''_]', ''), '\\s+', ' '))",
    ),
    # F10
    "wde_paren_extract": (
        "s STRING", "STRING", r"regexp_extract(s, '\\((.+?)\\)', 1)"),
    # F14
    "wde_birth_year": (
        "s STRING", "STRING",
        r"regexp_extract(s, '(?:N\\.|[Nn][ée]e?\\.?)\\s*.{0,10}?(\\d{4})', 1)",
    ),
    "wde_death_year": (
        "s STRING", "STRING",
        r"regexp_extract(s, '(?:M\\.|[Mm]orte?\\.?)\\s*.{0,10}?(\\d{4})', 1)",
    ),
    "wde_violent_death_year": (
        "s STRING", "STRING",
        r"regexp_extract(s, '(?:Décap|Assa|Tuée?|Fusi|Guil)\\S*\\s*.{0,10}?(\\d{4})', 1)",
    ),
    # F16
    "wde_roman_numeral": (
        "s STRING", "STRING",
        r"regexp_extract(s, '\\b([IVXLCDM]+(?:er|nd|ème|eme|e)?)\\b', 1)",
    ),
    # F17
    "wde_qid": ("s STRING", "STRING", SPARK_SQL_EXPRS["qid_extract"].format("s")),
    "wde_catalogue_id": (
        "s STRING", "STRING", r"regexp_extract(s, '(CAT_\\d+)', 1)"),
    # tokenizer (array-returning)
    "wde_tokens": (
        "s STRING", "ARRAY<STRING>", r"split(trim(lower(s)), '\\s+')"),
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
