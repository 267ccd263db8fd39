from __future__ import annotations

from pyspark.sql import functions as F

from wde_spark.functions import strings as S


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


def test_striptag(spark):
    assert one(spark, S.striptag(F.lit("<b>hi</b> <i>x</i>"))) == "hi x"


def test_clean_entity(spark):
    v = one(spark, S.clean_entity(F.lit("http://www.wikidata.org/entity/Q42")))
    assert v == "Q42"
    v = one(spark, S.clean_entity(F.lit("1806-08-03T00:00:00Z")))
    assert v == "1806-08-03"


def test_norm_compare_reference_semantics(spark):
    # script/utils/classes.py:90-113 — punctuation/case/whitespace-insensitive
    a = one(spark, S.norm_compare(F.lit("  BALZAC,  (H. de)! ")))
    b = one(spark, S.norm_compare(F.lit("balzac h de")))
    assert a == b == "balzac h de"


def test_clean_query_string(spark):
    # lowercase, order-preserving dedup, punctuation strip, collapse
    v = one(spark, S.clean_query_string(F.lit("Adam Adam composer, (test)")))
    assert v == "adam composer test"


def test_qid_and_years(spark):
    assert one(spark, S.qid_extract(F.lit("see wd:Q737359 ref"))) == "Q737359"
    assert one(spark, S.extract_birth_year(F.lit("botaniste. N. 1727. M. 1806"))) == "1727"
    assert one(spark, S.extract_death_year(F.lit("botaniste. N. 1727. M. 1806"))) == "1806"


def test_paren_extract(spark):
    assert one(spark, S.paren_extract(F.lit("ADANSON (Michel) x"))) == "Michel"


def test_dedup_tokens_order_preserving(spark):
    assert one(spark, S.dedup_tokens(F.lit("b a b c a"))) == "b a c"
