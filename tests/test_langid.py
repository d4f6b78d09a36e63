"""Language-ID heuristic: golden sentences, tie/empty behavior, SQL twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from productbert_intermediate_spark.functions.langid import (
    STOPWORD_PROFILES,
    UNDETERMINED,
    lang_id,
    lang_id_sql,
)

GOLDEN = [
    ("the cat sat on the mat and it was happy", "en"),
    ("this is not what you have from the start", "en"),
    ("der hund ist nicht mit der katze auf dem sofa", "de"),
    ("wir haben das auto für die reise aus berlin", "de"),
    ("le chat est dans la maison avec les enfants", "fr"),
    ("je ne vous ai pas vu dans le jardin", "fr"),
    ("el perro no es como los gatos que ya conoces", "es"),
    ("una casa muy grande para su familia sin problemas", "es"),
    ("questo è un libro che non hanno più nel negozio", "it"),
    ("het is een huis dat niet voor hem zou zijn", "nl"),
    ("lorem ipsum dolor sit amet consectetur", UNDETERMINED),
    ("", UNDETERMINED),
]


def test_lang_id_golden_sentences(spark):
    df = spark.createDataFrame([(s,) for s, _ in GOLDEN], "text string")
    got = (
        df.select(lang_id(F.split(F.lower("text"), " ")).alias("lang"))
        .toPandas()["lang"]
        .tolist()
    )
    assert got == [lang for _, lang in GOLDEN]


def test_lang_id_sql_twin_matches_spark(spark):
    """Same classifier rendered to DuckDB SQL gives identical labels."""
    case_expr, mx = lang_id_sql("toks")
    con = duckdb.connect()
    rows = [(s,) for s, _ in GOLDEN]
    con.execute("create table docs(text varchar)")
    con.executemany("insert into docs values (?)", rows)
    sql = f"""
      with t as (select string_split(lower(text), ' ') as toks from docs),
      s as (select {mx} as _mx, toks from t)
      select {case_expr} from s
    """
    got = [r[0] for r in con.execute(sql).fetchall()]
    assert got == [lang for _, lang in GOLDEN]


def test_lang_id_tie_break_is_profile_order(spark):
    # 'de' is a stopword of de(no), fr(no)... it IS in fr profile? no: fr has
    # 'des' not 'de'. Pick a genuinely shared word: 'una' is in both es and
    # it profiles -> tie resolves to es (earlier in STOPWORD_PROFILES).
    assert "una" in STOPWORD_PROFILES["es"] and "una" in STOPWORD_PROFILES["it"]
    df = spark.createDataFrame([("una",)], "text string")
    got = df.select(
        lang_id(F.split(F.lower("text"), " ")).alias("lang")
    ).collect()[0][0]
    assert got == "es"


@pytest.mark.parametrize("lang,words", list(STOPWORD_PROFILES.items()))
def test_each_profile_classifies_itself(spark, lang, words):
    """A document made of a language's own stopwords must classify as it
    (profiles overlap — e.g. 'de' the word — but never dominate another)."""
    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(
        lang_id(F.split(F.lower("text"), " ")).alias("lang")
    ).collect()[0][0]
    assert got == lang
