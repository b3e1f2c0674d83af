"""Widened language-ID (VERDICT r02 item #8): 10 Latin-script stopword
languages + 8 Unicode-script-gated languages, with the DuckDB oracle SQL
kept in lockstep — parity is asserted over a multilingual fixture that
exercises every label plus und/empty/mixed edge cases."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bloom_filters_spark.functions.text import (
    SCRIPT_GATES,
    STOPWORDS,
    lang_id_expr,
)

FIXTURE = [
    ("en", "The cat and the dog ran to the house in the morning"),
    ("de", "der Hund und die Katze ist mit den Kindern nicht zu Hause"),
    ("fr", "le chat et la maison est pour un une les amis que"),
    ("es", "el perro y la casa que es en un una los dias"),
    ("it", "il cane che di e per con sono del non si bene"),
    ("pt", "o gato os do da em para com uma não mais casa"),
    ("nl", "het huis een van ik dat niet zijn op te maar goed"),
    ("sv", "och att det som en på är av för med har hus"),
    ("pl", "i w nie się na jest że do tak jak dom"),
    ("tr", "bir ve bu için ile daha ne gibi çok ama ev"),
    ("ru", "это пример русского текста для проверки определения языка"),
    ("ar", "هذا مثال على نص عربي لاختبار تحديد اللغة"),
    ("zh", "这是一个用于测试语言识别的中文文本示例"),
    # Japanese mixes Han + kana; the 5% kana gate must fire before zh
    ("ja", "これは言語判定のための日本語の文章の例です"),
    ("ko", "이것은 언어 식별을 테스트하기 위한 한국어 텍스트입니다"),
    ("hi", "यह भाषा पहचान के लिए हिंदी पाठ का उदाहरण है"),
    ("el", "αυτό είναι ένα παράδειγμα ελληνικού κειμένου για αναγνώριση"),
    ("he", "זוהי דוגמה לטקסט בעברית לבדיקת זיהוי שפה"),
    ("und", "zzz qqq xxx www yyy"),
    ("und", ""),
    ("und", "12345 67890 !!!"),
    # < 30% Cyrillic in an otherwise unknown-Latin doc: gate must NOT fire
    ("und", "zzz qqq xxx www yyy kkk mmm nnn ppp rrr да"),
]


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(FIXTURE)],
        "doc_id long, text string",
    )


def test_lang_id_labels(spark, fixture_df):
    got = {
        r["doc_id"]: r["lang"]
        for r in fixture_df.select(
            "doc_id", lang_id_expr(F.col("text")).alias("lang")
        ).collect()
    }
    for i, (want, text) in enumerate(FIXTURE):
        assert got[i] == want, (want, got[i], text[:40])


def test_lang_id_duckdb_oracle_parity(spark, fixture_df):
    """The exact SQL string the driver runs must agree with the Spark
    expression row-for-row on the multilingual fixture."""
    import __spark_entry__ as entrymod

    spark_rows = {
        r["doc_id"]: r["lang_pred"]
        for r in fixture_df.select(
            "doc_id", lang_id_expr(F.col("text")).alias("lang_pred")
        ).collect()
    }
    pdf = fixture_df.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = entrymod.oracle_sql()["lang_id"]
    oracle_rows = dict(con.execute(sql).fetchall())
    assert oracle_rows == spark_rows


def test_label_set_complete():
    want = set(STOPWORDS) | {lang for lang, *_ in SCRIPT_GATES}
    assert len(want) == 18
    covered = {lang for lang, _ in FIXTURE} - {"und"}
    assert covered == want
