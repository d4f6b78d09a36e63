"""Extraction stage: per-url byte-identity of extracted+cleaned offer text."""

from pyspark.sql import functions as F

from productbert_intermediate_spark.operators.extract import extract_offers
from tests.oracle_cleaning import oracle_clean_spec, oracle_clean_string


def test_extract_byte_identity_per_url(spark, fixtures_dir):
    pages = spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    truth = spark.read.parquet(f"{fixtures_dir}/offers_truth.parquet").toPandas()
    offers = extract_offers(pages).toPandas().set_index("id").sort_index()

    # only English pages survive
    assert len(offers) < len(truth)
    assert len(offers) > 0.85 * len(truth)

    truth = truth.set_index("id")
    for oid, row in offers.iterrows():
        raw = truth.loc[oid]
        # oracle = independent implementation of the reference cleaners
        assert row["title"] == oracle_clean_string(raw["raw_title"]), oid
        assert row["description"] == oracle_clean_string(raw["raw_description"]), oid
        assert row["brand"] == oracle_clean_string(raw["raw_brand"]), oid
        assert row["price"] == oracle_clean_string(raw["raw_price"]), oid
        assert row["specTableContent"] == oracle_clean_spec(
            raw["raw_specTableContent"]
        ), oid
        assert row["category"] == raw["category"], oid


def test_extract_matches_planted_truth(spark, fixtures_dir):
    """Generator's cleaned truth columns == pipeline-extracted values (joined on id)."""
    pages = spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    truth = spark.read.parquet(f"{fixtures_dir}/offers_truth.parquet")
    offers = extract_offers(pages)
    joined = offers.alias("o").join(truth.alias("t"), "id")
    mismatches = joined.where(
        ~(
            F.col("o.title").eqNullSafe(F.col("t.title"))
            & F.col("o.description").eqNullSafe(F.col("t.description"))
            & F.col("o.brand").eqNullSafe(F.col("t.brand"))
            & F.col("o.price").eqNullSafe(F.col("t.price"))
            & F.col("o.specTableContent").eqNullSafe(F.col("t.specTableContent"))
        )
    ).count()
    assert mismatches == 0


def test_extract_plan_is_map_only_and_pruned(spark, fixtures_dir):
    """Plan hygiene: no shuffle; html column never read; lang filter pushed."""
    import contextlib
    import io

    pages = spark.read.parquet(f"{fixtures_dir}/pages.parquet")
    df = extract_offers(pages)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    read_schema = plan.split("ReadSchema")[-1].splitlines()[0]
    assert "html" not in read_schema, read_schema
    assert "PushedFilters" in plan and "lang" in plan.split("PushedFilters")[-1].splitlines()[0]


def test_non_numeric_sku_yields_null_id_not_crash(spark):
    """Spark 4 ANSI mode makes plain cast throw on 'N/A'; the contract is
    dirty sku → id NULL → filtered, never a stage-killing exception."""
    import datetime

    from productbert_intermediate_spark.operators.extract import extract_offers

    rows = [
        ("u1", datetime.datetime(2020, 1, 1), None,
         "<<sku>>N/A<</sku>><<title>>x<</title>>", "en"),
        ("u2", datetime.datetime(2020, 1, 1), None,
         "<<sku>>123<</sku>><<title>>y<</title>>", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    got = {r.url: r.id for r in extract_offers(pages).collect()}
    assert got["u1"] is None and got["u2"] == 123
